"""Sharding rules: how fusion-model params and batches lay out on the mesh.

Megatron-style tensor parallelism for the transformer blocks (BERT layers,
cross-attention decoder/encoder):
  - QKV / intermediate projections: column-parallel (output dim on 'model'),
  - attention-output / FFN-output projections: row-parallel (input dim on
    'model'),
  - embeddings, layer norms, fusion head, DP param: replicated.
Batches shard their leading dim on 'data'. XLA GSPMD inserts the matching
all-reduces over ICI; no hand-written collectives needed at this model size.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.trees import path_str
from .mesh import DATA_AXIS, MODEL_AXIS


def _bert_layer_rule(path: str):
    # paths like bert/layers/3/attn/query/kernel
    if path.endswith("/kernel"):
        if any(f"/{n}/" in path for n in ("query", "key", "value", "intermediate")):
            return P(None, MODEL_AXIS)  # column-parallel
        if "/attn/output/" in path or "/ffn/output/" in path:
            return P(MODEL_AXIS, None)  # row-parallel
    if path.endswith("/bias"):
        if any(f"/{n}/" in path for n in ("query", "key", "value", "intermediate")):
            return P(MODEL_AXIS)
    return P()


def _cross_layer_rule(path: str):
    # paths like cross/layers/0/self_attn/in_proj_kernel
    if path.endswith("in_proj_kernel"):
        # (E, 3E): the packed q|k|v output dim is NOT contiguous per head
        # group across the 3 sections, so shard the input dim (row-parallel
        # on the way in is wrong) — keep replicated for correctness; the
        # out_proj carries the row-parallel split instead.
        return P()
    if path.endswith("out_proj/kernel"):
        return P(MODEL_AXIS, None)
    if "linear1/kernel" in path:
        return P(None, MODEL_AXIS)
    if "linear1/bias" in path:
        return P(MODEL_AXIS)
    if "linear2/kernel" in path:
        return P(MODEL_AXIS, None)
    return P()


def param_pspec(path: str):
    if path.startswith("bert/layers/"):
        return _bert_layer_rule(path)
    if path.startswith("cross/layers/"):
        return _cross_layer_rule(path)
    if path.startswith("fc1/kernel"):
        return P(None, MODEL_AXIS)
    if path.startswith("fc1/bias"):
        return P(MODEL_AXIS)
    if path.startswith("fc2/kernel"):
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding tree matching ``params``' structure."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = [
        NamedSharding(mesh, param_pspec(path_str(p))) for p, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def batch_shardings(mesh: Mesh, batch: Any):
    """Shard every batch array's leading dim on the data axis."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P(DATA_AXIS)), batch
    )


def shard_params(mesh: Mesh, params: Any):
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(mesh: Mesh, batch: Any):
    return jax.device_put(batch, batch_shardings(mesh, batch))
