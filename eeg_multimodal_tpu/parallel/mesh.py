"""Device mesh construction for data/tensor-parallel execution.

The reference has no working parallelism (torch.distributed imported but never
called — SURVEY.md §2.3); this module is the TPU-native replacement: a
``jax.sharding.Mesh`` over the slice's chips with a ``data`` axis (batch
parallelism, replacing the commented-out DataParallel intent) and a ``model``
axis (Megatron-style tensor parallelism over BERT heads/FFN). Collectives are
inserted by XLA GSPMD from sharding annotations and ride the ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def factorize(n: int, max_model: int = 4) -> Tuple[int, int]:
    """Split n devices into (data, model) with the largest model degree that
    divides both n and BERT's 12 heads (and is <= max_model)."""
    for m in range(min(max_model, n), 0, -1):
        if n % m == 0 and 12 % m == 0:
            return n // m, m
    return n, 1


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: Optional[int] = None,
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None or model is None:
        data, model = factorize(n)
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))
