"""Mesh-aware training: shard an existing Trainer's state over a device mesh.

The reference never parallelizes (SURVEY §2.3); here multi-chip execution is
one call: ``shard_trainer(trainer, mesh)`` lays the params out with the
Megatron-style rules (parallel/sharding.py), re-inits optimizer states so
they inherit the shardings, and from then on ``Trainer.fit`` runs the same
jitted epoch under GSPMD — XLA inserts the ICI collectives. Batches shard on
the data axis via ``shard_data``.

Single-controller JAX: this works on a real multi-chip slice and, for tests,
on a virtual CPU mesh (``jax_num_cpu_devices``).
"""
from __future__ import annotations

from typing import Optional

import jax

from ..train.trainer import Trainer
from . import mesh as mesh_mod
from . import sharding as shard_mod


def shard_trainer(trainer: Trainer, mesh: Optional[jax.sharding.Mesh] = None):
    """Shard trainer state in place; returns the mesh used."""
    if mesh is None:
        mesh = mesh_mod.make_mesh()
    trainer.params = shard_mod.shard_params(mesh, trainer.params)
    # re-init optimizer states from the sharded params so the Adam moments
    # inherit the same layout (zeros_like preserves shardings)
    trainer.dp_os, trainer.model_os = trainer.steps.init_opt_states(trainer.params)
    trainer.mesh = mesh
    return mesh


def shard_dpsgd_trainer(trainer, mesh: Optional[jax.sharding.Mesh] = None):
    """Shard a DPSGDTrainer's params over the mesh (in place); returns the
    mesh. The per-example ``vmap(grad)`` inside the DP-SGD step then runs
    under GSPMD: the vmapped batch axis shards on 'data', the Megatron
    param splits on 'model', and the per-example clip norms reduce over the
    model axis via XLA-inserted all-reduces. Optimizer state is created
    inside ``fit`` from the sharded trainable subtree (zeros_like preserves
    shardings), so no re-init is needed here."""
    if mesh is None:
        mesh = mesh_mod.make_mesh()
    trainer.params = shard_mod.shard_params(mesh, trainer.params)
    trainer.mesh = mesh
    return mesh


def shard_data(mesh: jax.sharding.Mesh, arrays):
    """Device-put a MultiModalArrays (or dict of arrays) with the leading
    dim on the data axis."""
    if hasattr(arrays, "device_put"):
        host = {
            "eeg_input": arrays.eeg_input,
            "eeg_mask": arrays.eeg_mask,
            "act_input": arrays.act_input,
            "act_mask": arrays.act_mask,
            "labels": arrays.labels,
        }
    else:
        host = arrays
    return shard_mod.shard_batch(mesh, host)
