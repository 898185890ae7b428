"""Deterministic seeding.

The reference seeds torch/numpy/random with 980616 before every run
(ref: base_train.py:23-43, demo.py:19-28). JAX replaces ambient RNG state with
explicit key threading; ``set_seed`` returns the root PRNG key from which all
randomness (param init, shuffling, dropout, Laplace/Gumbel noise) is derived,
so one seed reproduces an entire run bit-for-bit on a fixed backend.
"""
from __future__ import annotations

import jax

DEFAULT_SEED = 980616  # ref: base_train.py:43


def set_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    """Return the root PRNG key for a run (ref semantics: set_seed(980616))."""
    return jax.random.PRNGKey(seed)


def key_chain(key: jax.Array, *names: str) -> jax.Array:
    """Derive a named sub-key: fold each name's hash into the key.

    Named derivation keeps independent subsystems (init / shuffle / noise)
    decoupled: adding randomness to one never perturbs another.
    """
    for name in names:
        key = jax.random.fold_in(key, _stable_hash(name))
    return key


def _stable_hash(name: str) -> int:
    # Python's hash() is salted per-process; use FNV-1a for stability.
    h = 2166136261
    for b in name.encode():
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h
