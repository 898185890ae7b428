"""Tracing / profiling utilities (SURVEY §5: the reference's only tracing is
per-epoch time.time() deltas in the record, base_train.py:176,234-235).

Here: honest per-step timing with block_until_ready, an optional
jax.profiler trace context, and NaN/inf guards for debugging runs.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


class StepTimer:
    """Wall-clock timing with device synchronization; keeps a history and
    summary stats for steps/sec reporting."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, *sync_on):
        if sync_on:
            jax.block_until_ready(sync_on)
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def median(self) -> float:
        import numpy as np

        return float(np.median(self.times)) if self.times else 0.0

    def steps_per_sec(self, steps_per_call: int = 1) -> float:
        return steps_per_call / self.median if self.median else 0.0


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def assert_finite(tree, name: str = "tree"):
    """Host-side NaN/inf guard over a pytree (debug runs; replaces the
    reference's absent sanitizers)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(f"non-finite values in {name} at {path}")


def debug_nan_check(enable: bool = True):
    """Toggle jax's global NaN debugging (checks every op's output)."""
    jax.config.update("jax_debug_nans", enable)
