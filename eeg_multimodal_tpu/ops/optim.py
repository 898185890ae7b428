"""Adam with configurable moment storage dtypes (TPU HBM-traffic lever).

The flagship train step is bandwidth-bound, and its single largest HBM
consumer is the Adam update: with f32 moments the optimizer reads and writes
p, mu, nu (plus the gradient read) every step — ~24 bytes/param, ~2.8 GB/step
for the 117M-param trunk, which alone costs ~3.4 ms at the v5e's 819 GB/s
(see tools/roofline_step.py). optax's ``adam(mu_dtype=...)`` lets the FIRST
moment be stored in bf16; this module extends the same trick to the second
moment: both moments are stored at a configurable dtype while every update
computes in f32 (cast up, update, cast back — the same contract optax applies
to mu).

Numerics of a bf16 ``nu``: the second moment only enters the update through
``sqrt(nu_hat) + eps`` in the denominator, so storage rounding perturbs the
step size by at most ~2^-9 relative (bf16 has 8 mantissa bits) — orders of
magnitude below the run-to-run variance of the stochastic DP training
(ACCURACY.md item 13 measures ±0.001..0.013 across seeds). The reference
trains with torch Adam in f32 (base_train.py:168-171); f32 moments remain
the default everywhere, bf16 is an explicit opt-in (TrainConfig.adam_mu_dtype
/ adam_nu_dtype).

With ``mu_dtype=nu_dtype=float32`` this transform is bit-identical to
``optax.adam`` (pinned by tests/test_optim.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _cast_tree(tree, dtype):
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(lambda t: t.astype(dtype), tree)


def scale_by_adam_moment_dtypes(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with independently chosen storage dtypes for
    both moments. Update math runs in the gradient dtype (f32 in the trainer);
    moments are cast up before and back down after each update, exactly the
    contract optax applies to ``mu_dtype``."""

    mu_dtype = None if mu_dtype is None else jnp.dtype(mu_dtype)
    nu_dtype = None if nu_dtype is None else jnp.dtype(nu_dtype)

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda t: jnp.zeros_like(t, dtype=mu_dtype or t.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda t: jnp.zeros_like(t, dtype=nu_dtype or t.dtype), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        count_inc = optax.safe_int32_increment(state.count)

        def upd_mu(m, g):
            m32 = m.astype(g.dtype)
            return b1 * m32 + (1.0 - b1) * g

        def upd_nu(v, g):
            v32 = v.astype(g.dtype)
            return b2 * v32 + (1.0 - b2) * jnp.square(g)

        mu = jax.tree_util.tree_map(upd_mu, state.mu, updates)
        nu = jax.tree_util.tree_map(upd_nu, state.nu, updates)
        # bias corrections mirror optax.bias_correction (int-exponent pow)
        bc1 = 1 - b1**count_inc
        bc2 = 1 - b2**count_inc

        def adam_update(m, v):
            m_hat = m / bc1.astype(m.dtype)
            v_hat = v / bc2.astype(v.dtype)
            return m_hat / (jnp.sqrt(v_hat + eps_root) + eps)

        new_updates = jax.tree_util.tree_map(adam_update, mu, nu)
        new_state = optax.ScaleByAdamState(
            count=count_inc,
            mu=_cast_tree(mu, mu_dtype),
            nu=_cast_tree(nu, nu_dtype),
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
) -> optax.GradientTransformation:
    """Drop-in ``optax.adam`` with both moment dtypes configurable.

    Delegates to stock ``optax.adam`` when ``nu_dtype`` is None/f32 so the
    default path stays byte-for-byte the library implementation.
    """
    if nu_dtype is None or jnp.dtype(nu_dtype) == jnp.float32:
        return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps,
                          mu_dtype=mu_dtype)
    return optax.chain(
        scale_by_adam_moment_dtypes(
            b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype
        ),
        optax.scale(-learning_rate),
    )
