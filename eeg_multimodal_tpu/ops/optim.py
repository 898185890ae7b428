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

Numerics of a bf16 ``nu``: the per-update perturbation through
``sqrt(nu_hat) + eps`` is ~2^-9 relative (bf16 has 8 mantissa bits), but
round-to-nearest storage has a SYSTEMATIC failure mode for a b2=0.999 EMA:
when ``g^2 < nu`` the per-step decay changes nu by at most ~0.1%, below
bf16's half-ulp (~0.2-0.4%), so the cast-up/update/cast-down round trip
rounds back to the old value and nu can only ratchet upward (AMSGrad-like:
step sizes shrink and never recover). We therefore store nu with
**stochastic rounding** (default when nu_dtype is bf16): uniform random low
bits are added before mantissa truncation, so the stored value rounds to
each bf16 neighbour with probability proportional to proximity and the EMA
is correct in expectation (decay is tracked statistically even when each
individual step is sub-ulp). ``mu`` does not need this — b1=0.9 moves it
~10%/step, far above bf16 resolution — and keeps optax's round-to-nearest
contract. The SR stream is deterministic per (fixed seed, step count), so
determinism-per-seed is preserved. Opting out (``nu_stochastic_rounding=
False``) reinstates the ratcheting max-like optimizer and warns.

The reference trains with torch Adam in f32 (base_train.py:168-171); f32
moments remain the default everywhere, bf16 is an explicit opt-in
(TrainConfig.adam_mu_dtype / adam_nu_dtype).

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


def stochastic_round_to_bf16(x, key):
    """Unbiased f32 -> bf16 rounding via random mantissa bits.

    Adds a uniform uint16 to the f32 bit pattern before truncating the low
    16 mantissa bits, so the result rounds to each neighbouring bf16 value
    with probability proportional to proximity — E[round(x)] == x. Values
    already representable in bf16 (low 16 bits zero) are returned exactly.
    This is what lets a bf16-stored EMA track a sub-ulp per-step decay in
    expectation where round-to-nearest would ratchet (see module docstring).
    """
    assert x.dtype == jnp.float32, x.dtype
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(
        ((bits + rnd) >> 16).astype(jnp.uint16), jnp.bfloat16
    )


def _sr_cast_tree(tree, key):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return treedef.unflatten(
        [stochastic_round_to_bf16(l, k) for l, k in zip(leaves, keys)]
    )


# fixed base seed for the second-moment SR stream: folded with the run's
# training seed and the step count it gives a deterministic-per-seed stream
# without threading a key through the optax GradientTransformation API.
_SR_SEED = 0x0DD5EED


def scale_by_adam_moment_dtypes(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    eps_root: float = 0.0,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
    nu_stochastic_rounding: bool = True,
    sr_seed: Optional[int] = None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with independently chosen storage dtypes for
    both moments. Update math runs in the gradient dtype (f32 in the trainer);
    moments are cast up before and back down after each update, exactly the
    contract optax applies to ``mu_dtype`` — except that a bf16 ``nu`` is by
    default stored with stochastic rounding (see module docstring for why
    round-to-nearest ratchets)."""

    mu_dtype = None if mu_dtype is None else jnp.dtype(mu_dtype)
    nu_dtype = None if nu_dtype is None else jnp.dtype(nu_dtype)
    nu_sr = bool(nu_stochastic_rounding) and nu_dtype == jnp.bfloat16
    if nu_dtype == jnp.bfloat16 and not nu_sr:
        import warnings

        warnings.warn(
            "bf16 nu storage with round-to-nearest cannot track the b2 EMA "
            "decay (sub-ulp per-step change always rounds back): nu will "
            "only ratchet upward (AMSGrad-like). Enable "
            "nu_stochastic_rounding for an unbiased stored EMA.",
            stacklevel=2,
        )

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
        if nu_sr:
            # fold the run's training seed in besides the step count so
            # seed-sweep replicas draw INDEPENDENT rounding noise (perfectly
            # correlated SR across replicas would understate seed-to-seed
            # variance); still deterministic per (seed, step).
            sr_base = jax.random.PRNGKey(_SR_SEED)
            if sr_seed is not None:
                sr_base = jax.random.fold_in(sr_base, sr_seed & 0x7FFFFFFF)
            nu_stored = _sr_cast_tree(
                nu, jax.random.fold_in(sr_base, count_inc)
            )
        else:
            nu_stored = _cast_tree(nu, nu_dtype)
        new_state = optax.ScaleByAdamState(
            count=count_inc,
            mu=_cast_tree(mu, mu_dtype),
            nu=nu_stored,
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
    nu_stochastic_rounding: bool = True,
    sr_seed: Optional[int] = None,
) -> optax.GradientTransformation:
    """Drop-in ``optax.adam`` with both moment dtypes configurable.

    Delegates to stock ``optax.adam`` when ``nu_dtype`` is None/f32 so the
    default path stays byte-for-byte the library implementation.
    ``sr_seed`` (the run's training seed) decorrelates the stochastic-
    rounding stream across seed-sweep replicas.
    """
    if nu_dtype is None or jnp.dtype(nu_dtype) == jnp.float32:
        return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps,
                          mu_dtype=mu_dtype)
    return optax.chain(
        scale_by_adam_moment_dtypes(
            b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype, nu_dtype=nu_dtype,
            nu_stochastic_rounding=nu_stochastic_rounding, sr_seed=sr_seed,
        ),
        optax.scale(-learning_rate),
    )
