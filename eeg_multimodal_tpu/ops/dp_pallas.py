"""Fused Pallas kernel for the DP block (ref: models.py:70-79).

One pass over the fused feature matrix computes, entirely in VMEM:

  min-max normalize (row-wise)            # models.py:70-72
  w = sigmoid(DP); eps_hat(w, eps)        # models.py:73,75
  Laplace(0,1) sampling via the in-kernel TPU PRNG (inverse-CDF transform)
  feature + noise * eps_hat               # models.py:74,76

The Gumbel mask stage is a value- and gradient-exact identity
(ops/dp.py::lap_dropout docstring), so the fused kernel implements the
mathematically equal `lap_dropout_fast` form. Backward is a custom VJP: with
the same seed the kernel regenerates the identical noise, and

  d out / d feature_raw : through the min-max normalization
  d out / d DP          : noise * d eps_hat/d w * sigmoid'(DP)

At the reference's (8, 2304) shape this is bandwidth-trivial — the kernel
exists to keep the whole mechanism a single HBM round trip and to serve as
the package's template for fused elementwise+PRNG ops. Shapes must have the
feature dim padded to 128 lanes (2304 = 18 * 128 ✓).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _laplace_from_bits(shape):
    """Laplace(0,1) via inverse CDF of U(-0.5, 0.5):
    x = -sign(u) * ln(1 - 2|u|).

    The +0.5 half-ulp offset keeps u01 strictly inside (0, 1): a raw 24-bit
    draw of exactly 0 would give u = -0.5 and log1p(-1) = -inf (f32 rounds
    -1 + 1e-12 back to -1, so an additive epsilon does NOT guard this).
    That 2^-24-per-element event is what produced the "scanned dual-kernel
    NaN" misdiagnosed as a miscompile in round 2: at (8, 2304) per step it
    fires with p ~ 1.1e-3/instance-step, i.e. reliably within a few hundred
    train steps but almost never in short tests
    (tools/repro_fused_dp_scan_nan.py pins the deterministic repro at step
    363 and the fix). 23 bits, not 24: k + 0.5 must be exactly
    representable in f32, which needs k < 2^23 — with 24-bit draws the top
    value rounds to 1.0 and reintroduces the inf at u = +0.5 (observed:
    repro moved from step 363 to step 451). With the offset,
    |u| <= 0.5 - 2^-24 bounds the noise magnitude at ln(2^-23) ~ 15.9 — a
    negligible tail truncation."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # top 23 bits -> U(0,1) with exact f32 representation; Mosaic has no
    # uint32->f32 cast, so bitcast to int32 first (sign bit is clear)
    u01 = (
        pltpu.bitcast(bits >> 9, jnp.int32).astype(jnp.float32) + 0.5
    ) * (1.0 / (1 << 23))
    u = u01 - 0.5
    mag = jnp.log1p(-2.0 * jnp.abs(u))
    return -jnp.sign(u) * mag


def _dp_fwd_kernel(seed_ref, f_ref, dp_ref, eps_ref, o_ref):
    f = f_ref[...].astype(jnp.float32)  # (B, F) raw fused features
    fmin = jnp.min(f, axis=-1, keepdims=True)
    fmax = jnp.max(f, axis=-1, keepdims=True)
    norm = (f - fmin) / (fmax - fmin)
    w = jax.nn.sigmoid(dp_ref[...].astype(jnp.float32))  # (1, F)
    eps = eps_ref[0]
    eps_hat = 1.0 / jnp.log((jnp.exp(eps) - w) / (1.0 - w))
    pltpu.prng_seed(seed_ref[0])
    noise = _laplace_from_bits(f.shape)
    o_ref[...] = (norm + noise * eps_hat).astype(o_ref.dtype)


def _dp_bwd_kernel(seed_ref, f_ref, dp_ref, eps_ref, g_ref, df_ref, ddp_ref):
    f = f_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    fmin = jnp.min(f, axis=-1, keepdims=True)
    fmax = jnp.max(f, axis=-1, keepdims=True)
    span = fmax - fmin
    norm = (f - fmin) / span
    dp = dp_ref[...].astype(jnp.float32)
    w = jax.nn.sigmoid(dp)
    eps = eps_ref[0]
    ew = jnp.exp(eps) - w
    one_w = 1.0 - w
    log_term = jnp.log(ew / one_w)
    eps_hat = 1.0 / log_term
    pltpu.prng_seed(seed_ref[0])
    noise = _laplace_from_bits(f.shape)

    # d out / d norm = 1; propagate through row min-max:
    # norm = (f - fmin)/span, with subgradients routed to the argmin/argmax
    # elements exactly as XLA's autodiff of min/max does.
    g_norm = g / span
    # d/d fmin: -(span) - ... full quotient rule:
    # d norm/d fmin = (-span + (f - fmin)) / span^2 = (norm - 1)/span
    # d norm/d fmax = -(f - fmin)/span^2 = -norm/span
    g_fmin = jnp.sum(g * (norm - 1.0) / span, axis=-1, keepdims=True)
    g_fmax = jnp.sum(g * (-norm) / span, axis=-1, keepdims=True)
    is_min = (f == fmin).astype(jnp.float32)
    is_max = (f == fmax).astype(jnp.float32)
    # route to first argmin/argmax occurrence like lax.min/max grads do by
    # splitting equally among ties (matches jnp.min/max vjp semantics)
    is_min = is_min / jnp.maximum(jnp.sum(is_min, -1, keepdims=True), 1.0)
    is_max = is_max / jnp.maximum(jnp.sum(is_max, -1, keepdims=True), 1.0)
    df = g_norm + g_fmin * is_min + g_fmax * is_max

    # d out / d DP = g * noise * d eps_hat/d w * w(1-w)
    # d eps_hat/d w = (1/log^2) * (1/ew + 1/(1-w)) [since d log_term/dw =
    #   -(-1/ew + ... ) careful:] log_term = log(ew) - log(1-w);
    #   d/dw = (-1)/ew + 1/(1-w)
    dlog = -1.0 / ew + 1.0 / one_w
    deps_hat = -dlog / (log_term * log_term)
    ddp = jnp.sum(g * noise, axis=0, keepdims=True) * deps_hat * w * one_w
    df_ref[...] = df.astype(df_ref.dtype)
    ddp_ref[...] = ddp.astype(ddp_ref.dtype)


def _call(kernel, out_shapes, seed, *args):
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args]
    return pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=specs,
            out_specs=(
                [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes]
                if isinstance(out_shapes, (list, tuple))
                else pl.BlockSpec(memory_space=pltpu.VMEM)
            ),
        ),
        interpret=jax.default_backend() == "cpu",
    )(seed.astype(jnp.int32).reshape(1), *args)


def _reference_impl(feature_raw, dp_param, epsilon, seed):
    """Pure-JAX equivalent for CPU (the TPU in-kernel PRNG has no CPU
    lowering). Noise stream differs bitwise from the TPU kernel but is
    Laplace(0,1) and deterministic per seed."""
    f = feature_raw.astype(jnp.float32)
    fmin = jnp.min(f, axis=-1, keepdims=True)
    fmax = jnp.max(f, axis=-1, keepdims=True)
    norm = (f - fmin) / (fmax - fmin)
    w = jax.nn.sigmoid(dp_param.astype(jnp.float32))
    eps_hat = 1.0 / jnp.log((jnp.exp(epsilon) - w) / (1.0 - w))
    key = jax.random.PRNGKey(seed.reshape(())[...].astype(jnp.uint32))
    noise = jax.random.laplace(key, f.shape)
    return norm + noise * eps_hat


@jax.custom_vjp
def fused_lap_dropout(feature_raw, dp_param, epsilon, seed):
    """minmax-normalize + learned per-feature Laplace noise, one kernel.

    feature_raw: (B, F) raw fused concat (pre-normalization, models.py:69);
    dp_param: (1, F); epsilon: () f32; seed: (1,) int32.
    Equals ops.dp.lap_dropout_fast(minmax inside) with TPU-PRNG noise.
    """
    return _fwd(feature_raw, dp_param, epsilon, seed)


def _fwd(feature_raw, dp_param, epsilon, seed):
    if jax.default_backend() == "cpu":
        return _reference_impl(feature_raw, dp_param, epsilon, seed)
    return _call(
        _dp_fwd_kernel,
        jax.ShapeDtypeStruct(feature_raw.shape, jnp.float32),
        seed,
        feature_raw,
        dp_param,
        jnp.reshape(epsilon.astype(jnp.float32), (1,)),
    )


def _fwd_rule(feature_raw, dp_param, epsilon, seed):
    out = _fwd(feature_raw, dp_param, epsilon, seed)
    return out, (feature_raw, dp_param, epsilon, seed)


def _bwd_rule(res, g):
    import numpy as np

    feature_raw, dp_param, epsilon, seed = res
    if jax.default_backend() == "cpu":
        _, vjp = jax.vjp(
            lambda f, d: _reference_impl(f, d, epsilon, seed),
            feature_raw, dp_param,
        )
        df, ddp = vjp(g.astype(jnp.float32))
        return (df.astype(feature_raw.dtype), ddp.astype(dp_param.dtype),
                jnp.zeros_like(epsilon), np.zeros(seed.shape, jax.dtypes.float0))
    df, ddp = _call(
        _dp_bwd_kernel,
        (
            jax.ShapeDtypeStruct(feature_raw.shape, feature_raw.dtype),
            jax.ShapeDtypeStruct(dp_param.shape, jnp.float32),
        ),
        seed,
        feature_raw,
        dp_param,
        jnp.reshape(epsilon.astype(jnp.float32), (1,)),
        g,
    )
    deps = jnp.zeros_like(epsilon)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return df, ddp.astype(dp_param.dtype), deps, dseed


fused_lap_dropout.defvjp(_fwd_rule, _bwd_rule)
