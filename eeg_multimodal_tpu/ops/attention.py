"""Fused attention Pallas kernel for the 512-token BERT self-attention.

The einsum attention materializes (B, H, S, S) f32 score/prob tensors in HBM
(for BERT-base at B=8, S=512 that is ~100 MB per layer per direction). At
S=512, D=64 an entire head's Q/K/V (3 x 128 KB) plus the full 512x512 score
matrix (1 MB) fit comfortably in VMEM, so the kernel computes one (batch,
head) attention entirely on-chip per grid step — the flash-attention HBM win
without online-softmax bookkeeping. Forward and backward are both Pallas
kernels wired through jax.custom_vjp; attention-prob dropout (BERT trains
with p=0.1 on the probs) uses the in-kernel TPU PRNG with a per-(batch,head)
seed so the backward regenerates the identical mask.

Numerics: scores accumulate in f32 on the MXU regardless of input dtype;
probs are cast back to the input dtype for the PV matmul (bf16 inputs keep
bf16 flops). Softmax is the max-subtracted stable form, matching the einsum
reference to float tolerance.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prec(dtype):
    # full-precision passes only exist for f32 operands; Mosaic rejects the
    # precision attribute on bf16 inputs ("Bad lhs type")
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _head_seed(seed_ref, i, n_heads):
    """Distinct PRNG seed per (batch, head-block, head) — the backward
    re-seeds identically to regenerate the forward's dropout mask."""
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    return seed_ref[0] + pid * n_heads + i


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale,
                dropout_rate, block_h):
    bias = bias_ref[0]  # (1, S), shared by every head in the block
    for i in range(block_h):  # statically unrolled head loop
        q = q_ref[0, i]  # (S, D)
        k = k_ref[0, i]
        v = v_ref[0, i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_prec(q.dtype),
        ) * scale  # (S, S)
        s = s + bias  # additive mask bias broadcasts over rows
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            pltpu.prng_seed(_head_seed(seed_ref, i, block_h))
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            threshold = jnp.uint32(int((1.0 - dropout_rate) * (1 << 24)))
            keep = (bits >> 8) < threshold
            p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(v.dtype),
        )
        o_ref[0, i] = o.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, dropout_rate, block_h):
    bias = bias_ref[0]
    for i in range(block_h):
        q = q_ref[0, i]
        k = k_ref[0, i]
        v = v_ref[0, i]
        do = do_ref[0, i].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_prec(q.dtype),
        ) * scale
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # pre-dropout probs
        if dropout_rate > 0.0:
            pltpu.prng_seed(_head_seed(seed_ref, i, block_h))
            bits = pltpu.bitcast(pltpu.prng_random_bits(p.shape), jnp.uint32)
            threshold = jnp.uint32(int((1.0 - dropout_rate) * (1 << 24)))
            keep = (bits >> 8) < threshold
            p_drop = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
        else:
            p_drop = p
        # matmuls run in the input dtype on the MXU (bf16 flops in bf16
        # mode, full-precision passes in f32 mode) with f32 accumulation
        dt = q.dtype
        prec = _prec(dt)
        # dV = P_drop^T dO
        dv = jax.lax.dot_general(
            p_drop.astype(dt), do.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        # dP_drop = dO V^T
        dp = jax.lax.dot_general(
            do.astype(dt), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dp / (1.0 - dropout_rate), 0.0)
        # softmax backward: dS = P * (dP - rowsum(dP * P)) — f32 on the VPU
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - row)
        dq = jax.lax.dot_general(
            ds.astype(dt), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        dk = jax.lax.dot_general(
            ds.astype(dt), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        dq_ref[0, i] = dq.astype(dq_ref.dtype)
        dk_ref[0, i] = dk.astype(dk_ref.dtype)
        dv_ref[0, i] = dv.astype(dv_ref.dtype)


def block_heads(S: int, H: int) -> int:
    """Heads per program. At short sequences one (batch, head) per program
    is too little work — grid overhead and HBM latency dominate — so the
    whole head axis runs in one program (statically unrolled); at S >= 256 a
    single head's score matrix is large enough to fill the pipeline."""
    return H if S < 256 else 1


def _specs(B, H, S, D, block_h):
    # index maps receive the grid indices plus the scalar-prefetch ref
    qspec = pl.BlockSpec(
        (1, block_h, S, D), lambda b, h, seed_ref: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bspec = pl.BlockSpec((1, 1, S), lambda b, h, seed_ref: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, bspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention(q, k, v, bias, seed, dropout_rate=0.0):
    """q,k,v: (B, H, S, D); bias: (B, 1, S) additive f32 (0 / -inf-ish);
    seed: (1,) int32 (traced — one compile serves every step).

    Returns (B, H, S, D) = softmax(qk^T * scale + bias) @ v with optional
    prob dropout (train path).
    """
    return _fused_fwd_impl(q, k, v, bias, seed, dropout_rate)


def _reference_impl(q, k, v, bias, seed, dropout_rate):
    """Pure-JAX equivalent (used on CPU where the in-kernel TPU PRNG has no
    lowering). Mask derivation differs bitwise from the TPU kernel but has
    identical Bernoulli(1-p) statistics and is deterministic per seed."""
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(D)
    s = s + bias[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        key = jax.random.PRNGKey(seed.reshape(())[...].astype(jnp.uint32))
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)


def _fused_fwd_impl(q, k, v, bias, seed, dropout_rate):
    if dropout_rate > 0.0 and _should_interpret():
        return _reference_impl(q, k, v, bias, seed, dropout_rate)
    B, H, S, D = q.shape
    scale = 1.0 / math.sqrt(D)
    block_h = block_heads(S, H)
    qspec, bspec = _specs(B, H, S, D, block_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // block_h),
        in_specs=[qspec, qspec, qspec, bspec],
        out_specs=qspec,
    )
    kernel = functools.partial(
        _fwd_kernel, scale=scale, dropout_rate=dropout_rate, block_h=block_h
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid_spec=grid_spec,
        interpret=_should_interpret(),
    )(seed.astype(jnp.int32).reshape(1), q, k, v, bias)


def _fused_fwd(q, k, v, bias, seed, dropout_rate):
    out = _fused_fwd_impl(q, k, v, bias, seed, dropout_rate)
    return out, (q, k, v, bias, seed)


def _fused_bwd(dropout_rate, res, do):
    import numpy as np

    q, k, v, bias, seed = res
    if dropout_rate > 0.0 and _should_interpret():
        _, vjp = jax.vjp(
            lambda q, k, v: _reference_impl(q, k, v, bias, seed, dropout_rate),
            q, k, v,
        )
        dq, dk, dv = vjp(do)
        return (dq, dk, dv, jnp.zeros_like(bias),
                np.zeros(seed.shape, jax.dtypes.float0))
    B, H, S, D = q.shape
    scale = 1.0 / math.sqrt(D)
    block_h = block_heads(S, H)
    qspec, bspec = _specs(B, H, S, D, block_h)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H // block_h),
        in_specs=[qspec, qspec, qspec, bspec, qspec],
        out_specs=(qspec, qspec, qspec),
    )
    kernel = functools.partial(
        _bwd_kernel, scale=scale, dropout_rate=dropout_rate, block_h=block_h
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid_spec=grid_spec,
        interpret=_should_interpret(),
    )(seed.astype(jnp.int32).reshape(1), q, k, v, bias, do)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(bias), dseed


fused_attention.defvjp(_fused_fwd, _fused_bwd)


def _should_interpret() -> bool:
    """Pallas compiles natively on TPU; CPU tests run the interpreter."""
    return jax.default_backend() == "cpu"


def attention_available(S: int, D: int) -> bool:
    """Gate for the blocked kernel, backed by measurement.

    Needs the whole head-block in VMEM (S*S f32 scores + operands under the
    ~16 MB budget) and S large enough that HBM score materialization hurts.
    tools/bench_attention.py, v5e, 12-layer BERT-base batch 8 bf16 with
    attention-prob dropout, kernel/einsum time ratios (round 2, with the
    head-blocked grid):

        S=128: fwd 1.22  fwd+bwd 1.23   -> einsum wins
        S=256: fwd 0.95  fwd+bwd 1.13   -> mixed; einsum kept
        S=512: fwd 0.83  fwd+bwd 0.80   -> kernel wins both passes

    so the kernel dispatches only from S=512 (the reference's legacy
    512-token path); the flagship S<=128 training path stays on XLA's fused
    einsum, which is the honest winner there."""
    vmem = S * S * 4 + 5 * S * D * 4
    return (
        S % 128 == 0 and D % 64 == 0 and S >= 512
        and vmem < 8 * 1024 * 1024
    )
