"""Parity tests for the fused Pallas attention kernel (CPU interpret mode)
against the einsum reference: forward, backward, mask handling, dropout
statistics, and gating."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.ops import attention as A


def einsum_attention(q, k, v, bias):
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / math.sqrt(D)
    s = s + bias[:, None, None, :] if bias.ndim == 2 else s + bias[:, :, None, :]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def make_inputs(B=2, H=3, S=128, D=64, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    mask = np.zeros((B, S), np.float32)
    mask[0, 100:] = np.finfo(np.float32).min
    bias = jnp.asarray(mask)[:, None, :]  # (B, 1, S)
    return q, k, v, bias


def test_fused_forward_matches_einsum():
    q, k, v, bias = make_inputs()
    out = A.fused_attention(q, k, v, bias, jnp.zeros((1,), jnp.int32), 0.0)
    ref = einsum_attention(q, k, v, bias[:, 0, :])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_backward_matches_einsum():
    q, k, v, bias = make_inputs(seed=1)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_fused(q, k, v):
        return jnp.sum(A.fused_attention(q, k, v, bias, seed, 0.0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(einsum_attention(q, k, v, bias[:, 0, :]) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_fused_dropout_statistics_and_determinism():
    q, k, v, bias = make_inputs(seed=2)
    seed = jnp.asarray([42], jnp.int32)
    out1 = A.fused_attention(q, k, v, bias, seed, 0.5)
    out2 = A.fused_attention(q, k, v, bias, seed, 0.5)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = A.fused_attention(q, k, v, bias, jnp.asarray([43], jnp.int32), 0.5)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0
    # expectation preserved roughly (inverted dropout)
    ref = einsum_attention(q, k, v, bias[:, 0, :])
    outs = [
        np.asarray(A.fused_attention(q, k, v, bias, jnp.asarray([s], jnp.int32), 0.5))
        for s in range(8)
    ]
    mean = np.mean(outs, axis=0)
    corr = np.corrcoef(mean.reshape(-1), np.asarray(ref).reshape(-1))[0, 1]
    assert corr > 0.9  # 8-seed average of p=0.5 dropout is still noisy


def test_fused_dropout_backward_runs():
    q, k, v, bias = make_inputs(seed=3)
    seed = jnp.asarray([7], jnp.int32)

    def loss(q):
        return jnp.sum(A.fused_attention(q, k, v, bias, seed, 0.1) ** 2)

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_attention_available_gating():
    assert A.attention_available(512, 64)
    assert not A.attention_available(128, 64)  # XLA einsum wins at small S
    assert not A.attention_available(100, 64)  # not 128-aligned
    assert not A.attention_available(512, 48)  # D not 64-aligned
    assert not A.attention_available(2048, 64)  # scores too big for VMEM


def test_bert_with_fused_attention_matches_einsum_path():
    from eeg_multimodal_tpu.models import bert as B

    cfg = B.BertConfig(
        vocab_size=60, hidden_size=128, num_layers=2, num_heads=2,
        intermediate_size=64, max_position_embeddings=128,
    )
    params = B.init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 60, (2, 128)))
    mask = jnp.ones((2, 128), jnp.int32).at[0, 64:].set(0)
    B.USE_FUSED_ATTENTION = True
    seq_f, pooled_f = B.apply(params, ids, mask, cfg)
    B.USE_FUSED_ATTENTION = False
    seq_e, pooled_e = B.apply(params, ids, mask, cfg)
    B.USE_FUSED_ATTENTION = True
    np.testing.assert_allclose(
        np.asarray(seq_f), np.asarray(seq_e), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled_f), np.asarray(pooled_e), rtol=1e-3, atol=1e-4
    )
