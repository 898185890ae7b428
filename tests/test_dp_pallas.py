"""Fused DP-block Pallas kernel: parity with the composed jnp ops
(deterministic parts exact; noise parts statistical) and gradient checks."""
import numpy as np
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.ops import dp as dp_ops
from eeg_multimodal_tpu.ops import dp_pallas as K


def inputs(b=8, f=256, seed=0):
    rng = np.random.RandomState(seed)
    feat = jnp.asarray(rng.randn(b, f), jnp.float32)
    dp = jnp.asarray(rng.randn(1, f), jnp.float32)
    return feat, dp


def test_fused_deterministic_part_matches_ops():
    """With the noise subtracted back out, the kernel must equal minmax
    normalization exactly — and the noise must have the eps_hat scale."""
    feat, dp = inputs()
    eps = jnp.float32(0.5)
    seed = jnp.asarray([3], jnp.int32)
    out = K.fused_lap_dropout(feat, dp, eps, seed)
    norm = dp_ops.minmax_normalize(feat)
    w = jax.nn.sigmoid(dp)
    eps_hat = dp_ops.eps_hat(w, 0.5)
    noise = (np.asarray(out) - np.asarray(norm)) / np.asarray(eps_hat)
    # recovered noise is iid Laplace(0,1): mean ~0, var ~2
    assert abs(noise.mean()) < 0.1
    assert abs(noise.var() - 2.0) < 0.35
    # determinism per seed
    out2 = K.fused_lap_dropout(feat, dp, eps, seed)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = K.fused_lap_dropout(feat, dp, eps, jnp.asarray([4], jnp.int32))
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 0


def test_fused_gradients_match_autodiff_of_equivalent():
    """Same seed => same noise, so grads must match jax autodiff of the
    composed expression with that exact noise."""
    feat, dp = inputs(b=4, f=128, seed=1)
    eps = jnp.float32(0.7)
    seed = jnp.asarray([11], jnp.int32)

    out = K.fused_lap_dropout(feat, dp, eps, seed)
    norm = dp_ops.minmax_normalize(feat)
    w = jax.nn.sigmoid(dp)
    noise = (out - norm) / dp_ops.eps_hat(w, 0.7)
    noise = jax.lax.stop_gradient(noise)

    def composed(feat, dp):
        n = dp_ops.minmax_normalize(feat)
        w = jax.nn.sigmoid(dp)
        return n + noise * dp_ops.eps_hat(w, 0.7)

    def via_kernel(feat, dp):
        return K.fused_lap_dropout(feat, dp, eps, seed)

    g_val = jnp.asarray(np.random.RandomState(2).randn(4, 128), jnp.float32)

    def loss_k(feat, dp):
        return jnp.sum(via_kernel(feat, dp) * g_val)

    def loss_c(feat, dp):
        return jnp.sum(composed(feat, dp) * g_val)

    gk = jax.grad(loss_k, argnums=(0, 1))(feat, dp)
    gc = jax.grad(loss_c, argnums=(0, 1))(feat, dp)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gc[0]), rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gc[1]), rtol=2e-3, atol=1e-4)


def test_fused_jits_and_vmaps():
    feat, dp = inputs(b=4, f=128, seed=3)
    eps = jnp.float32(1.0)
    seed = jnp.asarray([5], jnp.int32)
    out = jax.jit(K.fused_lap_dropout)(feat, dp, eps, seed)
    assert out.shape == (4, 128)
    stacked = jnp.stack([feat, feat + 1.0])
    dps = jnp.stack([dp, dp * 2])
    outs = jax.vmap(lambda f, d: K.fused_lap_dropout(f, d, eps, seed))(stacked, dps)
    assert outs.shape == (2, 4, 128)
