"""Unit tests for the DP mechanism ops (SURVEY.md §4: closed-form DP math).

Checks the eps_hat formula, min-max normalization, Gumbel-softmax semantics
(incl. straight-through hardness), the mask-sum identity of the flagship DP
block (ref models.py:77-79), and the statistics of the Laplace noise paths.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.ops import dp


def test_minmax_normalize_matches_reference_formula():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 10).astype(np.float32)
    out = np.asarray(dp.minmax_normalize(jnp.asarray(x)))
    expected = (x - x.min(axis=1, keepdims=True)) / (
        x.max(axis=1, keepdims=True) - x.min(axis=1, keepdims=True)
    )
    np.testing.assert_allclose(out, expected, rtol=2e-4)
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6


def test_eps_hat_closed_form():
    # ref models.py:75: eps_hat = 1/log((e^eps - w)/(1 - w))
    w = jnp.asarray([0.1, 0.5, 0.9])
    eps = 0.1
    out = np.asarray(dp.eps_hat(w, eps))
    expected = 1.0 / np.log((np.exp(eps) - np.asarray(w)) / (1.0 - np.asarray(w)))
    np.testing.assert_allclose(out, expected, rtol=2e-4)
    # DP=0 => w=0.5 => eps_hat ~ 5.24 for eps=0.1 (sanity anchor)
    assert abs(float(dp.eps_hat(jnp.asarray(0.5), 0.1)) - 5.23827) < 1e-3


def test_eps_hat_matches_torch():
    torch = pytest.importorskip("torch")
    w = torch.rand(1, 16)
    eps = torch.tensor(0.7)
    expected = (1 / (((eps.exp() - w) / (1 - w)).log())).numpy()
    out = np.asarray(dp.eps_hat(jnp.asarray(w.numpy()), 0.7))
    np.testing.assert_allclose(out, expected, rtol=1e-3)  # f32 exp/log noise


def test_gumbel_softmax_soft_sums_to_one():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8).astype(np.float32))
    y = dp.gumbel_softmax(logits, key, tau=1.0, hard=False, axis=0)
    np.testing.assert_allclose(np.asarray(y.sum(axis=0)), 1.0, rtol=1e-5)


def test_gumbel_softmax_hard_is_one_hot_with_st_gradient():
    key = jax.random.PRNGKey(1)
    logits = jnp.asarray(np.random.RandomState(1).randn(6, 3).astype(np.float32))
    y = dp.gumbel_softmax(logits, key, tau=1.0, hard=True, axis=1)
    arr = np.asarray(y)
    assert set(np.unique(arr)).issubset({0.0, 1.0})
    np.testing.assert_allclose(arr.sum(axis=1), 1.0)

    # straight-through: gradient flows as if soft
    def f(lg):
        return jnp.sum(dp.gumbel_softmax(lg, key, tau=1.0, hard=True, axis=1) ** 2 * 3.0)

    g = jax.grad(f)(logits)
    assert np.abs(np.asarray(g)).sum() > 0.0


def test_gumbel_softmax_matches_torch_given_same_gumbels():
    """With identical Gumbel draws, our formula == torch F.gumbel_softmax."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(2)
    logits = rng.randn(2, 5, 7).astype(np.float32)
    gumbels = rng.gumbel(size=logits.shape).astype(np.float32)
    tau = 0.73
    # torch computes softmax((logits + g)/tau); reproduce by monkey-through:
    y_t = torch.nn.functional.softmax(
        (torch.from_numpy(logits) + torch.from_numpy(gumbels)) / tau, dim=0
    ).numpy()
    y_j = jax.nn.softmax((jnp.asarray(logits) + jnp.asarray(gumbels)) / tau, axis=0)
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-5, atol=1e-6)


def test_lap_dropout_mask_sum_identity():
    """(feature * mask).sum(0) == feature when mask is a (hard or soft)
    gumbel-softmax over the stacked axis — the documented identity that
    lap_dropout_fast exploits (ref models.py:77-79)."""
    key = jax.random.PRNGKey(3)
    feat = jnp.asarray(np.random.RandomState(3).rand(4, 16).astype(np.float32))
    dp_param = jnp.asarray(np.random.RandomState(4).randn(1, 16).astype(np.float32))
    for hard in (False, True):
        out = dp.lap_dropout(feat, dp_param, 0.1, key, hard)
        out_fast = dp.lap_dropout_fast(feat, dp_param, 0.1, key, hard)
        # same key => same laplace subkey stream => identical noise; the
        # gumbel branch must then cancel exactly
        k_lap, _ = jax.random.split(key)
        w = jax.nn.sigmoid(dp_param)
        expected = feat + jax.random.laplace(k_lap, feat.shape) * dp.eps_hat(w, 0.1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(out_fast), np.asarray(expected), rtol=2e-4)


def test_lap_dropout_gradients_match_fast_path():
    key = jax.random.PRNGKey(5)
    feat = jnp.asarray(np.random.RandomState(5).rand(4, 16).astype(np.float32))
    dp_param = jnp.asarray(np.random.RandomState(6).randn(1, 16).astype(np.float32))

    def loss_faithful(p):
        return jnp.sum(dp.lap_dropout(feat, p, 0.5, key, hard=False) ** 2)

    def loss_fast(p):
        return jnp.sum(dp.lap_dropout_fast(feat, p, 0.5, key, hard=False) ** 2)

    g1 = jax.grad(loss_faithful)(dp_param)
    g2 = jax.grad(loss_fast)(dp_param)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-5)


def test_laplace_noise_statistics():
    key = jax.random.PRNGKey(7)
    n = dp.laplace_noise(key, (200_000,), scale=2.0)
    arr = np.asarray(n)
    assert abs(arr.mean()) < 0.05
    # Var(Laplace(0, b)) = 2 b^2 = 8
    assert abs(arr.var() - 8.0) < 0.3


def test_per_sample_laplace_broadcasts_one_draw_per_row():
    key = jax.random.PRNGKey(8)
    x = jnp.asarray(np.random.RandomState(8).randn(6, 12).astype(np.float32))
    out = np.asarray(dp.per_sample_laplace(x, 0.5, key))
    base = np.asarray(dp.minmax_normalize(x))
    delta = (out - base).astype(np.float64)
    # the added noise is constant across features within a row
    np.testing.assert_allclose(
        delta, np.broadcast_to(delta[:, :1], delta.shape), rtol=1e-4, atol=1e-5
    )


def test_equal_weight_dp_shapes_and_scale():
    key = jax.random.PRNGKey(9)
    x = jnp.ones((8, 32))
    out = dp.equal_weight_dp(x, epsilon=0.1, dropout_rate=0.5, key=key, train=True)
    assert out.shape == (8, 32)


def test_equal_weight_dp_eval_skips_dropout():
    """Eval semantics: torch nn.Dropout is identity in eval mode, the Laplace
    noise stays on (models.py:399-405 under model.eval()). Per-sample noise is
    constant across features, so eval output minus input is rank-1."""
    key = jax.random.PRNGKey(9)
    x = jnp.asarray(np.random.RandomState(0).rand(8, 32).astype(np.float32))
    out = np.asarray(dp.equal_weight_dp(x, epsilon=0.1, dropout_rate=0.5, key=key, train=False))
    delta = out - np.asarray(x)
    # no zeros introduced (no dropout) and noise broadcast per sample
    np.testing.assert_allclose(delta, np.broadcast_to(delta[:, :1], delta.shape), rtol=1e-5)
    assert (out != 0).all()


def test_gumbel_dropout_scaling():
    """Kept features are scaled by 1/(1-w) (ref train_val.py:101)."""
    key = jax.random.PRNGKey(10)
    w = jnp.full((16,), 0.3)
    x = jnp.ones((16,))
    out = np.asarray(dp.gumbel_dropout(x, w, key, tau=0.1, hard=True))
    ok = np.isclose(out, 0.0) | np.isclose(out, 1.0 / 0.7, rtol=1e-5)
    assert ok.all(), out


def test_privacy_regularized_loss():
    w = jnp.asarray([0.2, 0.8])
    out = float(dp.privacy_regularized_loss(1.0, w, alpha=2.0, epsilon=0.0))
    # (1-w)e^0 + w = 1 everywhere => max = 1; total = 2*1 + 1
    assert abs(out - 3.0) < 1e-6


def test_eps_hat_prefix_is_pre_fix_form():
    """model.py:57's commented legacy form: log((e^eps - w)/(1-w)), the
    reciprocal of the '# fix' formula — noise GROWS with eps (the
    model_dict/new_*eps generation's falling-accuracy signature)."""
    w = jnp.asarray([0.2, 0.5, 0.8])
    for eps in (0.1, 1.0, 10.0):
        np.testing.assert_allclose(
            np.asarray(dp.eps_hat_prefix(w, eps)),
            1.0 / np.asarray(dp.eps_hat(w, eps)),
            rtol=1e-6,
        )
    # monotone: more budget -> MORE noise under the pre-fix form
    small = float(dp.eps_hat_prefix(jnp.asarray([0.5]), 0.1)[0])
    large = float(dp.eps_hat_prefix(jnp.asarray([0.5]), 10.0)[0])
    assert large > small > 0


def test_lap_dropout_prefix_routing():
    """prefix_eps_hat=True swaps only the noise scale (same key stream)."""
    key = jax.random.PRNGKey(11)
    x = jnp.asarray(np.random.RandomState(1).rand(4, 16).astype(np.float32))
    dp_param = jnp.zeros((1, 16))
    a = np.asarray(dp.lap_dropout(x, dp_param, 5.0, key, hard=True))
    b = np.asarray(dp.lap_dropout(x, dp_param, 5.0, key, hard=True,
                                  prefix_eps_hat=True))
    # identical noise draw, scales differ by eps_hat^2 ratio
    w = 0.5
    ratio = float(np.log((np.exp(5.0) - w) / (1 - w))) ** 2
    np.testing.assert_allclose(
        (b - np.asarray(x)), (a - np.asarray(x)) * ratio, rtol=1e-4
    )
