"""The DP mechanism ops: learned per-feature Laplacian noise + Gumbel dropout.

This is the reference's only custom math — the "DP block" inlined in every
``*_LapDropout.forward`` (ref: python/src/custom_models/models.py:73-79, clones
at :119-125, :166-172, :209-215, :263-269; legacy past_acc.py:130-136), plus
the legacy variants: per-sample Laplace (train_val.py:114-123,
main_0430.py:76-85), scaled Gumbel dropout (train_val.py:95-101), the
equal-weight scheme (models.py:399-405) and the privacy-regularized loss
(train_val.py:80-93).

All functions are pure and jit/vmap-safe; randomness is explicit PRNG keys.
XLA fuses the whole block into a handful of elementwise kernels; a
hand-written Pallas version lives in ``ops/dp_pallas.py`` for the fully-fused
single-pass form.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def minmax_normalize(x, axis: int = -1, eps: float = 0.0):
    """Per-row min-max normalization onto [0, 1] (ref: models.py:70-72)."""
    x_min = jnp.min(x, axis=axis, keepdims=True)
    x_max = jnp.max(x, axis=axis, keepdims=True)
    return (x - x_min) / (x_max - x_min + eps)


def laplace_noise(key, shape, loc: float = 0.0, scale: float = 1.0, dtype=jnp.float32):
    """iid Laplace(loc, scale) noise (ref: torch.distributions Laplace sample,
    models.py:54,74)."""
    return loc + scale * jax.random.laplace(key, shape, dtype)


def eps_hat(w, epsilon):
    """Per-feature noise scale: 1 / log((e^eps - w) / (1 - w)).

    ref: models.py:75 (the '# fix' formula, also past_acc.py:132). ``w`` is
    sigmoid(DP) in (0, 1); larger keep-weight w => larger noise scale.
    """
    e = jnp.exp(jnp.asarray(epsilon, jnp.float32))
    return 1.0 / jnp.log((e - w) / (1.0 - w))


def eps_hat_prefix(w, epsilon):
    """The PRE-fix noise scale: log((e^eps - w) / (1 - w)) — no reciprocal.

    ref: model.py:57 (commented-out legacy ConcatModel DP path). This is the
    formula behind the ``model_dict/new_<eps>eps`` generation: noise GROWS
    with eps (log term ~ eps for large eps), which is why those recorded
    accuracies fall 0.987 -> 0.806 as eps goes 0.1 -> 10 while the
    post-fix ``newfrac_*`` runs saturate near 0.987. past_acc.py:132 adds
    the reciprocal with a '# fix' comment and renames the output dirs."""
    e = jnp.exp(jnp.asarray(epsilon, jnp.float32))
    return jnp.log((e - w) / (1.0 - w))


def gumbel_softmax(logits, key, tau: float = 1.0, hard: bool = False, axis: int = -1):
    """torch ``F.gumbel_softmax`` semantics, with explicit PRNG key.

    Soft: softmax((logits + g)/tau) with g ~ Gumbel(0,1). Hard: one-hot of the
    argmax with a straight-through estimator (y_hard - sg(y_soft) + y_soft).
    """
    g = jax.random.gumbel(key, logits.shape, logits.dtype)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis, keepdims=True)
    y_hard = jnp.zeros_like(y_soft)
    y_hard = jnp.put_along_axis(y_hard, index, 1.0, axis=axis, inplace=False)
    # grouping (y_soft - sg(y_soft)) makes the forward an *exact* one-hot
    # (a - a == 0 in IEEE) while keeping torch's straight-through gradient
    return y_hard + (y_soft - jax.lax.stop_gradient(y_soft))


def lap_dropout(feature, dp_param, epsilon, key, hard: bool,
                prefix_eps_hat: bool = False):
    """The flagship DP block (ref: models.py:73-79), verbatim semantics.

    feature  : (B, F) min-max-normalized fused features
    dp_param : (1, F) learnable logits (the 'DP' parameter, models.py:53)
    Returns the privatized feature (B, F).

    Steps (matching the torch lines):
      w = sigmoid(DP)                                   # :73
      noise ~ Laplace(0, 1), feature += noise * eps_hat # :74-76
      mask = gumbel_softmax(stack(w, 1-w), hard, dim=0) # :77-78
      feature = (feature * mask).sum(0)                 # :79

    Note: because ``mask`` is normalized along the stacked axis,
    ``(feature * mask).sum(0) == feature * (mask[0] + mask[1]) == feature``
    in both value and gradient; the block's trainable effect flows entirely
    through ``eps_hat``. We still draw the Gumbel sample and compute the mask
    to preserve the reference's semantics exactly (and its RNG consumption
    pattern under a fixed key); the fused Pallas path exploits the identity.
    """
    k_lap, k_gum = jax.random.split(key)
    w = jax.nn.sigmoid(dp_param)  # (1, F)
    noise = laplace_noise(k_lap, feature.shape, dtype=feature.dtype)
    scale_fn = eps_hat_prefix if prefix_eps_hat else eps_hat
    feature = feature + noise * scale_fn(w, epsilon).astype(feature.dtype)
    logits = jnp.stack((w, 1.0 - w))  # (2, 1, F)
    logits = jnp.broadcast_to(logits, (2, feature.shape[0], feature.shape[1]))
    mask = gumbel_softmax(logits, k_gum, tau=1.0, hard=hard, axis=0)
    return (feature[None] * mask).sum(axis=0)


def lap_dropout_fast(feature, dp_param, epsilon, key, hard: bool,
                     prefix_eps_hat: bool = False):
    """Mathematically identical fast path of :func:`lap_dropout`.

    Uses the mask-sum identity (see docstring above): skips the Gumbel draw
    and masked sum entirely. Gradients w.r.t. both inputs are identical
    because sum(mask, axis=0) == 1 with zero Jacobian w.r.t. w.
    """
    del hard
    k_lap, _ = jax.random.split(key)  # same key stream as the faithful path
    w = jax.nn.sigmoid(dp_param)
    noise = laplace_noise(k_lap, feature.shape, dtype=feature.dtype)
    scale_fn = eps_hat_prefix if prefix_eps_hat else eps_hat
    return feature + noise * scale_fn(w, epsilon).astype(feature.dtype)


def equal_weight_dp(feature, epsilon, dropout_rate, key, train: bool):
    """Equal-weight ablation (ref: models.py:399-405), the single source of
    truth for the scheme (used by fusion.apply): ``nn.Dropout`` — which torch
    applies only in training mode — then a per-*sample* Laplace draw with
    scalar eps_hat broadcast over features (Laplace is applied in eval too;
    the reference's eval forward keeps it, base_train.py:484-506)."""
    k_drop, k_lap = jax.random.split(key)
    if train:
        keep = 1.0 - dropout_rate
        mask = jax.random.bernoulli(k_drop, keep, feature.shape)
        feature = jnp.where(mask, feature / keep, 0.0)
    scalar_eps_hat = 1.0 / jnp.log((jnp.exp(epsilon) - dropout_rate) / (1.0 - dropout_rate))
    lap_sigma = 1.0 / scalar_eps_hat
    noise = laplace_noise(k_lap, (feature.shape[0], 1), scale=lap_sigma, dtype=feature.dtype)
    return feature + noise


def per_sample_laplace(feature, epsilon, key):
    """'feature_all_lap' mode: min-max normalize then one Laplace(0, 1/eps)
    draw per sample broadcast across features (ref: train_val.py:114-123,
    main_0425.py:111-121, main_0430.py:76-85)."""
    feature = minmax_normalize(feature)
    noise = laplace_noise(key, (feature.shape[0], 1), scale=1.0 / epsilon, dtype=feature.dtype)
    return feature + noise


def gumbel_dropout(x, w, key, tau: float = 0.1, hard: bool = True):
    """Legacy PriGumbel gating (ref: train_val.py:95-101): per-feature keep
    prob (1-w), kept features scaled by 1/(1-w).

    ``w`` has shape (F,); logits are cat([w, 1-w]) along a new axis and the
    *second* column (the 1-w branch) is the keep mask."""
    logits = jnp.stack([w, 1.0 - w], axis=1)  # (F, 2)
    gumbel_w = gumbel_softmax(logits, key, tau=tau, hard=hard, axis=1)
    mask = gumbel_w[:, 1]  # (F,)
    return x * mask / (1.0 - w)


def privacy_regularized_loss(ce_loss, w, alpha, epsilon):
    """total = alpha * CE + max((1-w) * e^eps + w) (ref: train_val.py:88-90)."""
    tmp = (1.0 - w) * jnp.exp(epsilon) + w
    return alpha * ce_loss + jnp.max(tmp)
