"""DP-SGD: per-example gradients, clipping, Gaussian noise, Poisson sampling.

TPU-native replacement for the reference's Opacus integration
(base_train.py:320-434):
  - freeze everything except [last BERT layer, pooler, fc_layers,
    visual_encoder, classifier] (base_train.py:322-333);
  - Poisson-subsample the training set at rate q = B/N (the Opacus loader
    wrap);
  - per-example gradients via ``jax.vmap(jax.grad(...))`` over the trainable
    subtree only, clipped to max_grad_norm=0.1 (base_train.py:338), summed,
    Gaussian noise sigma * C added, normalized by the expected batch size;
  - sigma calibrated to (target_epsilon, delta=1/len(loader)) by the RDP
    accountant (accountant.get_noise_multiplier), mirroring
    ``make_private_with_epsilon`` (base_train.py:340-348).

Poisson sampling under jit: a Bernoulli(q) draw over all N examples is
materialized as a fixed-width index window of size b_max (q*N + 6 sigma) with
a 0/1 weight vector — static shapes for XLA, with truncation probability
< 1e-8.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.trees import tree_partition, tree_merge
from . import accountant

MAX_GRAD_NORM = 0.1  # ref: base_train.py:338


def trainable_predicate(path: str, bert_layers: int = 12) -> bool:
    """The reference's trainable-layer set (base_train.py:322-333)."""
    last = f"bert/layers/{bert_layers - 1}/"
    return (
        path.startswith(last)
        or path.startswith("bert/pooler")
        or path.startswith("fc1/")
        or path.startswith("fc2/")
        or path.startswith("classifier/")
        or path.startswith("visual_encoder/")
    )


def poisson_batch_indices(key, n: int, q: float, b_max: Optional[int] = None):
    """One Poisson-subsampled batch as (idx (b_max,), weight (b_max,)).

    Every example is included independently with prob q; the selected set is
    compacted into a fixed-width window (selected entries first).
    """
    if b_max is None:
        mean = n * q
        b_max = int(mean + 6 * math.sqrt(max(mean * (1 - q), 1.0))) + 1
    mask = jax.random.bernoulli(key, q, (n,))
    # order: selected examples first (stable), then the rest
    order = jnp.argsort(~mask)  # False < True; ~mask False for selected
    idx = order[:b_max].astype(jnp.int32)
    weight = mask[idx].astype(jnp.float32)
    return idx, weight


def clip_per_example(grads, max_norm: float):
    """Clip each example's gradient pytree to global L2 norm <= max_norm.
    ``grads`` leaves have a leading per-example axis."""
    sq = sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)), axis=tuple(range(1, g.ndim)))
        for g in jax.tree_util.tree_leaves(grads)
    )
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-12))
    return jax.tree_util.tree_map(
        lambda g: g * scale.reshape((-1,) + (1,) * (g.ndim - 1)), grads
    )


def noisy_aggregate(clipped, weight, noise_key, noise_multiplier: float,
                    max_norm: float, expected_batch: int):
    """sum(weight * clipped) + N(0, sigma C) per coord, / expected_batch —
    the Opacus DPOptimizer aggregation."""
    leaves, treedef = jax.tree_util.tree_flatten(clipped)
    keys = jax.random.split(noise_key, len(leaves))
    out = []
    for g, k in zip(leaves, keys):
        w = weight.reshape((-1,) + (1,) * (g.ndim - 1))
        s = jnp.sum(g * w, axis=0)
        noise = noise_multiplier * max_norm * jax.random.normal(k, s.shape, s.dtype)
        out.append((s + noise) / expected_batch)
    return jax.tree_util.tree_unflatten(treedef, out)


@dataclasses.dataclass
class DPSGDConfig:
    target_epsilon: float
    epochs: int
    batch_size: int = 8
    max_grad_norm: float = MAX_GRAD_NORM
    learning_rate: float = 1e-6
    target_delta: Optional[float] = None  # default 1/len(loader), ref :337


def make_private(n_train: int, cfg: DPSGDConfig):
    """Privacy setup mirroring make_private_with_epsilon: returns
    (noise_multiplier, sample_rate, delta, steps_per_epoch)."""
    steps_per_epoch = -(-n_train // cfg.batch_size)
    delta = cfg.target_delta if cfg.target_delta is not None else 1.0 / steps_per_epoch
    q = cfg.batch_size / n_train
    sigma = accountant.get_noise_multiplier(
        target_epsilon=cfg.target_epsilon,
        target_delta=delta,
        sample_rate=q,
        steps=cfg.epochs * steps_per_epoch,
    )
    return sigma, q, delta, steps_per_epoch


def make_dpsgd_step(loss_fn, trainable_pred, optimizer, noise_multiplier: float,
                    max_norm: float, expected_batch: int):
    """Build a jittable DP-SGD step.

    ``loss_fn(params, example, rng) -> scalar`` is the per-example loss;
    ``trainable_pred`` selects the private subtree (the rest stays frozen,
    matching requires_grad=False in the reference).
    """

    def step(params, opt_state, batch, weight, rng):
        k_grad, k_noise = jax.random.split(rng)
        trainable, frozen = tree_partition(params, trainable_pred)

        def example_loss(tr, example, k):
            p = tree_merge(tr, frozen)
            return loss_fn(p, example, k)

        b = weight.shape[0]
        keys = jax.random.split(k_grad, b)
        per_ex = jax.vmap(jax.grad(example_loss), in_axes=(None, 0, 0))(
            trainable, batch, keys
        )
        clipped = clip_per_example(per_ex, max_norm)
        grads = noisy_aggregate(
            clipped, weight, k_noise, noise_multiplier, max_norm, expected_batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return tree_merge(trainable, frozen), opt_state

    return step
