"""Self-supervised pretraining of the CLIP visual tower — the image
analogue of MLM pretraining (train/mlm.py) for the zero-egress setting.

Why this exists: the reference's image features come from *pretrained*
OpenAI CLIP (`clip.load(coef)`, ref get_embedding.py:62-71); its committed
ii-pairing number (0.827, logs/compare_modal/ii/best_record.txt) rests
entirely on those weights, which cannot be downloaded here.

The objective that works is **rendering inversion**: each 224x224 image is
a deterministic rendering of its ~25-30 sensor values (get_embedding.py:
18-48), so predicting the standardized source row from the tower's
embedding is a dense supervised pretext that forces the embedding to carry
exactly the discriminative content the downstream classifier needs. A
CLIP-style symmetric InfoNCE over same-moment EEG/act pairs (one shared
tower, learned temperature — Radford et al. 2021) rides along as a small
auxiliary aligning the two modalities' embedding spaces; alone it
collapses, because different samples' renderings are visually
near-identical (measured off-diag cosine 0.8624 vs diag 0.8625 at init —
no batch-negative signal).

TPU-first: the corpus stays as raw sensor ROWS in HBM (2402 x ~30 floats —
a few hundred KB); every batch renders its 3x224x224 images *in-jit* via the
vmapped transforms (data/image_transform.py) so no image tensor ever touches
the host. A training run is a lax.scan over batches like the MLM trainer.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import image_transform
from ..models import vit as vit_mod
from ..utils.trees import tree_cast


@dataclasses.dataclass(frozen=True)
class ContrastiveConfig:
    batch_size: int = 128
    learning_rate: float = 3e-4
    warmup_steps: int = 100
    total_steps: int = 1500
    weight_decay: float = 0.1
    # CLIP init: temperature tau=0.07, stored as learnable log scale
    init_logit_scale: float = float(np.log(1.0 / 0.07))
    max_logit_scale: float = float(np.log(100.0))
    seed: int = 980616
    log_every: int = 25
    compute_dtype: str = "bfloat16"
    # Loss mix. The renderings of different samples are *visually* nearly
    # identical (measured: off-diag cosine 0.8624 vs diag 0.8625 at init),
    # so pure InfoNCE has no batch-negative signal and collapses to the
    # uniform solution (loss pinned at log B). The dense pretext that works
    # is RENDERING INVERSION: each image is a deterministic rendering of
    # its ~25-30 sensor values, and predicting the standardized row from
    # the embedding forces the tower to extract exactly the discriminative
    # content the downstream classifier needs. InfoNCE stays as a small
    # auxiliary aligning the two modalities' embedding spaces.
    inversion_weight: float = 1.0
    infonce_weight: float = 0.1


def clip_loss(z_a, z_b, logit_scale):
    """Symmetric InfoNCE over the in-batch similarity matrix."""
    z_a = z_a / jnp.linalg.norm(z_a, axis=-1, keepdims=True)
    z_b = z_b / jnp.linalg.norm(z_b, axis=-1, keepdims=True)
    logits = z_a @ z_b.T * jnp.exp(logit_scale)  # (B, B)
    labels = jnp.arange(z_a.shape[0])
    loss_a = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_b = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (loss_a.mean() + loss_b.mean())


class ContrastivePretrainer:
    """One shared ViT tower over both modalities' rendered images."""

    def __init__(self, vit_cfg: vit_mod.ViTConfig = vit_mod.ViTConfig(),
                 cfg: ContrastiveConfig = ContrastiveConfig(),
                 eeg_dim: int = 30, act_dim: int = 25):
        self.vit_cfg = vit_cfg
        self.cfg = cfg
        key = jax.random.PRNGKey(cfg.seed)
        k_vit, k_he, k_ha = jax.random.split(key, 3)
        D = vit_cfg.output_dim
        s = D ** -0.5
        self.params = {
            "vit": vit_mod.init(k_vit, vit_cfg),
            "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
            # rendering-inversion heads (one per modality, shared tower)
            "head_eeg": {
                "kernel": s * jax.random.normal(k_he, (D, eeg_dim)),
                "bias": jnp.zeros((eeg_dim,)),
            },
            "head_act": {
                "kernel": s * jax.random.normal(k_ha, (D, act_dim)),
                "bias": jnp.zeros((act_dim,)),
            },
        }
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.total_steps
        )
        self.opt = optax.adamw(schedule, weight_decay=cfg.weight_decay,
                               mask=lambda p: jax.tree_util.tree_map(
                                   lambda x: x.ndim >= 2, p))
        self.opt_state = self.opt.init(self.params)

    def _loss_fn(self, params, eeg_rows, act_rows, eeg_targets, act_targets):
        """eeg/act_rows render the images; *_targets are the standardized
        rows the inversion heads must recover."""
        cfg = self.cfg
        compute = jnp.dtype(cfg.compute_dtype)
        vit_p = params["vit"]
        if compute != jnp.float32:
            vit_p = tree_cast(vit_p, compute)
        eeg_imgs = jax.vmap(image_transform.eeg_row_to_image)(eeg_rows)
        act_imgs = jax.vmap(image_transform.act_row_to_image)(act_rows)
        z_e = vit_mod.encode_image(
            vit_p, eeg_imgs.astype(compute), self.vit_cfg
        ).astype(jnp.float32)
        z_a = vit_mod.encode_image(
            vit_p, act_imgs.astype(compute), self.vit_cfg
        ).astype(jnp.float32)
        pred_e = z_e @ params["head_eeg"]["kernel"] + params["head_eeg"]["bias"]
        pred_a = z_a @ params["head_act"]["kernel"] + params["head_act"]["bias"]
        invert = (
            jnp.mean((pred_e - eeg_targets) ** 2)
            + jnp.mean((pred_a - act_targets) ** 2)
        )
        scale = jnp.minimum(params["logit_scale"], cfg.max_logit_scale)
        nce = clip_loss(z_e, z_a, scale)
        return cfg.inversion_weight * invert + cfg.infonce_weight * nce

    def fit(self, eeg_rows: np.ndarray, act_rows: np.ndarray,
            echo: bool = True):
        """eeg_rows (N, C_eeg), act_rows (N, 25) — raw processed-CSV rows."""
        cfg = self.cfg
        n = eeg_rows.shape[0]
        eeg_dev = jnp.asarray(eeg_rows, jnp.float32)
        act_dev = jnp.asarray(act_rows, jnp.float32)

        def standardize(x):
            mu = x.mean(axis=0, keepdims=True)
            sd = jnp.maximum(x.std(axis=0, keepdims=True), 1e-6)
            return (x - mu) / sd

        eeg_t = standardize(eeg_dev)
        act_t = standardize(act_dev)

        def chunk(params, opt_state, key, n_steps):
            def step(carry, k):
                params, opt_state = carry
                idx = jax.random.randint(k, (cfg.batch_size,), 0, n)
                loss, g = jax.value_and_grad(self._loss_fn)(
                    params, eeg_dev[idx], act_dev[idx], eeg_t[idx], act_t[idx]
                )
                upd, opt_state = self.opt.update(g, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state), loss

            keys = jax.random.split(key, n_steps)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys
            )
            return params, opt_state, losses

        chunk_jit = jax.jit(chunk, static_argnums=(3,), donate_argnums=(0, 1))
        key = jax.random.PRNGKey(cfg.seed + 1)
        params, opt_state = self.params, self.opt_state
        history = []
        t0 = time.time()
        done = 0
        while done < cfg.total_steps:
            k, key = jax.random.split(key)
            m = min(cfg.log_every, cfg.total_steps - done)
            params, opt_state, losses = chunk_jit(params, opt_state, k, m)
            done += m
            loss = float(np.asarray(losses)[-1])
            history.append({"step": done, "loss": loss})
            if echo:
                print(f"[clip] step {done}/{cfg.total_steps} loss {loss:.4f} "
                      f"({time.time() - t0:.1f}s)", flush=True)
        self.params, self.opt_state = params, opt_state
        return params["vit"], history
