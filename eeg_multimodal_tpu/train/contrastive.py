"""Cross-modal contrastive pretraining of the CLIP visual tower — the image
analogue of MLM pretraining (train/mlm.py) for the zero-egress setting.

Why this exists: the reference's image features come from *pretrained*
OpenAI CLIP (`clip.load(coef)`, ref get_embedding.py:62-71); its committed
ii-pairing number (0.827, logs/compare_modal/ii/best_record.txt) rests
entirely on those weights, which cannot be downloaded here. The corpus
offers a natural self-supervised substitute: each training sample renders
BOTH an EEG image and an action image of the same moment
(get_embedding.py:18-48), so the same-sample pair is a positive for a
CLIP-style InfoNCE objective — one shared tower (the reference also encodes
both modalities with one CLIP model), symmetric cross-entropy over the
in-batch similarity matrix, learned temperature (Radford et al. 2021).

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
                 cfg: ContrastiveConfig = ContrastiveConfig()):
        self.vit_cfg = vit_cfg
        self.cfg = cfg
        key = jax.random.PRNGKey(cfg.seed)
        self.params = {
            "vit": vit_mod.init(key, vit_cfg),
            "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
        }
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, cfg.total_steps
        )
        self.opt = optax.adamw(schedule, weight_decay=cfg.weight_decay,
                               mask=lambda p: jax.tree_util.tree_map(
                                   lambda x: x.ndim >= 2, p))
        self.opt_state = self.opt.init(self.params)

    def _loss_fn(self, params, eeg_rows, act_rows):
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
        scale = jnp.minimum(params["logit_scale"], cfg.max_logit_scale)
        return clip_loss(z_e, z_a, scale)

    def fit(self, eeg_rows: np.ndarray, act_rows: np.ndarray,
            echo: bool = True):
        """eeg_rows (N, C_eeg), act_rows (N, 25) — raw processed-CSV rows."""
        cfg = self.cfg
        n = eeg_rows.shape[0]
        eeg_dev = jnp.asarray(eeg_rows, jnp.float32)
        act_dev = jnp.asarray(act_rows, jnp.float32)

        def chunk(params, opt_state, key, n_steps):
            def step(carry, k):
                params, opt_state = carry
                idx = jax.random.randint(k, (cfg.batch_size,), 0, n)
                loss, g = jax.value_and_grad(self._loss_fn)(
                    params, eeg_dev[idx], act_dev[idx]
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
