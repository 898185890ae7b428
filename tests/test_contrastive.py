"""Rendering-inversion (+ auxiliary InfoNCE) pretraining of the visual tower."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.models import vit as vit_mod
from eeg_multimodal_tpu.train import contrastive as C

TINY_VIT = vit_mod.ViTConfig(patch_size=56, width=32, layers=2, heads=4,
                             image_size=224, output_dim=16)


def rows(n=16, seed=0):
    rng = np.random.RandomState(seed)
    # correlated pair: act rows are a projection of the EEG rows, so the
    # cross-modal objective has real signal to find
    eeg = rng.randn(n, 30).astype(np.float32)
    act = (eeg[:, :25] * 2.0 + 0.1 * rng.randn(n, 25)).astype(np.float32)
    return eeg, act


def test_clip_loss_identity_alignment():
    """Perfectly aligned embeddings at high temperature give near-zero loss;
    random ones sit near log(B)."""
    z = np.eye(8, 16, dtype=np.float32)
    aligned = float(C.clip_loss(jnp.asarray(z), jnp.asarray(z), jnp.asarray(10.0)))
    rng = np.random.RandomState(0)
    za, zb = rng.randn(8, 16).astype(np.float32), rng.randn(8, 16).astype(np.float32)
    rand = float(C.clip_loss(jnp.asarray(za), jnp.asarray(zb), jnp.asarray(0.0)))
    assert aligned < 1e-3
    assert abs(rand - np.log(8)) < 0.5


def test_contrastive_loss_decreases():
    eeg, act = rows(32)
    cfg = C.ContrastiveConfig(batch_size=8, total_steps=60, warmup_steps=3,
                              learning_rate=1e-3, log_every=10,
                              compute_dtype="float32")
    pre = C.ContrastivePretrainer(TINY_VIT, cfg)
    vit_params, hist = pre.fit(eeg, act, echo=False)
    # loss = inversion MSE (~2x target variance at init) + 0.1*InfoNCE
    assert hist[-1]["loss"] < hist[0]["loss"] - 0.1
    # trained tower encodes to the configured dim
    imgs = jax.vmap(lambda r: jnp.stack([jnp.zeros((224, 224))] * 3))(jnp.zeros((2, 1)))
    z = vit_mod.encode_image(vit_params, imgs.astype(jnp.float32), TINY_VIT)
    assert z.shape == (2, 16)
    assert np.isfinite(np.asarray(z)).all()


def test_embedding_accepts_pytree_clip_weights(tmp_path):
    """GetEmbedding loads a saved JAX pytree tower (pretrained here) as
    clip_weights, alongside the torch-state-dict path."""
    import pickle

    from eeg_multimodal_tpu.data.embedding import GetEmbedding

    params = vit_mod.init(jax.random.PRNGKey(0), vit_mod.ViTConfig())
    p = tmp_path / "vit.pickle"
    with open(p, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, params), f)
    job = GetEmbedding(["act"], ["test"], data_root=str(tmp_path),
                       clip_weights=str(p))
    enc = job._get_image_encoder("clip", "ViT-B/32")
    out = enc(jnp.zeros((2, 3, 224, 224), jnp.float32))
    assert out.shape == (2, 512)
