"""Golden-value tests of the transformer primitives against torch CPU.

These pin our layers to the exact semantics the reference model zoo relies on
(nn.MultiheadAttention / nn.TransformerDecoder / nn.TransformerEncoder with
post-LN, ReLU FFN 2048, key-padding masks — ref models.py:44-45,235-236).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.models import layers as L
from torch_ref import (
    j2t,
    t2j,
    linear_params_from_torch,
    ln_params_from_torch,
    mha_params_from_torch,
    decoder_params_from_torch,
    encoder_params_from_torch,
)

torch = pytest.importorskip("torch")

RTOL, ATOL = 1e-4, 1e-5


def rand(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


def test_linear_matches_torch():
    x = rand(4, 16)
    mod = torch.nn.Linear(16, 8)
    out_t = mod(j2t(x)).detach().numpy()
    out_j = L.linear(linear_params_from_torch(mod), jnp.asarray(x))
    np.testing.assert_allclose(out_j, out_t, rtol=RTOL, atol=ATOL)


def test_layer_norm_matches_torch():
    x = rand(4, 16, seed=1)
    mod = torch.nn.LayerNorm(16)
    with torch.no_grad():
        mod.weight.mul_(1.7)
        mod.bias.add_(0.3)
    out_t = mod(j2t(x)).detach().numpy()
    out_j = L.layer_norm(ln_params_from_torch(mod), jnp.asarray(x))
    np.testing.assert_allclose(out_j, out_t, rtol=RTOL, atol=ATOL)


def test_mha_matches_torch_with_key_padding_mask():
    E, H, B, Sq, Sk = 32, 4, 3, 5, 7
    q, kv = rand(B, Sq, E, seed=2), rand(B, Sk, E, seed=3)
    kpm = np.zeros((B, Sk), dtype=bool)
    kpm[0, 4:] = True
    kpm[2, 1:3] = True
    mod = torch.nn.MultiheadAttention(E, H, batch_first=True)
    mod.eval()
    out_t = mod(
        j2t(q), j2t(kv), j2t(kv),
        key_padding_mask=j2t(kpm.astype(np.bool_)),
        need_weights=False,
    )[0].detach().numpy()
    out_j = L.multi_head_attention(
        mha_params_from_torch(mod), jnp.asarray(q), jnp.asarray(kv), H,
        key_padding_mask=jnp.asarray(kpm),
    )
    np.testing.assert_allclose(out_j, out_t, rtol=RTOL, atol=ATOL)


def test_decoder_stack_matches_torch():
    """3-layer TransformerDecoder, the reference cross-attention block
    (models.py:44-45,64-67), incl. both key-padding masks, eval mode."""
    E, H, B, St, Sm = 768, 12, 2, 1, 16
    tgt, mem = rand(B, St, E, seed=4), rand(B, Sm, E, seed=5)
    tgt_kpm = np.zeros((B, St), dtype=bool)
    mem_kpm = np.zeros((B, Sm), dtype=bool)
    mem_kpm[0, 10:] = True
    layer = torch.nn.TransformerDecoderLayer(d_model=E, nhead=H)
    mod = torch.nn.TransformerDecoder(layer, num_layers=3)
    mod.eval()
    # torch default is seq-first: permute like the reference (models.py:64-68)
    out_t = mod(
        tgt=j2t(tgt).permute(1, 0, 2),
        memory=j2t(mem).permute(1, 0, 2),
        tgt_key_padding_mask=j2t(tgt_kpm),
        memory_key_padding_mask=j2t(mem_kpm),
    ).permute(1, 0, 2).detach().numpy()
    out_j = L.decoder(
        decoder_params_from_torch(mod), jnp.asarray(tgt), jnp.asarray(mem), H,
        tgt_key_padding_mask=jnp.asarray(tgt_kpm),
        memory_key_padding_mask=jnp.asarray(mem_kpm),
    )
    np.testing.assert_allclose(out_j, out_t, rtol=1e-3, atol=1e-4)


def test_encoder_stack_matches_torch():
    """3-layer TransformerEncoder, the TISC single-stream block
    (models.py:235-236,255-258), eval mode."""
    E, H, B, S = 768, 12, 2, 2
    src = rand(B, S, E, seed=6)
    layer = torch.nn.TransformerEncoderLayer(d_model=E, nhead=H)
    mod = torch.nn.TransformerEncoder(layer, num_layers=3)
    mod.eval()
    out_t = (
        mod(j2t(src).permute(1, 0, 2)).permute(1, 0, 2).detach().numpy()
    )
    out_j = L.encoder(encoder_params_from_torch(mod), jnp.asarray(src), H)
    np.testing.assert_allclose(out_j, out_t, rtol=1e-3, atol=1e-4)


def test_decoder_identical_layer_init():
    """torch TransformerDecoder deep-copies one layer: all layers start
    identical (models.py:45 semantics)."""
    params = L.decoder_init(jax.random.PRNGKey(0), 64, 3)
    l0, l1 = params["layers"][0], params["layers"][2]
    for a, b in zip(jax.tree_util.tree_leaves(l0), jax.tree_util.tree_leaves(l1)):
        np.testing.assert_array_equal(a, b)


def test_dropout_train_vs_eval():
    x = jnp.ones((100, 100))
    out_eval = L.dropout(x, 0.5, None)
    np.testing.assert_array_equal(out_eval, x)
    out_train = L.dropout(x, 0.5, jax.random.PRNGKey(0))
    # inverted dropout: surviving entries scaled by 1/keep
    vals = np.unique(np.asarray(out_train))
    assert set(np.round(vals, 5)).issubset({0.0, 2.0})
    assert abs(float(out_train.mean()) - 1.0) < 0.05
