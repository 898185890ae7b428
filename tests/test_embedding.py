"""Tests for the embedding pipeline: sensor->image transforms (vs torch
replicas of the reference ops), CLIP ViT (vs a torch replica), ResNet-34
blocks (vs torch conv/bn), and the GetEmbedding facade end-to-end."""
import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.data import image_transform as IT
from eeg_multimodal_tpu.data.embedding import GetEmbedding
from eeg_multimodal_tpu.models import resnet as R
from eeg_multimodal_tpu.models import vit as V

torch = pytest.importorskip("torch")


def test_act_to_image_matches_torch_reference_ops():
    """ref get_embedding.py:26-31: reshape(3,3,3).permute(2,0,1), Upsample
    x74 nearest, ZeroPad2d(1)."""
    rng = np.random.RandomState(0)
    row = rng.randn(25).astype(np.float32)
    row_ext = np.concatenate([row, [row[-1]] * 2])
    t = torch.from_numpy(row_ext).reshape(3, 3, 3).permute(2, 0, 1).unsqueeze(0)
    up = torch.nn.Upsample(scale_factor=74, mode="nearest")
    pad = torch.nn.ZeroPad2d((1, 1, 1, 1))
    expected = pad(up(t)).squeeze(0).numpy()
    out = np.asarray(IT.act_row_to_image(jnp.asarray(row)))
    assert out.shape == (3, 224, 224)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_eeg_to_image_matches_scipy_interp():
    from scipy.interpolate import interp1d

    rng = np.random.RandomState(1)
    row = rng.randn(30).astype(np.float64)
    norm = (row - row.min()) / (row.max() - row.min())
    interp = interp1d(np.linspace(0, 1, 30), norm, kind="linear")
    expected = np.stack([interp(np.linspace(0, 1, 224 * 224)).reshape(224, 224)] * 3)
    out = np.asarray(IT.eeg_row_to_image(jnp.asarray(row, jnp.float32)))
    assert out.shape == (3, 224, 224)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


class TorchCLIPBlock(torch.nn.Module):
    """CLIP ResidualAttentionBlock replica (pre-LN, QuickGELU)."""

    def __init__(self, w, heads):
        super().__init__()
        self.ln_1 = torch.nn.LayerNorm(w)
        self.attn = torch.nn.MultiheadAttention(w, heads, batch_first=True)
        self.ln_2 = torch.nn.LayerNorm(w)
        self.c_fc = torch.nn.Linear(w, 4 * w)
        self.c_proj = torch.nn.Linear(4 * w, w)

    def forward(self, x):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        y = self.ln_2(x)
        h = self.c_fc(y)
        h = h * torch.sigmoid(1.702 * h)
        return x + self.c_proj(h)


def test_vit_block_matches_torch_clip_block():
    torch.manual_seed(0)
    W, H = 64, 4
    blk = TorchCLIPBlock(W, H)
    blk.eval()
    x = np.random.RandomState(2).randn(2, 9, W).astype(np.float32)
    with torch.no_grad():
        out_t = blk(torch.from_numpy(x)).numpy()

    p = {
        "ln_1": {"scale": jnp.asarray(blk.ln_1.weight.detach().numpy()),
                 "bias": jnp.asarray(blk.ln_1.bias.detach().numpy())},
        "attn": {
            "in_proj_kernel": jnp.asarray(blk.attn.in_proj_weight.detach().numpy()).T,
            "in_proj_bias": jnp.asarray(blk.attn.in_proj_bias.detach().numpy()),
            "out_proj": {
                "kernel": jnp.asarray(blk.attn.out_proj.weight.detach().numpy()).T,
                "bias": jnp.asarray(blk.attn.out_proj.bias.detach().numpy()),
            },
        },
        "ln_2": {"scale": jnp.asarray(blk.ln_2.weight.detach().numpy()),
                 "bias": jnp.asarray(blk.ln_2.bias.detach().numpy())},
        "mlp": {
            "c_fc": {"kernel": jnp.asarray(blk.c_fc.weight.detach().numpy()).T,
                     "bias": jnp.asarray(blk.c_fc.bias.detach().numpy())},
            "c_proj": {"kernel": jnp.asarray(blk.c_proj.weight.detach().numpy()).T,
                       "bias": jnp.asarray(blk.c_proj.bias.detach().numpy())},
        },
    }
    xj = jnp.asarray(x)
    out_j = xj + V._attn(p["attn"], V._ln(p["ln_1"], xj), H)
    h = V.quick_gelu(V.linear(p["mlp"]["c_fc"], V._ln(p["ln_2"], out_j)))
    out_j = out_j + V.linear(p["mlp"]["c_proj"], h)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-3, atol=1e-4)


def test_vit_encode_image_shapes():
    for patch, coef in ((32, "ViT-B/32"), (16, "ViT-B/16")):
        cfg = V.ViTConfig.for_coef(coef)
        assert cfg.patch_size == patch
    cfg = V.ViTConfig(patch_size=32, width=64, layers=2, heads=4, output_dim=16)
    params = V.init(jax.random.PRNGKey(0), cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 3, 224, 224), jnp.float32)
    out = V.encode_image(params, imgs, cfg)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_basic_block_matches_torch():
    torch.manual_seed(0)
    conv1 = torch.nn.Conv2d(8, 16, 3, stride=2, padding=1, bias=False)
    bn1 = torch.nn.BatchNorm2d(16)
    conv2 = torch.nn.Conv2d(16, 16, 3, stride=1, padding=1, bias=False)
    bn2 = torch.nn.BatchNorm2d(16)
    down_conv = torch.nn.Conv2d(8, 16, 1, stride=2, bias=False)
    down_bn = torch.nn.BatchNorm2d(16)
    for bn in (bn1, bn2, down_bn):
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.eval()
    x = np.random.RandomState(3).randn(2, 8, 16, 16).astype(np.float32)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        out = torch.relu(bn1(conv1(xt)))
        out = bn2(conv2(out))
        identity = down_bn(down_conv(xt))
        expected = torch.relu(out + identity).numpy()

    def j(t):
        return jnp.asarray(t.detach().numpy())

    block = {
        "conv1": j(conv1.weight), "conv2": j(conv2.weight),
        "bn1": {"scale": j(bn1.weight), "bias": j(bn1.bias),
                "mean": j(bn1.running_mean), "var": j(bn1.running_var)},
        "bn2": {"scale": j(bn2.weight), "bias": j(bn2.bias),
                "mean": j(bn2.running_mean), "var": j(bn2.running_var)},
        "downsample": {
            "conv": j(down_conv.weight),
            "bn": {"scale": j(down_bn.weight), "bias": j(down_bn.bias),
                   "mean": j(down_bn.running_mean), "var": j(down_bn.running_var)},
        },
    }
    out_j = R._basic_block(block, jnp.asarray(x), stride=2)
    np.testing.assert_allclose(np.asarray(out_j), expected, rtol=1e-3, atol=1e-4)


def test_resnet34_features_shape():
    params = R.init(jax.random.PRNGKey(0))
    imgs = jnp.asarray(np.random.RandomState(0).randn(2, 3, 224, 224), jnp.float32)
    out = R.features(params, imgs)
    assert out.shape == (2, 512)
    assert np.isfinite(np.asarray(out)).all()


def test_get_embedding_end_to_end(tmp_path):
    """Facade writes the reference's on-disk layout from processed CSVs."""
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "data" / "processed", exist_ok=True)
    for split, n in (("train", 6), ("test", 4)):
        for modal, c in (("EEG", 30), ("act", 25)):
            path = tmp_path / "data" / "processed" / f"{split}_{modal}.csv"
            with open(path, "w") as f:
                f.write(",".join(f"c{i}" for i in range(c)) + "\n")
                for row in rng.randint(-50, 50, size=(n, c)):
                    f.write(",".join(str(v) for v in row) + "\n")

    job = GetEmbedding(["act"], ["train", "test"], data_root=str(tmp_path))
    # small ViT via monkeypatched config for speed
    import eeg_multimodal_tpu.models.vit as vit_mod

    small = V.ViTConfig(patch_size=32, width=64, layers=1, heads=4)
    orig = vit_mod.ViTConfig.for_coef
    vit_mod.ViTConfig.for_coef = staticmethod(lambda coef: small)
    try:
        job.run([["clip", "ViT-B/32"]], [["bert", "bert-base-uncased"]])
    finally:
        vit_mod.ViTConfig.for_coef = staticmethod(orig)

    img = pickle.load(open(
        tmp_path / "data" / "embedding" / "act" / "img" / "clip_ViT_B_32" / "train.pickle", "rb"
    ))
    assert img.shape == (6, 512) and img.dtype == np.float32
    txt = pickle.load(open(
        tmp_path / "data" / "embedding" / "act" / "txt" / "bert_bert_base_uncased" / "test.pickle", "rb"
    ))
    assert len(txt) == 4
    assert txt[0]["input_ids"].shape == (512,)
    assert txt[0]["attention_mask"].sum() > 0
