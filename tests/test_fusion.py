"""End-to-end fusion-model parity vs a torch replica of the reference.

Builds the reference's TICA_NonPrivate (models.py:309-352) in torch with a
small BERT (d_model stays 768), loads its state dict through our checkpoint
adapter, and checks logits parity in eval mode (NonPrivate is the
deterministic trunk — the stochastic DP block is golden-tested separately in
test_dp_ops.py). Also exercises init/apply shapes for every model class and
the state-dict round trip.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.models import bert as B
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train import checkpoint as ckpt

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SMALL_BERT = B.BertConfig(
    vocab_size=120, hidden_size=768, num_layers=1, num_heads=12,
    intermediate_size=128, max_position_embeddings=32,
)


def small_hf_config():
    return transformers.BertConfig(
        vocab_size=120, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=128,
        max_position_embeddings=32, type_vocab_size=2,
    )


class TorchTICANonPrivate(torch.nn.Module):
    """Replica of models.py:309-352 (attribute names match the reference's
    state-dict keys so our adapter round-trips against it)."""

    def __init__(self, hf_cfg):
        super().__init__()
        self.bert = transformers.BertModel(hf_cfg)
        self.visual_encoder = torch.nn.Linear(512, 768)
        self.multi_head_decoderlayer = torch.nn.TransformerDecoderLayer(
            d_model=768, nhead=12
        )
        self.multi_head_decoder = torch.nn.TransformerDecoder(
            self.multi_head_decoderlayer, num_layers=3
        )
        self.fc_layers = torch.nn.Sequential(
            torch.nn.Linear(3 * 768, 3 * 768),
            torch.nn.ReLU(),
            torch.nn.Linear(3 * 768, 768),
            torch.nn.Tanh(),
        )
        self.classifier = torch.nn.Linear(768, 2)

    def forward(self, eeg_input, eeg_mask, act_input, act_mask):
        seq, pooled = self.bert(
            input_ids=eeg_input, attention_mask=eeg_mask, return_dict=False
        )
        emb = self.visual_encoder(act_input)
        img_feat = emb.squeeze(1)
        cross = self.multi_head_decoder(
            tgt=emb.permute(1, 0, 2),
            memory=seq.permute(1, 0, 2),
            tgt_key_padding_mask=act_mask == 0,
            memory_key_padding_mask=eeg_mask == 0,
        ).permute(1, 0, 2).mean(dim=1)
        feat = torch.cat((pooled, img_feat, cross), dim=1)
        fmin = torch.min(feat, dim=-1, keepdims=True)[0]
        fmax = torch.max(feat, dim=-1, keepdims=True)[0]
        feat = (feat - fmin) / (fmax - fmin)
        return self.classifier(self.fc_layers(feat))


def make_batch(rng, batch=2, seq=16):
    ids = rng.randint(0, 120, size=(batch, seq))
    mask = np.ones((batch, seq), dtype=np.int64)
    mask[0, 10:] = 0
    act = rng.randn(batch, 1, 512).astype(np.float32)
    act_mask = np.ones((batch, 1), dtype=np.int64)
    return ids, mask, act, act_mask


def test_tica_nonprivate_matches_torch_replica():
    torch.manual_seed(0)
    model = TorchTICANonPrivate(small_hf_config())
    model.eval()
    rng = np.random.RandomState(0)
    ids, mask, act, act_mask = make_batch(rng)
    with torch.no_grad():
        out_t = model(
            torch.from_numpy(ids), torch.from_numpy(mask),
            torch.from_numpy(act), torch.from_numpy(act_mask),
        ).numpy()

    import dataclasses
    cfg = dataclasses.replace(fusion.config_for("ti", "NDP"), bert_config=SMALL_BERT)
    params = ckpt.fusion_from_torch_state_dict(model.state_dict(), cfg)
    # override bert load: adapter expects base config; reload with small one
    params["bert"] = B.from_torch_state_dict(
        model.state_dict(), SMALL_BERT, prefix="bert."
    )
    batch = {
        "eeg_input": jnp.asarray(ids),
        "eeg_mask": jnp.asarray(mask),
        "act_input": jnp.asarray(act),
        "act_mask": jnp.asarray(act_mask),
    }
    out_j = fusion.apply(params, batch, cfg, epsilon=0.1, hard=True, rng=None, train=False)
    np.testing.assert_allclose(np.asarray(out_j), out_t, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "mt,dp_mode,cross",
    [
        ("ti", "lapacian_dropout", "double_stream"),
        ("tt", "lapacian_dropout", "double_stream"),
        ("it", "lapacian_dropout", "double_stream"),
        ("ii", "lapacian_dropout", "double_stream"),
        ("ti", "lapacian_dropout", "single_stream"),
        ("ti", "DPSGD", "double_stream"),
        ("ti", "NDP", "double_stream"),
        ("ti", "lapacian_dropout_equal_weight", "double_stream"),
        ("ti", "feature_all_lap", "double_stream"),
    ],
)
def test_all_model_classes_forward_and_grad(mt, dp_mode, cross):
    cfg = fusion.config_for(mt, dp_mode, cross)
    cfg = fusion.FusionConfig(**{**cfg.__dict__, "bert_config": SMALL_BERT})
    key = jax.random.PRNGKey(0)
    params = fusion.init(key, cfg)
    rng = np.random.RandomState(1)
    B_, S = 2, 16
    ids = rng.randint(0, 120, size=(B_, S))
    tokmask = np.ones((B_, S), dtype=np.int32)
    emb = rng.randn(B_, 1, 512).astype(np.float32)
    embmask = np.ones((B_, 1), dtype=np.int32)

    def stream(kind):
        if kind == "t":
            return jnp.asarray(ids), jnp.asarray(tokmask)
        return jnp.asarray(emb), jnp.asarray(embmask)

    ei, em = stream(mt[0])
    ai, am = stream(mt[1])
    batch = {"eeg_input": ei, "eeg_mask": em, "act_input": ai, "act_mask": am,
             "labels": jnp.asarray(rng.randint(0, 2, B_))}

    out = fusion.apply(params, batch, cfg, 0.5, hard=True,
                       rng=jax.random.PRNGKey(2), train=True)
    assert out.shape == (B_, 2)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        logits = fusion.apply(p, batch, cfg, 0.5, True, jax.random.PRNGKey(2), True)
        return jnp.mean(logits ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_fusion_state_dict_round_trip_strict_torch_load():
    """Our exported state dict loads strict=True into the torch replica.

    Every key we emit must be accepted (no unexpected), every *parameter*
    must be covered (anything missing may only be a torch-side registered
    buffer like position_ids, never a trainable weight), and after filling
    those buffers from the module's own defaults a genuinely strict load
    must succeed."""
    cfg = fusion.config_for("ti", "NDP")
    cfg = fusion.FusionConfig(**{**cfg.__dict__, "bert_config": SMALL_BERT})
    params = fusion.init(jax.random.PRNGKey(0), cfg)
    sd = ckpt.fusion_to_torch_state_dict(params, cfg)
    model = TorchTICANonPrivate(small_hf_config())
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    missing, unexpected = model.load_state_dict(tensors, strict=False)
    assert unexpected == []
    buffers = {name for name, _ in model.named_buffers()}
    assert set(missing) <= buffers, f"missing non-buffer keys: {set(missing) - buffers}"
    # strict load with the torch-only buffers taken from the module defaults
    full = dict(tensors)
    own = model.state_dict()
    for m in missing:
        full[m] = own[m]
    model.load_state_dict(full, strict=True)


def test_opacus_prefix_normalization():
    sd = {"_module.classifier.weight": np.zeros((2, 768)),
          "module.DP": np.zeros((1, 2304))}
    out = ckpt.normalize_torch_keys(sd)
    assert set(out) == {"classifier.weight", "DP"}
