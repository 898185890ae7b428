"""The fusion model zoo: every model class from the reference, TPU-first.

Reference inventory (python/src/custom_models/models.py):
  TICA_LapDropout   :28   (flagship: txt+img, cross-attn, learned DP block)
  TTCA_LapDropout   :84   (txt+txt, BERT twice, no key-padding masks)
  ITCA_LapDropout   :130  (img+txt)
  IICA_LapDropout   :177  (img+img, shared visual encoder, no BERT)
  TISC_LapDropout   :220  (single-stream: TransformerEncoder over concat)
  TICA_DPSGD        :274  (2-modal concat, no cross-attn; trained under DP-SGD)
  TICA_NonPrivate   :309  (flagship minus DP block)
  TISC_LapDropoutEquWeight :354 (double-stream + equal-weight DP ablation)
Legacy heads (root scripts): ConcatModel (model.py:14-64, plain concat),
PriConcat (main_0425.py ConcatModel: per-sample Laplace on fused features),
PriGumbel (train_val.py:125-158: learned w + scaled Gumbel dropout + Laplace).

All share one double-stream trunk (BERT / visual-encoder streams + a 3-layer
cross-attention transformer decoder), expressed here as a single configurable
pure function instead of eight copy-pasted classes. Params are pytrees whose
layout mirrors the torch module names for state-dict round-tripping
(see train/checkpoint.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from . import bert as bert_mod
from . import layers as L
from ..ops import dp as dp_ops

D_MODEL = 768
N_HEADS = 12  # ref: models.py:44 nhead=12
N_CROSS_LAYERS = 3  # ref: models.py:45 num_layers=3
VISUAL_IN = 512  # ref: models.py:42 nn.Linear(512, 768)
N_CLASSES = 2


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Static architecture switches distinguishing the reference's classes."""

    name: str = "TICA_LapDropout"
    multimodal_type: str = "ti"  # "ti" | "tt" | "it" | "ii"
    cross_atn_type: str = "double_stream"  # or "single_stream" (TISC)
    dp_mode: str = "lapacian_dropout"
    # "lapacian_dropout" | "NDP" | "DPSGD" | "lapacian_dropout_equal_weight"
    # | "feature_all_lap" (PriConcat) | "pri_gumbel" (legacy train_val head)
    with_cross_attention: bool = True  # False for TICA_DPSGD
    use_key_padding_masks: bool = True  # False for tt / ii (models.py:112-113)
    dropout_rate: float = 0.5  # equal-weight ablation (base_train.py:137)
    gumbel_tau: float = 0.1  # PriGumbel (train_val.py:95)
    bert_coef: str = "bert-base-uncased"
    dtype: str = "float32"  # params/compute dtype ("bfloat16" on TPU hot path)
    # Optional BertConfig override (must keep hidden_size=768); used for
    # small-model tests and from-scratch encoders.
    bert_config: Optional["bert_mod.BertConfig"] = None
    # Legacy 'new_<eps>eps' generation: use the PRE-fix noise scale
    # log((e^eps - w)/(1 - w)) (model.py:57, no reciprocal) instead of the
    # '# fix' form 1/log(...) (past_acc.py:132). Noise grows with eps,
    # reproducing the model_dict/new_*eps family's falling accuracies.
    prefix_eps_hat: bool = False
    # Route the DP block through the fused Pallas kernel (ops/dp_pallas.py):
    # one VMEM pass for minmax + eps_hat + in-kernel Laplace sampling.
    # Mathematically equal to the composed ops (the Gumbel stage is an
    # identity; tests/test_dp_pallas.py pins value/grad equality and the
    # Laplace-stream quantiles). Round 2 reported a "scanned dual-instance
    # NaN miscompile"; round 3 root-caused it as a kernel PRNG edge case —
    # a 2^-24-per-element zero draw sent the Laplace inverse CDF to
    # log1p(-1) = -inf (tools/repro_fused_dp_scan_nan.py pins the
    # deterministic repro and dp_pallas._laplace_from_bits documents the
    # fix). The kernel is now validated over full 50-epoch flagship runs
    # on the chip (examples/train_demo.py --fused_dp, finite and
    # accuracy-comparable). Default remains OFF for reproducibility of the
    # committed accuracy logs (the in-kernel PRNG is a different noise
    # stream than the faithful threefry path) and because at the flagship
    # (8, 2304) shape the op is bandwidth-trivial — measured steady-state
    # epoch time is identical either way.
    fused_dp_kernel: Optional[bool] = None

    def __post_init__(self):
        # the fused kernel hardcodes the post-fix 1/log(...) eps_hat
        # (ops/dp_pallas.py); silently combining it with the legacy pre-fix
        # noise law would train under the wrong noise scale.
        if self.prefix_eps_hat and self.fused_dp_kernel:
            raise ValueError(
                "fused_dp_kernel only implements the post-fix eps_hat "
                "(1/log form); prefix_eps_hat=True requires the composed-op "
                "path (fused_dp_kernel=False)."
            )

    @property
    def use_fused_dp(self) -> bool:
        return bool(self.fused_dp_kernel)

    def bert_cfg(self):
        return self.bert_config or bert_mod.BertConfig.for_coef(self.bert_coef)

    @property
    def n_streams_txt(self) -> int:
        return {"ti": 1, "tt": 2, "it": 1, "ii": 0}[self.multimodal_type]

    @property
    def uses_bert(self) -> bool:
        return self.multimodal_type != "ii"

    @property
    def uses_visual(self) -> bool:
        return self.multimodal_type != "tt"

    @property
    def concat_width(self) -> int:
        return (2 if not self.with_cross_attention else 3) * D_MODEL

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


# Named constructors matching base_train.py:127-150's dispatch table.
def config_for(multimodal_type: str, dp_mode: str, cross_atn_type: str = "double_stream",
               bert_coef: str = "bert-base-uncased", dtype: str = "float32") -> FusionConfig:
    """Mirror of the reference's model dispatch (base_train.py:127-150)."""
    masks = multimodal_type in ("ti", "it")
    name = {
        ("ti", "lapacian_dropout", "double_stream"): "TICA_LapDropout",
        ("tt", "lapacian_dropout", "double_stream"): "TTCA_LapDropout",
        ("it", "lapacian_dropout", "double_stream"): "ITCA_LapDropout",
        ("ii", "lapacian_dropout", "double_stream"): "IICA_LapDropout",
        ("ti", "lapacian_dropout", "single_stream"): "TISC_LapDropout",
        ("ti", "DPSGD", "double_stream"): "TICA_DPSGD",
        ("ti", "NDP", "double_stream"): "TICA_NonPrivate",
        ("ti", "lapacian_dropout_equal_weight", "double_stream"): "TISC_LapDropoutEquWeight",
    }.get((multimodal_type, dp_mode, cross_atn_type), "custom")
    return FusionConfig(
        name=name,
        multimodal_type=multimodal_type,
        cross_atn_type=cross_atn_type,
        dp_mode=dp_mode,
        with_cross_attention=(dp_mode != "DPSGD"),
        use_key_padding_masks=masks,
        bert_coef=bert_coef,
        dtype=dtype,
    )


def init(key, config: FusionConfig, bert_params=None):
    """Initialize a fusion model's parameter pytree.

    ``bert_params`` lets callers inject pretrained BERT weights (the
    reference always starts from HF pretrained weights, models.py:40);
    defaults to fresh HF-style init when not provided.
    """
    dtype = config.jnp_dtype
    ks = jax.random.split(key, 8)
    params = {}
    if config.uses_bert:
        # Injected trees may be host numpy (pickle loads, vocab expansion);
        # convert so downstream jits never index a numpy leaf with a tracer.
        params["bert"] = (
            jax.tree_util.tree_map(jnp.asarray, bert_params)
            if bert_params is not None
            else bert_mod.init(ks[0], config.bert_cfg(), dtype)
        )
    if config.uses_visual:
        params["visual_encoder"] = L.linear_init(ks[1], VISUAL_IN, D_MODEL, dtype)
    if config.with_cross_attention:
        if config.cross_atn_type == "single_stream":
            params["cross"] = L.encoder_init(ks[2], D_MODEL, N_CROSS_LAYERS, dtype)
        else:
            params["cross"] = L.decoder_init(ks[2], D_MODEL, N_CROSS_LAYERS, dtype)
    width = config.concat_width
    params["fc1"] = L.linear_init(ks[3], width, width, dtype)
    params["fc2"] = L.linear_init(ks[4], width, D_MODEL, dtype)
    params["classifier"] = L.linear_init(ks[5], D_MODEL, N_CLASSES, dtype)
    if config.dp_mode == "lapacian_dropout":
        # learnable per-feature logits, zeros init (models.py:53)
        params["DP"] = jnp.zeros((1, width), dtype)
    if config.dp_mode == "pri_gumbel":
        # legacy: w = Parameter(rand(768)) applied post-fc (train_val.py:136)
        params["w"] = jax.random.uniform(ks[6], (D_MODEL,), dtype)
    return params


def _encode_streams(params, batch, config: FusionConfig, bert_cfg, keys, train):
    """Run the two modality streams; returns (feat_a, seq_a, feat_b, seq_b).

    Stream order matches the reference's argument order: stream a = eeg,
    stream b = act. 'txt' streams go through BERT (seq + pooled), 'img'
    streams through the shared visual encoder (models.py:59-63,198-201)."""
    mt = config.multimodal_type
    dtype = config.jnp_dtype

    def txt(input_ids, mask, k):
        seq, pooled = bert_mod.apply(
            params["bert"], input_ids, mask, bert_cfg,
            dropout_key=k if train else None,
        )
        return pooled, seq

    def img(x, k):
        emb = L.linear(params["visual_encoder"], x.astype(dtype))  # (B,1,768)
        return emb[:, 0, :] if emb.ndim == 3 else emb, emb

    if mt == "ti":
        feat_a, seq_a = txt(batch["eeg_input"], batch["eeg_mask"], keys[0])
        feat_b, seq_b = img(batch["act_input"], keys[1])
    elif mt == "tt":
        feat_a, seq_a = txt(batch["eeg_input"], batch["eeg_mask"], keys[0])
        feat_b, seq_b = txt(batch["act_input"], batch["act_mask"], keys[1])
    elif mt == "it":
        feat_a, seq_a = img(batch["eeg_input"], keys[0])
        feat_b, seq_b = txt(batch["act_input"], batch["act_mask"], keys[1])
    elif mt == "ii":
        feat_a, seq_a = img(batch["eeg_input"], keys[0])
        feat_b, seq_b = img(batch["act_input"], keys[1])
    else:
        raise ValueError(f"unknown multimodal_type {mt}")
    return feat_a, seq_a, feat_b, seq_b


def split_rng(rng: Optional[jax.Array]):
    """The forward's key layout: 3 encoder-dropout keys + the DP-noise key.
    Exposed so the trainer's shared-feature fast path can reproduce apply()'s
    exact key stream (train/trainer.py)."""
    if rng is None:
        return (None, None, None), None
    k_bert_a, k_bert_b, k_cross, k_dp = jax.random.split(rng, 4)
    return (k_bert_a, k_bert_b, k_cross), k_dp


def encode_features(params, batch, config: FusionConfig, enc_keys, train: bool):
    """Everything upstream of the DP mechanism: both encoder streams, the
    cross-attention block and the fused concat (models.py:56-69), returned
    raw (pre-normalize, f32). Depends only on the encoder/cross params —
    never on the DP parameter — which is what makes the trainer's
    one-encoder-pass-per-step fast path exact (see StepFunctions)."""
    bert_cfg = config.bert_cfg()
    k_bert_a, k_bert_b, k_cross = enc_keys

    feat_a, seq_a, feat_b, seq_b = _encode_streams(
        params, batch, config, bert_cfg, (k_bert_a, k_bert_b), train
    )

    parts = [feat_a, feat_b]
    if config.with_cross_attention:
        if config.cross_atn_type == "single_stream":
            # TISC (models.py:255-258): encoder over [mean(seq_a), emb_b]
            seq_a_mean = jnp.mean(seq_a, axis=1, keepdims=True)
            concat_seq = jnp.concatenate([seq_a_mean, seq_b], axis=1)
            cross = L.encoder(
                params["cross"], concat_seq, N_HEADS,
                dropout_key=k_cross if train else None,
            ).mean(axis=1)
        else:
            # double-stream: decoder(tgt=stream_b emb, memory=stream_a seq)
            # masks per models.py:64-67 (ti/it) or omitted (tt/ii, :112-113)
            tgt_kpm = mem_kpm = None
            if config.multimodal_type in ("ti", "tt"):
                # tgt = act stream, memory = eeg stream (models.py:64-67,112-113)
                tgt, memory = seq_b, seq_a
                if config.use_key_padding_masks:
                    tgt_kpm = batch["act_mask"] == 0  # torch: mask == 0
                    mem_kpm = batch["eeg_mask"] == 0
            else:
                # it/ii: tgt = eeg stream (models.py:157-160,202-203)
                tgt, memory = seq_a, seq_b
                if config.use_key_padding_masks:
                    tgt_kpm = batch["eeg_mask"] == 0
                    mem_kpm = batch["act_mask"] == 0
            cross = L.decoder(
                params["cross"], tgt, memory, N_HEADS,
                tgt_key_padding_mask=tgt_kpm,
                memory_key_padding_mask=mem_kpm,
                dropout_key=k_cross if train else None,
            ).mean(axis=1)
        parts.append(cross)

    # post-concat fusion head stays f32 regardless of compute dtype: the DP
    # noise statistics and min-max normalization are precision-sensitive and
    # the (B, 2304) block is negligible next to the encoders.
    return jnp.concatenate(parts, axis=1).astype(jnp.float32)


def apply_head(
    params,
    feature_raw,  # (B, F) raw fused concat from encode_features, f32
    config: FusionConfig,
    epsilon,
    hard: bool,
    k_dp,
    train: bool,
    return_features: bool = False,
):
    """min-max normalize -> DP mechanism -> fc layers -> classifier
    (models.py:70-82). Split from the encoders so the trainer can run the
    two alternating-optimizer phases over one shared feature computation."""
    feature = dp_ops.minmax_normalize(feature_raw)  # models.py:70-72
    if return_features:
        # truncated forward: the 'feawei' feature-weight extraction path
        # (past_acc_feawei.py:103-124 returns the normalized concat)
        return feature

    mode = config.dp_mode
    if mode == "lapacian_dropout":
        if config.use_fused_dp:
            from ..ops import dp_pallas

            seed = jax.random.randint(k_dp, (1,), 0, 2**31 - 1, jnp.int32)
            feature = dp_pallas.fused_lap_dropout(
                feature_raw, params["DP"].astype(jnp.float32),
                jnp.asarray(epsilon, jnp.float32), seed,
            )
        else:
            feature = dp_ops.lap_dropout(
                feature, params["DP"], epsilon, k_dp, hard,
                prefix_eps_hat=config.prefix_eps_hat,
            )
    elif mode == "lapacian_dropout_equal_weight":
        # ref models.py:399-405; one implementation, train-gated nn.Dropout
        feature = dp_ops.equal_weight_dp(
            feature, epsilon, config.dropout_rate, k_dp, train
        )
    elif mode == "feature_all_lap":
        # PriConcat (main_0425.py:111-121); minmax already applied above
        noise = dp_ops.laplace_noise(
            k_dp, (feature.shape[0], 1), scale=1.0 / epsilon, dtype=feature.dtype
        )
        feature = feature + noise
    # "NDP", "DPSGD", "pri_gumbel": no feature DP here

    h = jax.nn.relu(L.linear(params["fc1"], feature))
    h = jnp.tanh(L.linear(params["fc2"], h))

    return L.linear(params["classifier"], h)


def apply(
    params,
    batch,  # dict: eeg_input, eeg_mask, act_input, act_mask
    config: FusionConfig,
    epsilon,
    hard: bool,
    rng: Optional[jax.Array],
    train: bool,
    return_features: bool = False,
):
    """Forward pass -> logits (B, 2): encode_features then apply_head.

    ``rng`` seeds both nn-dropout (train only) and the DP noise (always drawn,
    including eval — the reference's eval is stochastic, hence train.py's
    n_eval repeated evaluation). Pass ``rng=None`` only for dp_mode='NDP'/
    'DPSGD' at eval, where the forward is deterministic.
    """
    if config.dp_mode == "pri_gumbel":
        raise ValueError("use legacy_pri_gumbel_apply for the PriGumbel head")
    enc_keys, k_dp = split_rng(rng)
    feature_raw = encode_features(params, batch, config, enc_keys, train)
    return apply_head(
        params, feature_raw, config, epsilon, hard, k_dp, train,
        return_features,
    )


# ---------------------------------------------------------------------------
# Legacy heads (root-script generation)
# ---------------------------------------------------------------------------

def legacy_pri_gumbel_init(key, config: FusionConfig, bert_params=None):
    """Legacy PriGumbel ConcatModel (train_val.py:125-158): fc1(relu)/fc2 then
    learned-w Gumbel dropout + per-sample Laplace before the classifier."""
    params = init(key, dataclasses.replace(config, dp_mode="NDP"), bert_params)
    params["w"] = jax.random.uniform(jax.random.fold_in(key, 7), (D_MODEL,), config.jnp_dtype)
    return params


def legacy_pri_gumbel_apply(params, batch, config: FusionConfig, epsilon, tau,
                            rng, train: bool):
    """Forward of the legacy PriGumbel head (train_val.py:144-158)."""
    bert_cfg = config.bert_cfg()
    k_bert_a, k_bert_b, k_cross, k_gum, k_lap = jax.random.split(rng, 5)
    feat_a, seq_a, feat_b, seq_b = _encode_streams(
        params, batch, config, bert_cfg, (k_bert_a, k_bert_b), train
    )
    tgt_kpm = batch["act_mask"] == 0
    mem_kpm = batch["eeg_mask"] == 0
    cross = L.decoder(
        params["cross"], seq_b, seq_a, N_HEADS,
        tgt_key_padding_mask=tgt_kpm, memory_key_padding_mask=mem_kpm,
        dropout_key=k_cross if train else None,
    ).mean(axis=1)
    feature = jnp.concatenate([feat_a, feat_b, cross], axis=1)
    x = jax.nn.relu(L.linear(params["fc1"], feature))  # train_val.py:153
    x = L.linear(params["fc2"], x)  # :154 (no tanh in legacy head)
    x = dp_ops.gumbel_dropout(x, params["w"], k_gum, tau=tau, hard=not train)
    x = dp_ops.per_sample_laplace(x, epsilon, k_lap)  # Lap_noise, :156
    return L.linear(params["classifier"], x)


def dp_param_predicate(path: str) -> bool:
    """Name predicate splitting DP params from model params
    (ref: base_train.py:168-169 `'DP' in n`)."""
    return "DP" in path.split("/")
