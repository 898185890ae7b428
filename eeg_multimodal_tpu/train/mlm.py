"""Masked-language-model pretraining of the BERT encoder on sensor text.

Why this exists: the reference's headline accuracy (0.956 acc / 0.967 F1,
python/logs/demo/DPMLD/best_record.txt) starts from pretrained HF
``BertModel.from_pretrained`` weights (ref: models.py:40). This environment
is zero-egress, so the pretrained init must be *manufactured*: the corpus the
encoder sees is tiny and purely numeric (space-joined ints,
ref: get_embedding.py:113-116), which makes domain MLM pretraining on the
serialized sensor rows cheap — a few thousand steps on one TPU chip — and an
effective substitute for the generic English init.

Recipe (standard BERT MLM, Devlin et al. 2018, re-derived for this corpus):
15% of non-special positions are selected; 80% of those become [MASK], 10% a
random token, 10% stay; loss is cross-entropy on the selected positions with
the decoder tied to the word-embedding table.

TPU-first: the whole corpus lives in HBM; a training "epoch" is one
``lax.scan`` over randomly-drawn batch indices; masking is sampled in-jit
from threaded PRNG keys. Composes with ``data.compact_vocab`` — pass the
compact vocab size and mask id and the softmax is ~1-2k wide instead of 30522.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import bert as bert_mod
from ..models.layers import linear, MATMUL_PRECISION


@dataclasses.dataclass(frozen=True)
class MLMConfig:
    mask_prob: float = 0.15
    mask_token_frac: float = 0.8  # of selected: replaced by [MASK]
    random_token_frac: float = 0.1  # of selected: replaced by a random id
    # Row-value-regression pretext weight (0 = MLM only). The serialized
    # text IS the numeric sensor row (ref get_embedding.py:113-116), exactly
    # as the rendered image is a deterministic function of the row — the
    # pretext that lifted the image pairings (train/contrastive.py rendering
    # inversion, ACCURACY.md item 9) re-derived for text: regress the
    # standardized row values from the pooled output of the (corrupted)
    # sequence, jointly with MLM, so [CLS] pooling is forced to carry the
    # full channel content the fusion head consumes downstream.
    row_reg_weight: float = 0.0
    # Whole-number corruption: select corruption at WORD granularity so
    # every wordpiece of a chosen number is corrupted together (a partially
    # visible number lets the model copy digits instead of modeling the
    # channel). Requires a word_start index array (train/pretext.py).
    whole_word: bool = False
    # Cross-modal distillation weight: cosine loss predicting the sample's
    # act-CLIP embedding from the pooled output (train/pretext.py). 0 = off.
    clip_weight: float = 0.0
    batch_size: int = 64
    learning_rate: float = 1e-4
    warmup_steps: int = 200
    total_steps: int = 6000
    weight_decay: float = 0.01
    seed: int = 980616
    # token ids in the id space the corpus uses (compact or full)
    mask_id: int = 103
    cls_id: int = 101
    sep_id: int = 102
    pad_id: int = 0
    # steps per dispatched scan chunk; kept short so a single device
    # dispatch stays well under the runtime's execution watchdog
    log_every: int = 50
    # bf16 compute with f32 master params/moments (LN/softmax stay f32
    # inside the model); flip to float32 for bit-level debugging
    compute_dtype: str = "bfloat16"


# -- MLM head (HF BertOnlyMLMHead semantics: dense -> gelu -> LN -> tied decoder)
def head_init(key, config: bert_mod.BertConfig, dtype=jnp.float32,
              n_values: int = 0, n_clip: int = 0):
    H = config.hidden_size
    std = config.initializer_range
    k1, k2 = jax.random.split(key)
    head = {
        "transform": {
            "kernel": std * jax.random.normal(k1, (H, H), dtype),
            "bias": jnp.zeros((H,), dtype),
        },
        "ln": {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
        "decoder_bias": jnp.zeros((config.vocab_size,), dtype),
    }
    if n_values:
        # row-value-regression head off the pooled output (pretext only;
        # dropped after pretraining like the MLM transform)
        head["reg"] = {
            "kernel": std * jax.random.normal(k2, (H, n_values), dtype),
            "bias": jnp.zeros((n_values,), dtype),
        }
    if n_clip:
        # cross-modal distillation head (pretext only): pooled -> CLIP space
        k3 = jax.random.fold_in(k2, 1)
        head["clip"] = {
            "kernel": std * jax.random.normal(k3, (H, n_clip), dtype),
            "bias": jnp.zeros((n_clip,), dtype),
        }
    return head


def mlm_outputs(bert_params, head, input_ids, attention_mask, config, dropout_key):
    """(vocab logits over the sequence, pooled output) in one encoder pass."""
    seq, pooled = bert_mod.apply(
        bert_params, input_ids, attention_mask, config, dropout_key=dropout_key
    )
    h = jax.nn.gelu(linear(head["transform"], seq), approximate=False)
    h = bert_mod._layer_norm(head["ln"], h, config.layer_norm_eps)
    word = bert_params["embeddings"]["word"]
    logits = (
        jnp.einsum(
            "bsh,vh->bsv", h, word,
            preferred_element_type=jnp.float32, precision=MATMUL_PRECISION,
        )
        + head["decoder_bias"]
    )
    return logits, pooled


def mlm_logits(bert_params, head, input_ids, attention_mask, config, dropout_key):
    return mlm_outputs(
        bert_params, head, input_ids, attention_mask, config, dropout_key
    )[0]


def mask_tokens(key, input_ids, attention_mask, cfg: MLMConfig, vocab_size: int,
                word_start=None):
    """In-jit BERT masking. Returns (corrupted_ids, labels, select_mask).

    With ``cfg.whole_word`` and a ``word_start`` index array (B, S —
    pretext.word_start_index), the selection/kind uniforms are gathered
    from each word's FIRST wordpiece, so all pieces of a number share one
    corruption decision (whole-number masking)."""
    k_sel, k_kind, k_rand = jax.random.split(key, 3)
    special = (
        (input_ids == cfg.cls_id)
        | (input_ids == cfg.sep_id)
        | (attention_mask == 0)
    )
    r = jax.random.uniform(k_sel, input_ids.shape)
    kind = jax.random.uniform(k_kind, input_ids.shape)
    if cfg.whole_word and word_start is not None:
        r = jnp.take_along_axis(r, word_start, axis=-1)
        kind = jnp.take_along_axis(kind, word_start, axis=-1)
    selected = (r < cfg.mask_prob) & ~special
    use_mask = kind < cfg.mask_token_frac
    use_rand = (kind >= cfg.mask_token_frac) & (
        kind < cfg.mask_token_frac + cfg.random_token_frac
    )
    rand_ids = jax.random.randint(k_rand, input_ids.shape, 0, vocab_size, input_ids.dtype)
    corrupted = jnp.where(selected & use_mask, cfg.mask_id, input_ids)
    corrupted = jnp.where(selected & use_rand, rand_ids, corrupted)
    return corrupted, input_ids, selected


def mlm_loss(bert_params, head, batch_ids, batch_mask, bert_cfg, cfg, key,
             train: bool = True, values=None, value_mask=None,
             word_start=None, clip_targets=None):
    """MLM cross-entropy, plus cfg.row_reg_weight x masked MSE of the
    standardized row values regressed from the pooled output when ``values``
    (B, V) and ``value_mask`` (B, V) are given, plus cfg.clip_weight x
    cosine distance to ``clip_targets`` (B, 512) predicted from the pooled
    output (cross-modal distillation pretext, train/pretext.py)."""
    k_mask, k_drop = jax.random.split(key)
    corrupted, labels, selected = mask_tokens(
        k_mask, batch_ids, batch_mask, cfg, bert_cfg.vocab_size,
        word_start=word_start,
    )
    logits, pooled = mlm_outputs(
        bert_params, head, corrupted, batch_mask, bert_cfg,
        k_drop if train else None,  # eval: no encoder dropout
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = selected.astype(jnp.float32)
    loss = (nll * w).sum() / jnp.maximum(w.sum(), 1.0)
    if values is not None and cfg.row_reg_weight:
        pred = linear(head["reg"], pooled).astype(jnp.float32)
        vm = value_mask.astype(jnp.float32)
        mse = (jnp.square(pred - values) * vm).sum() / jnp.maximum(vm.sum(), 1.0)
        loss = loss + cfg.row_reg_weight * mse
    if clip_targets is not None and cfg.clip_weight:
        pred_c = linear(head["clip"], pooled).astype(jnp.float32)
        tgt = clip_targets.astype(jnp.float32)
        cos = (pred_c * tgt).sum(-1) / (
            jnp.linalg.norm(pred_c, axis=-1) * jnp.linalg.norm(tgt, axis=-1)
            + 1e-8
        )
        loss = loss + cfg.clip_weight * jnp.mean(1.0 - cos)
    return loss


class MLMPretrainer:
    """Scan-based MLM pretraining over a device-resident corpus."""

    def __init__(
        self,
        bert_cfg: bert_mod.BertConfig,
        cfg: MLMConfig = MLMConfig(),
        bert_params=None,
        dtype=jnp.float32,
        n_values: int = 0,
        n_clip: int = 0,
    ):
        self.bert_cfg = bert_cfg
        self.cfg = cfg
        key = jax.random.PRNGKey(cfg.seed)
        k_bert, k_head = jax.random.split(key)
        self.bert_params = (
            bert_params if bert_params is not None else bert_mod.init(k_bert, bert_cfg, dtype)
        )
        self.head = head_init(k_head, bert_cfg, dtype, n_values=n_values,
                              n_clip=n_clip)
        warmup = min(cfg.warmup_steps, max(1, cfg.total_steps // 2))
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, cfg.total_steps
        )
        self.opt = optax.adamw(schedule, weight_decay=cfg.weight_decay)
        self.opt_state = self.opt.init({"bert": self.bert_params, "head": self.head})
        self._chunk = None

    def _make_chunk(self, corpus_ids, corpus_mask, corpus_vals=None,
                    corpus_val_mask=None, corpus_word_start=None,
                    corpus_clip=None):
        cfg, bert_cfg, opt = self.cfg, self.bert_cfg, self.opt
        compute_dtype = jnp.dtype(cfg.compute_dtype)

        def loss_fn(params, b_ids, b_mask, b_vals, b_vmask, b_ws, b_clip, key):
            if compute_dtype != jnp.float32:
                from ..utils.trees import tree_cast

                params = tree_cast(params, compute_dtype)
            return mlm_loss(
                params["bert"], params["head"], b_ids, b_mask, bert_cfg, cfg,
                key, values=b_vals, value_mask=b_vmask, word_start=b_ws,
                clip_targets=b_clip,
            )

        @jax.jit
        def run_chunk(params, opt_state, key, n_steps_arr):
            n = n_steps_arr.shape[0]
            keys = jax.random.split(key, n)

            def step(carry, k):
                params, opt_state = carry
                k_batch, k_loss = jax.random.split(k)
                idx = jax.random.randint(
                    k_batch, (cfg.batch_size,), 0, corpus_ids.shape[0]
                )
                b_ids, b_mask = corpus_ids[idx], corpus_mask[idx]
                b_vals = corpus_vals[idx] if corpus_vals is not None else None
                b_vmask = (
                    corpus_val_mask[idx] if corpus_val_mask is not None else None
                )
                b_ws = (
                    corpus_word_start[idx]
                    if corpus_word_start is not None else None
                )
                b_clip = corpus_clip[idx] if corpus_clip is not None else None
                loss, g = jax.value_and_grad(loss_fn)(
                    params, b_ids, b_mask, b_vals, b_vmask, b_ws, b_clip,
                    k_loss,
                )
                upd, opt_state = opt.update(g, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys
            )
            return params, opt_state, losses

        return run_chunk

    def fit(self, corpus_ids: np.ndarray, corpus_mask: np.ndarray, echo: bool = True,
            corpus_vals: Optional[np.ndarray] = None,
            corpus_val_mask: Optional[np.ndarray] = None,
            corpus_word_start: Optional[np.ndarray] = None,
            corpus_clip: Optional[np.ndarray] = None):
        """Run cfg.total_steps MLM steps; returns (bert_params, history).

        ``corpus_vals``/``corpus_val_mask`` (N, V): standardized row values
        + validity mask for the row-regression pretext (cfg.row_reg_weight).
        ``corpus_word_start`` (N, S): word-start index for whole-number
        corruption (cfg.whole_word). ``corpus_clip`` (N, 512): act-CLIP
        targets for the cross-modal pretext (cfg.clip_weight)."""
        cfg = self.cfg
        ids_dev = jax.device_put(jnp.asarray(corpus_ids, jnp.int32))
        mask_dev = jax.device_put(jnp.asarray(corpus_mask, jnp.int32))
        vals_dev = vmask_dev = ws_dev = clip_dev = None
        if corpus_vals is not None and cfg.row_reg_weight:
            vals_dev = jax.device_put(jnp.asarray(corpus_vals, jnp.float32))
            vmask_dev = jax.device_put(jnp.asarray(corpus_val_mask, jnp.float32))
        if corpus_word_start is not None and cfg.whole_word:
            ws_dev = jax.device_put(jnp.asarray(corpus_word_start, jnp.int32))
        if corpus_clip is not None and cfg.clip_weight:
            clip_dev = jax.device_put(jnp.asarray(corpus_clip, jnp.float32))
        run_chunk = self._make_chunk(ids_dev, mask_dev, vals_dev, vmask_dev,
                                     ws_dev, clip_dev)
        params = {"bert": self.bert_params, "head": self.head}
        key = jax.random.PRNGKey(cfg.seed + 1)
        history = []
        done = 0
        t0 = time.time()
        while done < cfg.total_steps:
            n = min(cfg.log_every, cfg.total_steps - done)
            key, sub = jax.random.split(key)
            params, self.opt_state, losses = run_chunk(
                params, self.opt_state, sub, jnp.zeros((n,))
            )
            done += n
            loss = float(losses[-50:].mean())
            history.append({"step": done, "loss": loss})
            if echo:
                print(
                    f"[mlm] step {done}/{cfg.total_steps} loss {loss:.4f} "
                    f"({time.time() - t0:.1f}s)",
                    flush=True,
                )
        self.bert_params, self.head = params["bert"], params["head"]
        return self.bert_params, history

    def eval_loss(self, corpus_ids, corpus_mask, n_batches: int = 20) -> float:
        """Mean MLM loss over held-out rows (fixed key per batch; eval
        semantics — the mask sampling stays stochastic but encoder dropout
        is OFF, so the number isn't inflated by train-mode noise)."""
        cfg = self.cfg
        ids = jnp.asarray(corpus_ids, jnp.int32)
        mask = jnp.asarray(corpus_mask, jnp.int32)

        @jax.jit
        def one(params, key):
            idx = jax.random.randint(key, (cfg.batch_size,), 0, ids.shape[0])
            return mlm_loss(
                params["bert"], params["head"], ids[idx], mask[idx],
                self.bert_cfg, cfg, key, train=False,
            )

        params = {"bert": self.bert_params, "head": self.head}
        key = jax.random.PRNGKey(0)
        losses = [
            float(one(params, jax.random.fold_in(key, i))) for i in range(n_batches)
        ]
        return float(np.mean(losses))


def build_corpus(
    token_dicts, max_len: Optional[int] = None, multiple: int = 128
):
    """Stack {input_ids, attention_mask} dicts into one corpus, truncated to
    the longest valid row rounded up to ``multiple`` (same exact-truncation
    argument as data.datasets.truncate_tokens)."""
    ids = np.concatenate([np.asarray(t["input_ids"]) for t in token_dicts])
    mask = np.concatenate([np.asarray(t["attention_mask"]) for t in token_dicts])
    if max_len is None:
        longest = int(mask.sum(axis=1).max())
        max_len = min(-(-longest // multiple) * multiple, ids.shape[1])
    return ids[:, :max_len].astype(np.int32), mask[:, :max_len].astype(np.int32)


def load_row_values(csv_path: str) -> np.ndarray:
    """Numeric rows of a processed CSV (header skipped). The serialized text
    the tokenizer sees is exactly these values space-joined
    (ref get_embedding.py:113-114), so they are the text's ground truth."""
    return np.loadtxt(csv_path, delimiter=",", skiprows=1, dtype=np.float64)


def standardize_rows(values: np.ndarray):
    """Per-column standardization over the given (train) rows; returns
    (standardized f32, mean, std). Constant columns get std 1."""
    mean = values.mean(axis=0)
    std = values.std(axis=0)
    std = np.where(std < 1e-12, 1.0, std)
    return ((values - mean) / std).astype(np.float32), mean, std


def build_value_targets(per_modal_values):
    """Stack per-modality standardized value rows into one (N, Vmax) target
    matrix + validity mask, concatenated in the same order the MLM corpus
    stacks its modalities (EEG rows then act rows)."""
    vmax = max(v.shape[1] for v in per_modal_values)
    vals, masks = [], []
    for v in per_modal_values:
        std, _, _ = standardize_rows(v)
        pad = vmax - std.shape[1]
        vals.append(np.pad(std, ((0, 0), (0, pad))))
        m = np.zeros((std.shape[0], vmax), np.float32)
        m[:, : std.shape[1]] = 1.0
        masks.append(m)
    return np.concatenate(vals), np.concatenate(masks)


def pretrain_finetune_mlm(
    data_root: str,
    out_root: str,
    mlm_steps: int = 8000,
    mlm_batch: int = 128,
    mlm_lr: float = 1e-4,
    epsilon: float = 0.1,
    epochs: int = 120,
    batch_size: int = 8,
    learning_rate: float = 1e-6,
    compute_dtype: str = "bfloat16",
    path_suffix: str = "DPMLD/",
    bert_ckpt: Optional[str] = None,
    bert_config: Optional[bert_mod.BertConfig] = None,
    echo: bool = True,
    row_reg_weight: float = 0.0,
    aug_factor: int = 0,
    aug_jitter: float = 0.03,
    whole_word: bool = False,
    clip_weight: float = 0.0,
    dp_mode: str = "lapacian_dropout",
):
    """The weights-free accuracy-parity pipeline (ACCURACY.md §4-5):
    domain MLM pretraining on the train split's serialized sensor rows, then
    the faithful DP-MLD fine-tune, on the compact vocabulary throughout.
    Measured: best acc 0.964 / F1 0.974 at eps=0.1 with the defaults — above
    the reference's recorded 0.956/0.967 that starts from pretrained HF BERT
    (ref models.py:40, logs/demo/DPMLD/best_record.txt).

    Returns the fine-tune result dict (train.api.TrainAndTest.train_on).
    """
    import json
    import os

    from ..data import datasets as D
    from ..data.compact_vocab import build_compact_vocab, remap_pairing
    from .api import TrainAndTest
    from .checkpoint import load_pytree, save_pytree

    os.makedirs(out_root, exist_ok=True)
    # data loads from data_root; logs/checkpoints land under the run dir
    # (train_on resolves model_path/log_path from artifacts_root) — passed
    # at construction, never mutated after (the round-2 regression pattern)
    job = TrainAndTest(
        batch_size=batch_size, learning_rate=learning_rate, epochs=epochs,
        data_root=data_root, artifacts_root=out_root,
        compute_dtype=compute_dtype, echo=echo,
    )
    train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
    test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
    train, test = D.truncate_pair(train, test)

    from . import pretext

    emb_root = os.path.join(data_root, "data", "embedding")
    corpus_dicts = []
    corpus_values = []  # per-modality numeric rows for the regression pretext
    per_modal_counts = []
    for modal in ("EEG", "act"):  # both modalities' serialized texts
        path = os.path.join(
            emb_root, modal, "txt", "bert_bert_base_uncased", "train.pickle"
        )
        if os.path.exists(path):
            tok = D.load_bert_pickle(path)
            csv_path = os.path.join(
                data_root, "data", "processed", f"train_{modal}.csv"
            )
            need_rows = bool(row_reg_weight) or aug_factor > 0
            if need_rows and not os.path.exists(csv_path):
                raise FileNotFoundError(
                    f"row_reg_weight/aug_factor requested but {csv_path} is "
                    f"missing — the pretext would silently train without "
                    f"its {modal} rows."
                )
            vals = load_row_values(csv_path) if need_rows else None
            if vals is not None and vals.shape[0] != tok["input_ids"].shape[0]:
                # per-modality alignment: a total-count match could hide two
                # compensating per-modality mismatches, silently training the
                # pretext on misaligned targets. ValueError (not assert) so
                # the fail-loudly contract survives python -O.
                raise ValueError(
                    f"{modal}: {vals.shape[0]} csv rows vs "
                    f"{tok['input_ids'].shape[0]} token rows — train_"
                    f"{modal}.csv and the token pickle disagree"
                )
            if aug_factor > 0:
                # corpus augmentation (pretext.py): jittered integer copies
                # of every row, serialized + tokenized with the exact
                # embedding-pipeline path. The MLM-budget ablation showed
                # the 2x2402-row corpus overfits with more steps; this
                # manufactures in-distribution data instead.
                aug = pretext.augment_rows(
                    vals, aug_factor, aug_jitter,
                    seed=0xA06 + (0 if modal == "EEG" else 1),
                )
                aug_tok = pretext.tokenize_rows(
                    aug, max_len=tok["input_ids"].shape[1]
                )
                tok = {
                    "input_ids": np.concatenate(
                        [tok["input_ids"], aug_tok["input_ids"]]
                    ),
                    "attention_mask": np.concatenate(
                        [tok["attention_mask"], aug_tok["attention_mask"]]
                    ),
                }
                if row_reg_weight:
                    vals = np.concatenate([vals, aug])
            corpus_dicts.append(tok)
            per_modal_counts.append(tok["input_ids"].shape[0])
            if row_reg_weight:
                corpus_values.append(vals)
    corpus_ids, corpus_mask = build_corpus(corpus_dicts)
    corpus_vals = corpus_vmask = corpus_ws = corpus_clip = None
    n_values = n_clip = 0
    if row_reg_weight:
        assert len(corpus_values) == len(corpus_dicts)
        corpus_vals, corpus_vmask = build_value_targets(corpus_values)
        n_values = corpus_vals.shape[1]
        assert corpus_vals.shape[0] == corpus_ids.shape[0], (
            "value rows misaligned with token rows"
        )
    if whole_word:
        # word-start index from FULL-vocab ids (pre-compaction), truncated
        # to the corpus length (start indices only point backwards)
        cont = pretext.continuation_id_set()
        ws_full = np.concatenate(
            [
                pretext.word_start_index(np.asarray(d["input_ids"]), cont)
                for d in corpus_dicts
            ]
        )
        corpus_ws = ws_full[:, : corpus_ids.shape[1]]
    if clip_weight:
        clip_train = pretext.load_act_clip_targets(data_root)
        corpus_clip = pretext.stack_clip_targets(per_modal_counts, clip_train)
        n_clip = corpus_clip.shape[1]
        assert corpus_clip.shape[0] == corpus_ids.shape[0]

    # vocab over the MLM corpus AND both splits' token streams: on the
    # committed data test ids are a subset of train's, but a user tree may
    # carry test-only numeric surfaces, and remapping those to [UNK] would
    # silently deviate from the faithful semantics
    vocab = build_compact_vocab(
        [d["input_ids"] for d in corpus_dicts]
        + [train.eeg_input, test.eeg_input]
    )
    if echo:
        print(f"[vocab] compact size {vocab.size} (full 30522)", flush=True)
    vocab.save(os.path.join(out_root, "compact_vocab.npz"))
    corpus_ids = vocab.remap(corpus_ids)
    train = remap_pairing(train, vocab)
    test = remap_pairing(test, vocab)
    bert_cfg = dataclasses.replace(
        bert_config or bert_mod.BertConfig(), vocab_size=vocab.size
    )

    if bert_ckpt:
        bert_params = load_pytree(bert_ckpt)
    else:
        cfg = MLMConfig(
            batch_size=mlm_batch, learning_rate=mlm_lr, total_steps=mlm_steps,
            warmup_steps=max(50, mlm_steps // 20), mask_id=vocab.mask_id,
            cls_id=vocab.cls_id, sep_id=vocab.sep_id, pad_id=vocab.pad_id,
            row_reg_weight=row_reg_weight, whole_word=whole_word,
            clip_weight=clip_weight,
        )
        pre = MLMPretrainer(bert_cfg, cfg, n_values=n_values, n_clip=n_clip)
        bert_params, history = pre.fit(
            corpus_ids, corpus_mask, echo=echo,
            corpus_vals=corpus_vals, corpus_val_mask=corpus_vmask,
            corpus_word_start=corpus_ws, corpus_clip=corpus_clip,
        )
        save_pytree(os.path.join(out_root, "bert_mlm.pickle"), bert_params)
        with open(os.path.join(out_root, "mlm_history.json"), "w") as f:
            json.dump(history, f)

    job.bert_params = bert_params
    return job.train_on(
        train, test, "demo", path_suffix, "ti", dp_mode,
        epsilon=epsilon, bert_config=bert_cfg,
        # data/bert_params are already compact-remapped above; handing the
        # vocab to the Trainer makes the exported best_f1.pickle scatter the
        # word table back to full-vocab rows (checkpoint contract; without
        # it `cli predict` would gather full-vocab ids out of range)
        vocab=vocab,
    )
