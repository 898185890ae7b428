"""Text-side pretext extensions for the weights-free encoder.

VERDICT r4 localized the residual non-private accuracy gap (NDP 0.977 vs
the reference's 0.993) to the TEXT encoder: act-side distillation lifted
every act-consuming cell and could not move NDP. This module sweeps the
pretext-objective space the plain token-MLM (train/mlm.py) leaves open:

1. **Corpus augmentation** (``augment_rows``): the MLM corpus is only 2×2402
   serialized sensor rows, and the round-3 MLM-budget ablation showed more
   steps = overfitting, i.e. the binding constraint is *data*, not compute.
   The serialized text IS the numeric row (ref get_embedding.py:113-116),
   so jittering rows channel-wise (Gaussian, scaled per-column std, rounded
   back to int like process.py's rounding) and re-serializing them
   manufactures unlimited in-distribution corpus; EEG and act rows of one
   sample are jittered jointly so cross-modal targets stay coherent.

2. **Whole-number (span) corruption** (``word_start_index`` +
   MLMConfig.whole_word): a multi-digit reading like ``2084`` tokenizes to
   several wordpieces ("208", "##4"); token-level MLM usually leaves some
   pieces visible, so the model can copy digits instead of modeling
   channels. Whole-word masking (the BERT follow-up used by RoBERTa/ERNIE,
   re-derived here for numbers) selects at the word level: every piece of a
   chosen number is corrupted together.

3. **Cross-modal distillation into BERT** (MLMConfig.clip_weight): predict
   the sample's act-CLIP embedding — the one real pretrained signal in the
   repo (committed test array + train/distill.py synthesis) — from the
   pooled output, forcing [CLS] to carry the content CLIP sees in the
   rendered modality. Cosine loss on a 768→512 head.

All three compose with the row-regression pretext and the compact vocab.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# 1. Corpus augmentation
# ---------------------------------------------------------------------------

def augment_rows(rows: np.ndarray, factor: int, jitter_frac: float,
                 seed: int) -> np.ndarray:
    """``factor`` jittered integer copies of each row, (factor*N, C).

    Noise is Gaussian per column with stddev ``jitter_frac`` × the column's
    std over the given rows, rounded to int (the reference's processing
    rounds features to int — process.py:16-48 — so serialized text stays
    in-format). Constant columns stay constant.
    """
    if factor <= 0:
        return np.zeros((0, rows.shape[1]), rows.dtype)
    rng = np.random.RandomState(seed)
    std = rows.std(axis=0)
    out = []
    for _ in range(factor):
        noise = rng.randn(*rows.shape) * (std * jitter_frac)
        out.append(np.rint(rows + noise))
    return np.concatenate(out).astype(rows.dtype)


def tokenize_rows(rows: np.ndarray, coef: str = "bert-base-uncased",
                  max_len: int = 512) -> Dict[str, np.ndarray]:
    """Serialize numeric rows exactly like the embedding pipeline
    (space-joined ints, ref get_embedding.py:113-114) and tokenize with the
    offline tokenizer for ``coef`` (recovered exact-HF ids for uncased).
    Returns {input_ids, attention_mask} (N, max_len) int32 in FULL-vocab id
    space (compaction happens downstream with the rest of the corpus)."""
    from ..data.tokenizer import default_tokenizer_for_coef, serialize_row

    texts = [serialize_row(int(v) for v in row) for row in rows]
    tok = default_tokenizer_for_coef(coef)
    try:
        from .. import native

        if native.available():
            nt = native.NativeWordPiece.from_wordpiece(tok)
            ids, mask = nt.encode_batch(texts, max_len)
        else:
            ids, mask = tok.encode_batch(texts, max_len)
    except Exception:
        ids, mask = tok.encode_batch(texts, max_len)
    return {
        "input_ids": np.asarray(ids, np.int32),
        "attention_mask": np.asarray(mask, np.int32),
    }


# ---------------------------------------------------------------------------
# 2. Whole-number corruption support
# ---------------------------------------------------------------------------

def continuation_id_set(coef: str = "bert-base-uncased") -> np.ndarray:
    """Boolean table over FULL-vocab ids: True where the token string is a
    '##' continuation piece (so masking decisions can group wordpieces into
    the numbers they spell)."""
    from ..data.tokenizer import default_tokenizer_for_coef

    tok = default_tokenizer_for_coef(coef)
    size = max(tok.vocab.values()) + 1
    cont = np.zeros((size,), bool)
    for s, i in tok.vocab.items():
        if s.startswith("##"):
            cont[i] = True
    return cont


def word_start_index(full_ids: np.ndarray, cont_table: np.ndarray) -> np.ndarray:
    """(N, S) int32: for every position, the index of the first wordpiece of
    its word (continuation pieces point back; starts and specials point to
    themselves). Computed on host from FULL-vocab ids, before compaction."""
    n, s = full_ids.shape
    ids_clip = np.minimum(full_ids, len(cont_table) - 1)
    is_cont = cont_table[ids_clip]
    pos = np.arange(s)[None, :].repeat(n, 0)
    start = np.where(is_cont, 0, pos)
    # forward max: a continuation inherits the latest non-continuation index
    start = np.maximum.accumulate(start, axis=1)
    return start.astype(np.int32)


# ---------------------------------------------------------------------------
# 3. Cross-modal CLIP targets
# ---------------------------------------------------------------------------

def load_act_clip_targets(data_root: str) -> np.ndarray:
    """The train split's act-CLIP embeddings from the (distilled) data tree:
    data/embedding/act/img/clip_ViT_B_32/train.pickle — (N, 512) f32."""
    import pickle

    path = os.path.join(
        data_root, "data", "embedding", "act", "img", "clip_ViT_B_32",
        "train.pickle",
    )
    with open(path, "rb") as f:
        arr = np.asarray(pickle.load(f), np.float32)
    if arr.ndim == 3:  # (N, 1, 512) item layout
        arr = arr[:, 0]
    return arr


def stack_clip_targets(per_modal_counts: Sequence[int],
                       clip_train: np.ndarray) -> np.ndarray:
    """Per-corpus-row CLIP targets: the corpus stacks each modality's rows
    in sample order (EEG rows then act rows — mlm.build_corpus), and both
    modality serializations of sample i share the target clip_train[i]."""
    outs = []
    for n in per_modal_counts:
        reps = -(-n // len(clip_train))
        outs.append(np.tile(clip_train, (reps, 1))[:n])
    return np.concatenate(outs).astype(np.float32)
