"""Device-resident datasets for the four modality pairings.

The reference wraps pickles + a label CSV in per-item torch Datasets
(ref: python/src/custom_models/dataset.py:21-121; legacy data.py:7-36) and
iterates them through a shuffling DataLoader at batch 8
(ref: base_train.py:88-125). Here the whole corpus (train: 2402x512 tokens
~ 5 MB) lives in HBM as stacked arrays; an epoch is a permutation + reshape,
so batch assembly costs nothing on the host and the entire epoch can run
inside one jitted scan.

Batch schema (matching the reference's 5-tuple, dataset.py:35-44):
  eeg_input : (B, 512) int32 tokens   | (B, 1, 512) f32 embedding
  eeg_mask  : (B, 512) int32          | (B, 1) int32 (dummy [1])
  act_input : (B, 1, 512) f32         | (B, 512) int32
  act_mask  : (B, 1) int32            | (B, 512) int32
  label     : (B,) int32  (NaN -> 0, dataset.py:41-43)
"""
from __future__ import annotations

import dataclasses
import pickle
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Loaders for the reference's on-disk artifact formats
# ---------------------------------------------------------------------------

def load_label_csv(path: str) -> np.ndarray:
    """Label CSV with header 'label'; NaN/empty -> 0 (dataset.py:41-43)."""
    labels = []
    with open(path) as f:
        next(f)  # header
        for line in f:
            s = line.strip()
            labels.append(0 if s in ("", "nan") else int(float(s)))
    return np.asarray(labels, np.int32)


def load_bert_pickle(path: str) -> Dict[str, np.ndarray]:
    """List of HF BatchEncoding dicts -> stacked {input_ids, attention_mask}
    (format produced by get_embedding.py:113-116, consumed dataset.py:36-37)."""
    with open(path, "rb") as f:
        items = pickle.load(f)
    ids = np.asarray([np.asarray(e["input_ids"]).reshape(-1) for e in items], np.int32)
    mask = np.asarray(
        [np.asarray(e["attention_mask"]).reshape(-1) for e in items], np.int32
    )
    return {"input_ids": ids, "attention_mask": mask}


def load_embedding_pickle(path: str) -> np.ndarray:
    """(N, 512) float32 image-embedding array (e.g. CLIP; verified format of
    feature/action/test_clip_v2.pickle)."""
    with open(path, "rb") as f:
        arr = pickle.load(f)
    return np.asarray(arr, np.float32)


def load_eeg_feature_csv(path: str):
    """Legacy feature/{train,test}_EEG.csv: columns 'EEG' (space-joined ints)
    and 'label' (ref: data.py:10-13). Returns (texts, labels)."""
    import csv

    texts, labels = [], []
    with open(path) as f:
        for row in csv.DictReader(f):
            texts.append(row["EEG"])
            lab = row.get("label", "")
            labels.append(0 if lab in ("", "nan") else int(float(lab)))
    return texts, np.asarray(labels, np.int32)


def load_feature_csv(path: str) -> np.ndarray:
    """Processed per-channel CSV (train_EEG.csv / train_act.csv with channel
    headers, process.py output). Returns (N, C) float32."""
    return np.loadtxt(path, delimiter=",", skiprows=1, dtype=np.float32, ndmin=2)


# ---------------------------------------------------------------------------
# The stacked multimodal dataset
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MultiModalArrays:
    """Whole-split arrays for one (eeg_repr, act_repr) pairing."""

    eeg_input: np.ndarray
    eeg_mask: np.ndarray
    act_input: np.ndarray
    act_mask: np.ndarray
    labels: np.ndarray
    multimodal_type: str  # "ti" | "tt" | "it" | "ii"

    def __len__(self):
        return len(self.labels)

    def device_put(self):
        return jax.device_put(
            {
                "eeg_input": jnp.asarray(self.eeg_input),
                "eeg_mask": jnp.asarray(self.eeg_mask),
                "act_input": jnp.asarray(self.act_input),
                "act_mask": jnp.asarray(self.act_mask),
                "labels": jnp.asarray(self.labels),
            }
        )


def _txt_stream(tok: Dict[str, np.ndarray]):
    return tok["input_ids"], tok["attention_mask"]


def _img_stream(emb: np.ndarray):
    # dataset.py:38-39: unsqueeze(0) -> (1,512) per item, dummy mask [1]
    return emb[:, None, :].astype(np.float32), np.ones((len(emb), 1), np.int32)


def build_pairing(
    multimodal_type: str,
    labels: np.ndarray,
    eeg_txt: Optional[Dict[str, np.ndarray]] = None,
    eeg_img: Optional[np.ndarray] = None,
    act_txt: Optional[Dict[str, np.ndarray]] = None,
    act_img: Optional[np.ndarray] = None,
    faithful_tt_inputs: bool = True,
) -> MultiModalArrays:
    """Assemble a pairing exactly as the reference datasets do.

    ``faithful_tt_inputs`` reproduces dataset.py:63 verbatim, where the 'tt'
    act stream feeds ``attention_mask`` as input_ids (the committed behavior
    behind the recorded tt accuracy 0.987). Set False for the corrected
    pairing that feeds real token ids.
    """
    if multimodal_type == "ti":
        ei, em = _txt_stream(eeg_txt)
        ai, am = _img_stream(act_img)
    elif multimodal_type == "tt":
        ei, em = _txt_stream(eeg_txt)
        if faithful_tt_inputs:
            ai = act_txt["attention_mask"]  # dataset.py:63 quirk
            am = act_txt["attention_mask"]
        else:
            ai, am = _txt_stream(act_txt)
    elif multimodal_type == "it":
        ei, em = _img_stream(eeg_img)
        ai, am = _txt_stream(act_txt)
    elif multimodal_type == "ii":
        ei, em = _img_stream(eeg_img)
        ai, am = _img_stream(act_img)
    else:
        raise ValueError(multimodal_type)
    labels = np.where(np.isnan(labels.astype(np.float64)), 0, labels).astype(np.int32)
    return MultiModalArrays(ei, em, ai, am, labels, multimodal_type)


# ---------------------------------------------------------------------------
# Epoch batching: permutation -> padded (n_batches, B) index matrix
# ---------------------------------------------------------------------------

def truncate_tokens(arrays: "MultiModalArrays", multiple: int = 16,
                    max_len: Optional[int] = None) -> "MultiModalArrays":
    """Drop all-padding token columns: slice txt streams to the max valid
    mask length rounded up to `multiple`.

    The sequence axis is a sublane dimension on TPU, so 16 (one bf16
    sublane tile) is all the alignment the MXU needs — rounding the 65-token
    committed rows to 80 instead of 128 removes another 37% of encoder work
    with identical logits. (The fused attention kernel wants S%128 == 0,
    but its measured dispatch only selects it at S >= 512 anyway —
    ops/attention.py.)

    Mathematically exact: padded positions carry -inf attention bias, the
    pooler reads [CLS] only, and cross-attention masks them out — so their
    removal changes no logits. The reference pads every row to 512
    (get_embedding.py:115) and spends >85% of encoder FLOPs on padding; the
    committed data's longest row is 65 tokens.
    """
    def cut(ids, mask):
        if ids.ndim != 2 or ids.shape[1] <= multiple:
            return ids, mask
        longest = int(np.max(mask.sum(axis=1)))
        target = max_len or -(-longest // multiple) * multiple
        target = min(target, ids.shape[1])
        return ids[:, :target], mask[:, :target]

    ei, em = arrays.eeg_input, arrays.eeg_mask
    ai, am = arrays.act_input, arrays.act_mask
    if arrays.multimodal_type[0] == "t":
        ei, em = cut(ei, em)
    if arrays.multimodal_type[1] == "t":
        ai, am = cut(ai, am)
    return MultiModalArrays(ei, em, ai, am, arrays.labels, arrays.multimodal_type)


def truncate_pair(train: "MultiModalArrays", test: "MultiModalArrays",
                  multiple: int = 16):
    """Truncate a train/test pair to one shared (rounded) max length so a
    single compiled program serves both."""
    def longest(a):
        out = 0
        if a.multimodal_type[0] == "t":
            out = max(out, int(np.max(a.eeg_mask.sum(axis=1))))
        if a.multimodal_type[1] == "t":
            out = max(out, int(np.max(a.act_mask.sum(axis=1))))
        return out

    top = max(longest(train), longest(test))
    if top == 0:
        return train, test
    target = -(-top // multiple) * multiple
    return (
        truncate_tokens(train, multiple, max_len=target),
        truncate_tokens(test, multiple, max_len=target),
    )


def epoch_indices(key: jax.Array, n: int, batch_size: int, shuffle: bool = True):
    """Shuffled epoch as a static-shape index matrix plus a validity mask.

    Mirrors DataLoader(batch_size, shuffle=True, drop_last=False)
    (base_train.py:88-89): the last partial batch is padded with repeated
    index 0 and weighted out via the mask. Returns
    (idx (n_batches, B) int32, weight (n_batches, B) f32).
    """
    n_batches = -(-n // batch_size)
    perm = jax.random.permutation(key, n) if shuffle else jnp.arange(n)
    pad = n_batches * batch_size - n
    idx = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
    weight = jnp.concatenate([jnp.ones((n,)), jnp.zeros((pad,))])
    return (
        idx.reshape(n_batches, batch_size).astype(jnp.int32),
        weight.reshape(n_batches, batch_size),
    )


def gather_batch(data: Dict[str, jax.Array], idx: jax.Array) -> Dict[str, jax.Array]:
    """Index the stacked arrays with a (B,) index vector."""
    return {k: v[idx] for k, v in data.items()}
