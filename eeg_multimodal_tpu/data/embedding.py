"""GetEmbedding: the full embedding-build pipeline (ref: get_embedding.py:50-144).

Produces the on-disk embedding tree the trainer consumes:

  data/embedding/<modal>/img/<model>_<coef_std>/{train,test}.pickle
  data/embedding/<modal>/txt/<model>_<coef_std>/{train,test}.pickle

from the processed CSVs, using:
  - img: TransferToImage (image_transform.py) + CLIP ViT (models/vit.py) or
    ResNet-34 (models/resnet.py), batched on device (ref batch 16,
    get_embedding.py:66);
  - txt: row serialization + WordPiece (tokenizer.py) on host.

Pretrained weights load from local checkpoint files when provided (zero-
egress environment: no downloads); otherwise deterministic random init —
embeddings are then self-consistent across train/test, which is what
from-scratch training needs.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import resnet as resnet_mod
from ..models import vit as vit_mod
from . import image_transform
from .datasets import load_feature_csv
from .tokenizer import (
    MAX_LEN,
    WordPiece,
    default_tokenizer_for_coef,
    serialize_row,
)

ENCODE_BATCH = 16  # ref: get_embedding.py:66


def standardize_coef(coef: str) -> str:
    return coef.replace("/", "_").replace("-", "_")


class GetEmbedding:
    """ref signature: GetEmbedding(modal_list, data_train_test_list)
    .run(img_process_coef_model_list, txt_process_coef_model_list)."""

    def __init__(
        self,
        modal_list: Sequence[str],
        data_train_test_list: Sequence[str],
        data_root: str = ".",
        tokenizer: Optional[WordPiece] = None,
        clip_weights: Optional[str] = None,  # path to CLIP torch state dict
        resnet_weights: Optional[str] = None,  # torchvision resnet34 sd
        vocab_txts: Optional[Dict[str, str]] = None,  # coef -> HF vocab.txt
    ):
        self.modal_list = list(modal_list)
        self.data_train_test_list = list(data_train_test_list)
        self.data_root = data_root
        self.tokenizer = tokenizer  # explicit override for every coef
        self.vocab_txts = dict(vocab_txts or {})
        self.clip_weights = clip_weights
        self.resnet_weights = resnet_weights
        self._encoders: Dict[Tuple[str, str], Tuple] = {}
        self._tokenizers: Dict[str, WordPiece] = {}
        self._native_toks: Dict[int, object] = {}

    def tokenizer_for_coef(self, coef: str) -> WordPiece:
        """Per-coef tokenizer: explicit override > user vocab.txt > packaged
        recovered uncased vocab > synthetic numeric vocab (the cased default;
        exact cased ids need a user-supplied vocab.txt — see PARITY.md)."""
        if self.tokenizer is not None:
            return self.tokenizer
        if coef not in self._tokenizers:
            if coef in self.vocab_txts:
                self._tokenizers[coef] = WordPiece.from_vocab_txt(self.vocab_txts[coef])
            else:
                self._tokenizers[coef] = default_tokenizer_for_coef(coef)
        return self._tokenizers[coef]

    # -- encoders ------------------------------------------------------------
    def _get_image_encoder(self, process_model: str, coef_model: str):
        key = (process_model, coef_model)
        if key in self._encoders:
            return self._encoders[key]
        # params are jit *arguments* (closing over them would bake ~350 MB
        # of constants into the compile payload)
        if process_model == "clip":
            cfg = vit_mod.ViTConfig.for_coef(coef_model)
            if self.clip_weights and os.path.exists(self.clip_weights):
                with open(self.clip_weights, "rb") as f:
                    sd = pickle.load(f)
                if isinstance(sd, dict) and "conv" in sd:
                    # our own pytree (e.g. the contrastive-pretrained tower,
                    # train/contrastive.py) saved via checkpoint.save_pytree
                    params = sd
                else:
                    params, cfg = vit_mod.from_clip_state_dict(sd, cfg)
            else:
                params = vit_mod.init(jax.random.PRNGKey(0), cfg)
            params = jax.device_put(params)
            jitted = jax.jit(lambda p, imgs: vit_mod.encode_image(p, imgs, cfg))
        elif process_model == "resnet":
            if self.resnet_weights and os.path.exists(self.resnet_weights):
                with open(self.resnet_weights, "rb") as f:
                    sd = pickle.load(f)
                params = resnet_mod.from_torchvision_state_dict(sd)
            else:
                params = resnet_mod.init(jax.random.PRNGKey(0))
            params = jax.device_put(params)
            jitted = jax.jit(resnet_mod.features)
        else:
            raise ValueError(process_model)
        fn = lambda imgs: jitted(params, imgs)
        self._encoders[key] = fn
        return fn

    # -- img path ------------------------------------------------------------
    def img_encode(self, data_path: str, modal_type: str, process_model: str,
                   coef_model: str) -> np.ndarray:
        rows = load_feature_csv(data_path)
        to_img = (
            image_transform.act_to_images
            if modal_type == "act"
            else image_transform.eeg_to_images
        )
        encoder = self._get_image_encoder(process_model, coef_model)
        outs = []
        for i in range(0, len(rows), ENCODE_BATCH):
            chunk = rows[i : i + ENCODE_BATCH]
            pad = ENCODE_BATCH - len(chunk)  # static shape for jit
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            imgs = to_img(jnp.asarray(chunk))
            outs.append(np.asarray(encoder(imgs))[: ENCODE_BATCH - pad or None])
        return np.concatenate(outs, axis=0).astype(np.float32)

    def get_img_encode(self, img_process_coef_model_list):
        for modal in self.modal_list:
            for split in self.data_train_test_list:
                data_path = os.path.join(
                    self.data_root, "data", "processed", f"{split}_{modal}.csv"
                )
                for process_model, coef_model in img_process_coef_model_list:
                    arr = self.img_encode(data_path, modal, process_model, coef_model)
                    save_dir = os.path.join(
                        self.data_root, "data", "embedding", modal, "img",
                        f"{process_model}_{standardize_coef(coef_model)}",
                    )
                    os.makedirs(save_dir, exist_ok=True)
                    with open(os.path.join(save_dir, f"{split}.pickle"), "wb") as f:
                        pickle.dump(arr, f)

    # -- txt path ------------------------------------------------------------
    def text_encode(self, data_path: str, coef_model: str = "bert-base-uncased"):
        """Row -> space-joined int string -> WordPiece (ref :113-116). Output
        matches the BatchEncoding-list pickle format the datasets consume.
        Uses the native C++ tokenizer when the toolchain is available."""
        rows = load_feature_csv(data_path)
        texts = [serialize_row(int(v) for v in row) for row in rows]
        tok = self.tokenizer_for_coef(coef_model)
        from .. import native

        if native.available():
            nt = self._native_toks.get(id(tok))
            if nt is None:
                nt = self._native_toks[id(tok)] = native.NativeWordPiece.from_wordpiece(tok)
            ids, mask = nt.encode_batch(texts, MAX_LEN)
        else:
            ids, mask = tok.encode_batch(texts, MAX_LEN)
        return [
            {"input_ids": ids[i], "attention_mask": mask[i]}
            for i in range(len(texts))
        ]

    def get_text_encode(self, txt_process_coef_model_list):
        for modal in self.modal_list:
            for split in self.data_train_test_list:
                data_path = os.path.join(
                    self.data_root, "data", "processed", f"{split}_{modal}.csv"
                )
                for process_model, coef_model in txt_process_coef_model_list:
                    emb = self.text_encode(data_path, coef_model)
                    save_dir = os.path.join(
                        self.data_root, "data", "embedding", modal, "txt",
                        f"{process_model}_{standardize_coef(coef_model)}",
                    )
                    os.makedirs(save_dir, exist_ok=True)
                    with open(os.path.join(save_dir, f"{split}.pickle"), "wb") as f:
                        pickle.dump(emb, f)

    def run(self, img_process_coef_model_list, txt_process_coef_model_list):
        self.get_img_encode(img_process_coef_model_list)
        self.get_text_encode(txt_process_coef_model_list)
