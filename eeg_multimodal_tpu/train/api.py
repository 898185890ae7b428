"""Public API facade: TrainAndTest with the reference's exact signature.

Mirrors python/src/custom_models/base_train.py:47-553 — same argument list,
same path-based dataset resolution (base_train.py:77-125), same model
dispatch (:127-150), same four dp_mode training regimes, same on-disk layout:

  data/embedding/<modal>/<txt|img>/<model>_<coef_std>/{train,test}.pickle
  data/processed/{train,test}_label.csv
  models/custom/<train_type>/<path_suffix>best_f1.pickle
  logs/<train_type>/<path_suffix>{whole,best}_record.txt

so a user of the reference can point this class at the same data tree and get
the same artifacts, with the TPU trainer underneath.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

from ..data import datasets as D
from ..dp.dpsgd import DPSGDConfig
from ..models import fusion
from .dpsgd_trainer import DPSGDTrainer
from .trainer import TrainConfig, Trainer


def standardize_coef(coef: str) -> str:
    """'ViT-B/32' -> 'ViT_B_32' (base_train.py:74-75)."""
    return coef.replace("/", "_").replace("-", "_")


class TrainAndTest:
    """ref signature: TrainAndTest(batch_size=8, learning_rate=1e-6,
    epochs=50).train(train_type, path_suffix, multimodal_type, dp_mode,
    eeg_model, eeg_model_coef, act_model, act_model_coef, cross_atn_type,
    epsilon)."""

    def __init__(
        self,
        batch_size: int = 8,
        learning_rate: float = 1e-6,
        epochs: int = 50,
        data_root: str = ".",
        compute_dtype: str = "bfloat16",
        bert_params=None,
        echo: bool = True,
        artifacts_root: Optional[str] = None,
        seed: int = 980616,  # ref: base_train.py:43 set_seed(980616)
    ):
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.data_root = data_root
        self.compute_dtype = compute_dtype
        self.bert_params = bert_params
        self.echo = echo
        self.seed = seed
        # logs/checkpoints root; defaults to data_root (the reference writes
        # artifacts next to its data). Passing it separately lets drivers
        # read one shared data tree while writing run artifacts elsewhere.
        self.artifacts_root = artifacts_root or data_root

    # -- dataset resolution (base_train.py:77-125) ---------------------------
    def _embedding_path(self, modal: str, repr_: str, model: str, coef: str, split: str):
        return os.path.join(
            self.data_root, "data", "embedding", modal, repr_,
            f"{model}_{standardize_coef(coef)}", f"{split}.pickle",
        )

    def _load_split(self, split, multimodal_type, eeg_model, eeg_model_coef,
                    act_model, act_model_coef):
        label_path = os.path.join(
            self.data_root, "data", "processed", f"{split}_label.csv"
        )
        labels = D.load_label_csv(label_path)
        kw: Dict[str, Any] = {}
        eeg_repr = "txt" if multimodal_type[0] == "t" else "img"
        act_repr = "txt" if multimodal_type[1] == "t" else "img"
        eeg_path = self._embedding_path("EEG", eeg_repr, eeg_model, eeg_model_coef, split)
        act_path = self._embedding_path("act", act_repr, act_model, act_model_coef, split)
        if eeg_repr == "txt":
            kw["eeg_txt"] = D.load_bert_pickle(eeg_path)
        else:
            kw["eeg_img"] = D.load_embedding_pickle(eeg_path)
        if act_repr == "txt":
            kw["act_txt"] = D.load_bert_pickle(act_path)
        else:
            kw["act_img"] = D.load_embedding_pickle(act_path)
        return D.build_pairing(multimodal_type, labels, **kw)

    # -- the public train entry ---------------------------------------------
    def train(
        self,
        train_type: str,
        path_suffix: str,
        multimodal_type: str,
        dp_mode: str,
        eeg_model: str,
        eeg_model_coef: str,
        act_model: str,
        act_model_coef: str,
        cross_atn_type: str,
        epsilon: float,
    ):
        train_data = self._load_split(
            "train", multimodal_type, eeg_model, eeg_model_coef,
            act_model, act_model_coef,
        )
        test_data = self._load_split(
            "test", multimodal_type, eeg_model, eeg_model_coef,
            act_model, act_model_coef,
        )
        return self.train_on(
            train_data, test_data, train_type, path_suffix, multimodal_type,
            dp_mode, eeg_model_coef, cross_atn_type, epsilon,
        )

    def train_on(
        self,
        train_data,
        test_data,
        train_type: str,
        path_suffix: str,
        multimodal_type: str,
        dp_mode: str,
        eeg_model_coef: str = "bert-base-uncased",
        cross_atn_type: str = "double_stream",
        epsilon: float = 0.1,
        bert_config=None,
        auto_truncate: bool = True,
        compact_vocab: bool = False,
        vocab=None,
    ):
        """In-memory variant of :meth:`train` (datasets already built).

        ``auto_truncate`` drops all-padding token columns (exact — see
        data.datasets.truncate_tokens); the committed data's rows are <= 65
        tokens of the padded 512, so this is a ~4x encoder-FLOPs saving.

        ``compact_vocab`` remaps token ids to the ~600 the numeric corpus
        actually uses (data/compact_vocab.py) — exact for the training
        trajectory (never-gathered rows have identically-zero Adam updates)
        and ~20% less optimizer HBM traffic; checkpoints export with the
        word table scattered back to full-vocab rows. Not applied to the
        DPSGD path (its trainable subtree excludes the embedding table).

        ``vocab``: a prebuilt ``data.compact_vocab.CompactVocab`` when the
        caller already remapped the datasets (and bert_params) itself —
        e.g. the MLM pretrain pipeline. The Trainer needs it so the exported
        checkpoint scatters the compact word table back to full-vocab rows
        (the documented checkpoint contract). Mutually exclusive with
        ``compact_vocab=True``.
        """
        import dataclasses

        if compact_vocab and vocab is not None:
            raise ValueError("pass either compact_vocab=True or a prebuilt vocab")

        if auto_truncate:
            from ..data.datasets import truncate_pair

            train_data, test_data = truncate_pair(train_data, test_data)

        bert_params = self.bert_params
        if compact_vocab and dp_mode != "DPSGD" and "t" in multimodal_type:
            from ..data.compact_vocab import build_compact_vocab, remap_pairing
            from ..models.bert import BertConfig

            base_cfg = bert_config or BertConfig.for_coef(eeg_model_coef)
            streams = []
            for d in (train_data, test_data):
                if multimodal_type[0] == "t":
                    streams.append(d.eeg_input)
                if multimodal_type[1] == "t":
                    streams.append(d.act_input)
            vocab = build_compact_vocab(streams, full_vocab=base_cfg.vocab_size)
            train_data = remap_pairing(train_data, vocab)
            test_data = remap_pairing(test_data, vocab)
            bert_config = dataclasses.replace(base_cfg, vocab_size=vocab.size)
            if bert_params is not None:
                bert_params = dict(bert_params)
                emb = dict(bert_params["embeddings"])
                emb["word"] = vocab.compact_embeddings(emb["word"])
                bert_params["embeddings"] = emb

        model_path = os.path.join(
            self.artifacts_root, "models", "custom", train_type, path_suffix,
            "best_f1.pickle",
        )
        log_path = os.path.join(
            self.artifacts_root, "logs", train_type, path_suffix
        )

        fc = fusion.config_for(
            multimodal_type, dp_mode, cross_atn_type,
            bert_coef=eeg_model_coef, dtype="float32",
        )
        if bert_config is not None:
            fc = dataclasses.replace(fc, bert_config=bert_config)

        if dp_mode == "DPSGD":
            trainer = DPSGDTrainer(
                fc,
                DPSGDConfig(
                    target_epsilon=epsilon,
                    epochs=self.epochs,
                    batch_size=self.batch_size,
                    learning_rate=self.learning_rate,
                ),
                bert_params=self.bert_params,
            )
            return trainer.fit(
                train_data, test_data, log_path=log_path,
                model_path=model_path, echo=self.echo,
            )

        tc = TrainConfig(
            batch_size=self.batch_size,
            learning_rate=self.learning_rate,
            epochs=self.epochs,
            compute_dtype=self.compute_dtype,
            seed=self.seed,
        )
        trainer = Trainer(fc, tc, bert_params=bert_params, vocab=vocab)
        return trainer.fit(
            train_data, test_data, epsilon,
            log_path=log_path, model_path=model_path, echo=self.echo,
        )

    # -- inference on a trained checkpoint -----------------------------------
    def predict(
        self,
        checkpoint: str,
        multimodal_type: str = "ti",
        dp_mode: str = "lapacian_dropout",
        eeg_model: str = "bert",
        eeg_model_coef: str = "bert-base-uncased",
        act_model: str = "clip",
        act_model_coef: str = "ViT-B/32",
        cross_atn_type: str = "double_stream",
        epsilon: float = 0.1,
        split: str = "test",
        n_eval: int = 1,
        seed: int = 980616,
        out_csv: Optional[str] = None,
        bert_config=None,
    ):
        """Evaluate a trained best_f1 checkpoint on a split.

        Productizes the reference's manual checkpoint-evaluation flows
        (train_val.py:508-515 test(), test_0425.py): loads the torch-format
        state dict, runs the stochastic eval epoch (hard=True, n_eval
        repeated noise draws majority-voted like the legacy trainer), and
        optionally writes per-sample predictions to ``out_csv``.
        Returns {"loss", "accuracy", "f1", "predictions", "labels", "scores"}.
        """
        import dataclasses

        import jax
        import numpy as np

        from ..data.datasets import epoch_indices, truncate_tokens
        from ..train import metrics as M
        from ..utils.seeding import set_seed
        from .checkpoint import load_torch_checkpoint
        from .trainer import StepFunctions

        data = self._load_split(
            split, multimodal_type, eeg_model, eeg_model_coef,
            act_model, act_model_coef,
        )
        data = truncate_tokens(data)
        fc = fusion.config_for(
            multimodal_type, dp_mode, cross_atn_type,
            bert_coef=eeg_model_coef, dtype="float32",
        )
        if bert_config is not None:
            fc = dataclasses.replace(fc, bert_config=bert_config)
        params = load_torch_checkpoint(checkpoint, fc)
        # Guard against a vocab mismatch between checkpoint and data: XLA
        # clamps out-of-range gathers silently, which would produce garbage
        # metrics instead of an error (e.g. a compact-vocab checkpoint fed
        # full-vocab ids — exported checkpoints are full-vocab by contract,
        # but a user may point at an internal/partial artifact).
        if "bert" in params:
            rows = int(np.shape(params["bert"]["embeddings"]["word"])[0])
            for stream, is_txt in (
                (data.eeg_input, multimodal_type[0] == "t"),
                (data.act_input, multimodal_type[1] == "t"),
            ):
                if is_txt and int(np.max(stream)) >= rows:
                    raise ValueError(
                        f"token id {int(np.max(stream))} out of range for the "
                        f"checkpoint's {rows}-row embedding table — the "
                        "checkpoint was trained on a different (compact?) "
                        "vocabulary than this data tree"
                    )
        tc = TrainConfig(
            batch_size=self.batch_size, compute_dtype=self.compute_dtype,
            n_eval=n_eval,
        )
        steps = StepFunctions(fc, tc)
        key = set_seed(seed)
        idx, w = epoch_indices(key, len(data), self.batch_size, shuffle=False)
        loss, acc, preds, labels, scores, ws = steps.eval_epoch(
            params, data.device_put(), idx, w, epsilon, key
        )
        sel = np.asarray(ws) > 0
        preds_np = np.asarray(preds)[sel]
        labels_np = np.asarray(labels)[sel]
        out = {
            "loss": float(loss),
            "accuracy": float((preds_np == labels_np).mean()),
            "f1": float(M.f1_binary(preds_np, labels_np)),
            "predictions": preds_np,
            "labels": labels_np,
            "scores": np.asarray(scores)[sel],
        }
        if out_csv:
            os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
            with open(out_csv, "w") as f:
                f.write("index,prediction,label,score\n")
                for i, (p, l, s) in enumerate(
                    zip(out["predictions"], out["labels"], out["scores"])
                ):
                    f.write(f"{i},{int(p)},{int(l)},{float(s):.6f}\n")
        return out
