"""Drive the encoder-init grid with per-coef MLM-pretrained encoders.

Reference (BASELINE.md row: uncased+ViT-B/32 0.980 · uncased+ViT-B/16 0.979
· cased+ViT-B/32 0.977 · cased+ViT-B/16 0.977 · resnet34 ~0.69 at eps=0.1,
python/logs/compare_model_ini_wight/*/best_record.txt) — each cell starts
from the named *pretrained* HF/CLIP weights. Weights-free counterpart: the
bert-base-uncased cells reuse the acc_run2 MLM encoder; the bert-base-cased
cells get their OWN MLM encoder pretrained on the cased token pickles
(synthetic cased vocab — the cased ids are a different space, so the
uncased encoder's word table would not apply).

Usage:
  python examples/compare_init_weight_pretrained.py --run_dir /tmp/acc_run2 \
      --data_root /tmp/user_tree --out /tmp/init_grid
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np

from eeg_multimodal_tpu.data import datasets as D
from eeg_multimodal_tpu.data.compact_vocab import CompactVocab, build_compact_vocab
from eeg_multimodal_tpu.experiments.drivers import CompareModelInitWeight
from eeg_multimodal_tpu.models import bert as bert_mod
from eeg_multimodal_tpu.train import mlm
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree, save_pytree

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/acc_run2",
               help="uncased MLM artifacts (bert_mlm.pickle + compact_vocab.npz)")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/init_grid")
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--cased_mlm_steps", type=int, default=4000)
p.add_argument("--row_reg_weight", type=float, default=0.0,
               help="joint row-value-regression pretext for the cased "
                    "encoder (vocab-independent — lifts the synthetic-vocab "
                    "cells; the uncased cells inherit whatever pretext the "
                    "--run_dir encoder was trained with)")
args = p.parse_args()

os.makedirs(args.out, exist_ok=True)


def expanded_encoder(bert_params, vocab):
    emb = dict(bert_params["embeddings"])
    emb["word"] = vocab.expand_embeddings(np.asarray(emb["word"]))
    return {**bert_params, "embeddings": emb}


# uncased: reuse the flagship MLM encoder
encoders = {}
encoders["bert-base-uncased"] = expanded_encoder(
    load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle")),
    CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz")),
)

# cased: pretrain an encoder on the cased pickles (their own id space)
cased_ckpt = os.path.join(args.out, "bert_mlm_cased.pickle")
if os.path.exists(cased_ckpt):
    encoders["bert-base-cased"] = load_pytree(cased_ckpt)
else:
    emb_root = os.path.join(args.data_root, "data", "embedding")
    corpus = [
        D.load_bert_pickle(os.path.join(
            emb_root, modal, "txt", "bert_bert_base_cased", "train.pickle"
        ))
        for modal in ("EEG", "act")
    ]
    test_streams = [
        D.load_bert_pickle(os.path.join(
            emb_root, modal, "txt", "bert_bert_base_cased", "test.pickle"
        ))["input_ids"]
        for modal in ("EEG", "act")
    ]
    ids, mask = mlm.build_corpus(corpus)
    # vocab over BOTH splits in the cased coef's own id space
    cased_full = bert_mod.BertConfig.for_coef("bert-base-cased").vocab_size
    vocab = build_compact_vocab(
        [d["input_ids"] for d in corpus] + test_streams,
        full_vocab=cased_full,
    )
    print(f"[cased] compact size {vocab.size}", flush=True)
    ids = vocab.remap(ids)
    vals = vmask = None
    n_values = 0
    if args.row_reg_weight:
        per_modal = [
            mlm.load_row_values(os.path.join(
                args.data_root, "data", "processed", f"train_{modal}.csv"
            ))
            for modal in ("EEG", "act")
        ]
        vals, vmask = mlm.build_value_targets(per_modal)
        n_values = vals.shape[1]
    cfg = mlm.MLMConfig(
        batch_size=128, total_steps=args.cased_mlm_steps,
        warmup_steps=max(50, args.cased_mlm_steps // 20),
        mask_id=vocab.mask_id, cls_id=vocab.cls_id, sep_id=vocab.sep_id,
        pad_id=vocab.pad_id, row_reg_weight=args.row_reg_weight,
    )
    pre = mlm.MLMPretrainer(bert_mod.BertConfig(vocab_size=vocab.size), cfg,
                            n_values=n_values)
    params, _ = pre.fit(ids, mask, corpus_vals=vals, corpus_val_mask=vmask)
    encoders["bert-base-cased"] = expanded_encoder(params, vocab)
    save_pytree(cased_ckpt, encoders["bert-base-cased"])

for txt_coef, bert in encoders.items():
    job = TrainAndTest(epochs=args.epochs, data_root=args.data_root,
                       artifacts_root=args.out, bert_params=bert)
    drv = CompareModelInitWeight(python_job=job)
    for cfg in drv.configs():
        if cfg["eeg_model_coef"] != txt_coef:
            continue
        print(f"[grid] {cfg['path_suffix']}", flush=True)
        job.train(**cfg)
