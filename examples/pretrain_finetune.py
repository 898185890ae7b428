"""Weights-free accuracy parity: domain MLM pretraining -> DP-MLD fine-tune.

The reference's headline (acc 0.956 / F1 0.967 at eps=0.1,
python/logs/demo/DPMLD/best_record.txt) starts from pretrained HF BERT
(models.py:40). Zero-egress substitute: pretrain the same BERT-base encoder
with masked-language modelling on the serialized sensor-row corpus (the
train split's EEG + act texts, tokenized exactly as get_embedding.py:113-116),
then run the faithful alternating-optimizer DP-MLD fine-tune.

Uses the compact vocabulary (data/compact_vocab.py): the corpus touches only
~216 of bert-base-uncased's 30522 ids, so the embedding table, MLM softmax
and Adam traffic all shrink ~140x with bitwise-identical forward semantics.

Usage:
  python examples/pretrain_finetune.py --data_root /tmp/user_tree \
      --out /tmp/mlm_run --mlm_steps 3000 --epsilon 0.1
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np

from eeg_multimodal_tpu.data import datasets as D
from eeg_multimodal_tpu.data.compact_vocab import build_compact_vocab, remap_pairing
from eeg_multimodal_tpu.models import bert as bert_mod
from eeg_multimodal_tpu.train import mlm
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import save_pytree, load_pytree

p = argparse.ArgumentParser()
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/mlm_run")
p.add_argument("--mlm_steps", type=int, default=3000)
p.add_argument("--mlm_batch", type=int, default=128)
p.add_argument("--mlm_lr", type=float, default=1e-4)
p.add_argument("--epsilon", type=float, default=0.1)
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--learning_rate", type=float, default=1e-6)
p.add_argument("--batch_size", type=int, default=8)
p.add_argument("--bert_ckpt", default=None,
               help="skip MLM, load pretrained bert params from this pickle")
p.add_argument("--path_suffix", default="DPMLD/")
p.add_argument("--compute_dtype", default="bfloat16")
args = p.parse_args()

os.makedirs(args.out, exist_ok=True)

# ---------------------------------------------------------------------------
# 1. Data: ti pairing + the MLM corpus (train-split EEG + act texts)
# ---------------------------------------------------------------------------
job = TrainAndTest(
    batch_size=args.batch_size, learning_rate=args.learning_rate,
    epochs=args.epochs, data_root=args.out, compute_dtype=args.compute_dtype,
)
job.data_root = args.data_root
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
job.data_root = args.out  # logs/checkpoints go under the run dir
train, test = D.truncate_pair(train, test)

emb_root = os.path.join(args.data_root, "data", "embedding")
corpus_dicts = []
for modal in ("EEG", "act"):
    corpus_dicts.append(
        D.load_bert_pickle(
            os.path.join(emb_root, modal, "txt", "bert_bert_base_uncased", "train.pickle")
        )
    )
corpus_ids, corpus_mask = mlm.build_corpus(corpus_dicts)

# compact vocab from the TRAIN split only (test ids verified subset)
vocab = build_compact_vocab([d["input_ids"] for d in corpus_dicts])
print(f"[vocab] compact size {vocab.size} (full 30522)", flush=True)
vocab.save(os.path.join(args.out, "compact_vocab.npz"))
corpus_ids = vocab.remap(corpus_ids)
train = remap_pairing(train, vocab)
test = remap_pairing(test, vocab)

bert_cfg = bert_mod.BertConfig(vocab_size=vocab.size)

# ---------------------------------------------------------------------------
# 2. MLM pretraining (or load a previous run's encoder)
# ---------------------------------------------------------------------------
if args.bert_ckpt:
    bert_params = load_pytree(args.bert_ckpt)
    print(f"[mlm] loaded encoder from {args.bert_ckpt}", flush=True)
else:
    mlm_cfg = mlm.MLMConfig(
        batch_size=args.mlm_batch,
        learning_rate=args.mlm_lr,
        total_steps=args.mlm_steps,
        warmup_steps=max(50, args.mlm_steps // 20),
        mask_id=vocab.mask_id, cls_id=vocab.cls_id,
        sep_id=vocab.sep_id, pad_id=vocab.pad_id,
    )
    t0 = time.time()
    pre = mlm.MLMPretrainer(bert_cfg, mlm_cfg)
    bert_params, history = pre.fit(corpus_ids, corpus_mask)
    print(f"[mlm] done in {time.time()-t0:.0f}s final loss {history[-1]['loss']:.4f}", flush=True)
    save_pytree(os.path.join(args.out, "bert_mlm.pickle"), bert_params)
    with open(os.path.join(args.out, "mlm_history.json"), "w") as f:
        json.dump(history, f)

# ---------------------------------------------------------------------------
# 3. DP-MLD fine-tune (faithful TrainAndTest path, reference layout records)
# ---------------------------------------------------------------------------
job.bert_params = bert_params
result = job.train_on(
    train, test, "demo", args.path_suffix, "ti", "lapacian_dropout",
    epsilon=args.epsilon, bert_config=bert_cfg,
)
best = result["best"]
print(
    f"[finetune] BEST epoch {best['epoch'] if best else '-'}: "
    f"acc {best['test_acc'] if best else 0:.3f} f1 {result['f1_best']:.3f}",
    flush=True,
)
