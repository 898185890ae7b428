"""Multi-seed ablation of the non-private ceiling (VERDICT r2 items 3+4).

The reference's NDP / EqualWeight cells record 0.993
(python/logs/compare_private_scheme/{NDP,lapacian_dropout_equal_weight}/
best_record.txt) on pretrained HF BERT. The weights-free encoder
(MLM + row-value-regression pretext) reaches ~0.97x; this driver measures
whether that gap is seed noise or a real encoder ceiling: each regime runs
as a vmapped multi-seed sweep at the flagship 120-epoch budget, reporting
mean ± std of the best accuracy.

Usage:
  python examples/ndp_seeds_ablation.py --run_dir /tmp/r3_reg1 \
      --data_root /tmp/user_tree --out /tmp/ndp_seeds
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np

from eeg_multimodal_tpu.data.compact_vocab import CompactVocab, remap_pairing
from eeg_multimodal_tpu.data.datasets import truncate_pair
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.models.bert import BertConfig
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree
from eeg_multimodal_tpu.train.sweep import SweepMember, SweepRunner
from eeg_multimodal_tpu.train.trainer import TrainConfig

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/r3_reg1")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/ndp_seeds")
p.add_argument("--epochs", type=int, default=120)
p.add_argument("--seeds", default="980616,1,2")
args = p.parse_args()

bert_params = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))

job = TrainAndTest(data_root=args.data_root)
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
train, test = truncate_pair(train, test)
train = remap_pairing(train, vocab)
test = remap_pairing(test, vocab)

seeds = [int(s) for s in args.seeds.split(",")]
summary = {}
for regime in ("NDP", "lapacian_dropout_equal_weight"):
    fc = dataclasses.replace(
        fusion.config_for("ti", regime),
        bert_config=BertConfig(vocab_size=vocab.size),
    )
    tc = TrainConfig(epochs=args.epochs, compute_dtype="bfloat16")
    members = [SweepMember(0.1, seed=s, label=f"{regime}_seed{s}")
               for s in seeds]
    runner = SweepRunner(fc, tc, members, bert_params=bert_params,
                         max_members_in_flight=5)
    t0 = time.time()
    results = runner.run(
        train, test, log_root=os.path.join(args.out, "logs", regime),
    )
    accs, f1s, rows = [], [], []
    for m, r in zip(members, results):
        best = r["best"] or max(r["history"], key=lambda h: h["f1"])
        accs.append(best["test_acc"])
        f1s.append(best["f1"])
        rows.append({"seed": m.seed, "best_acc": best["test_acc"],
                     "best_f1": best["f1"], "epoch": best["epoch"]})
    accs, f1s = np.array(accs), np.array(f1s)
    summary[regime] = {
        "acc_mean": round(float(accs.mean()), 4),
        "acc_std": round(float(accs.std(ddof=1)), 4),
        "acc_max": round(float(accs.max()), 4),
        "f1_mean": round(float(f1s.mean()), 4),
        "per_seed": rows, "wall_s": round(time.time() - t0, 1),
    }
    per_seed = " ".join("%.3f" % a for a in accs)
    print(f"[{regime}] acc {accs.mean():.3f} ± {accs.std(ddof=1):.3f} "
          f"(max {accs.max():.3f}; seeds: {per_seed}; ref 0.993)", flush=True)

os.makedirs(args.out, exist_ok=True)
with open(os.path.join(args.out, "summary.json"), "w") as f:
    json.dump(summary, f, indent=1)
