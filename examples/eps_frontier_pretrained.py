"""The reference's full 20-point privacy-budget sweep as ONE vmapped program.

Reference: compare_privacy_budget.py:50-56 runs eps = logspace(log10(0.01),
log10(5.0), 20) as twenty sequential 50-epoch trainings (its committed logs:
python/logs/compare_privacy_budget/eps_list/<eps>/best_record.txt, best acc
0.679 at eps=0.01 rising to ~0.99 by eps~1). Here the whole grid trains as
vmapped members of one XLA program on one chip, starting from the
MLM-pretrained encoder (examples/pretrain_finetune.py), on the compact
vocabulary (exact remap).

Usage:
  python examples/eps_frontier_pretrained.py --run_dir /tmp/acc_run2 \
      --data_root /tmp/user_tree --out /tmp/eps_frontier
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
p.add_argument("--run_dir", default="/tmp/acc_run2",
               help="pretrain_finetune output (bert_mlm.pickle + compact_vocab.npz)")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/eps_frontier")
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--batch_size", type=int, default=8)
p.add_argument("--learning_rate", type=float, default=1e-6)
p.add_argument("--members_in_flight", type=int, default=5,
               help="members per vmapped chunk; the axon remote-compile "
                    "tunnel rejects the 10-member program's payload (HTTP "
                    "413), 5 compiles and flies")
args = p.parse_args()

bert_params = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))

job = TrainAndTest(data_root=args.data_root)
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
train, test = truncate_pair(train, test)
train = remap_pairing(train, vocab)
test = remap_pairing(test, vocab)

# the exact reference grid (compare_privacy_budget.py:50)
eps_grid = np.around(np.logspace(np.log10(0.01), np.log10(5.0), 20), 3)
members = [SweepMember(float(e), label=str(e)) for e in eps_grid]

fc = dataclasses.replace(
    fusion.config_for("ti", "lapacian_dropout"),
    bert_config=BertConfig(vocab_size=vocab.size),
)
tc = TrainConfig(
    batch_size=args.batch_size, learning_rate=args.learning_rate,
    epochs=args.epochs, compute_dtype="bfloat16",
)
runner = SweepRunner(fc, tc, members, bert_params=bert_params,
                     max_members_in_flight=args.members_in_flight)

t0 = time.time()
results = runner.run(
    train, test,
    log_root=os.path.join(args.out, "logs", "compare_privacy_budget", "eps_list"),
)
wall = time.time() - t0

rows = []
for m, r in zip(members, results):
    best = r["best"] or max(r["history"], key=lambda h: h["f1"])
    rows.append({"eps": m.epsilon, "best_acc": round(best["test_acc"], 3),
                 "best_f1": round(best["f1"], 3), "epoch": best["epoch"]})
    print(f"eps {m.epsilon:7.3f}  best acc {best['test_acc']:.3f} "
          f"f1 {best['f1']:.3f} @ epoch {best['epoch']}", flush=True)
print(f"[frontier] 20 members x {args.epochs} epochs in {wall:.0f}s", flush=True)
with open(os.path.join(args.out, "frontier.json"), "w") as f:
    json.dump({"wall_s": wall, "rows": rows}, f, indent=1)
