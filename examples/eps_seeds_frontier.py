"""The BASELINE.json frontier — eps {0.1,1,3,5,10} x seeds — as ONE program.

The reference's privacy-budget experiments are single-seed (seed 980616
reset before every run, base_train.py:23-43); its alpha-sweep figure plots
mean±std across runs (plot.py:22-81). This driver runs the full eps x seeds
grid as vmapped members of one XLA program (train/sweep.py), reports
mean±std per eps, and regenerates the frontier figure with error bands —
the seed-variance evidence VERDICT r2 asked for behind every remaining
"encoder ceiling" gap claim.

Usage:
  python examples/eps_seeds_frontier.py --run_dir /tmp/r3_reg1 \
      --data_root /tmp/user_tree --out /tmp/eps_seeds
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
from eeg_multimodal_tpu.train.sweep import SweepRunner, privacy_utility_frontier
from eeg_multimodal_tpu.train.trainer import TrainConfig
from eeg_multimodal_tpu.visualization.plot import plot_privacy_utility_seeds

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/r3_reg1",
               help="pretrain_finetune output (bert_mlm.pickle + compact_vocab.npz)")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/eps_seeds")
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--batch_size", type=int, default=8)
p.add_argument("--learning_rate", type=float, default=1e-6)
p.add_argument("--seeds", default="980616,1,2")
p.add_argument("--epsilons", default="0.1,1.0,3.0,5.0,10.0")
p.add_argument("--members_in_flight", type=int, default=5,
               help="axon remote-compile rejects the 10-member payload")
p.add_argument("--figure", default=None,
               help="output figure path (default <out>/frontier_seeds.png)")
args = p.parse_args()

bert_params = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))

job = TrainAndTest(data_root=args.data_root)
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
train, test = truncate_pair(train, test)
train = remap_pairing(train, vocab)
test = remap_pairing(test, vocab)

epsilons = [float(e) for e in args.epsilons.split(",")]
seeds = [int(s) for s in args.seeds.split(",")]
members = privacy_utility_frontier(epsilons, seeds)

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
    log_root=os.path.join(args.out, "logs", "eps_seeds_frontier"),
)
wall = time.time() - t0

# mean±std per eps across seeds
by_eps = {}
for m, r in zip(members, results):
    best = r["best"] or max(r["history"], key=lambda h: h["f1"])
    by_eps.setdefault(m.epsilon, []).append(
        {"seed": m.seed, "best_acc": best["test_acc"],
         "best_f1": best["f1"], "epoch": best["epoch"]}
    )
summary = []
for e in epsilons:
    accs = np.array([r["best_acc"] for r in by_eps[e]])
    f1s = np.array([r["best_f1"] for r in by_eps[e]])
    summary.append({
        "eps": e, "n_seeds": len(accs),
        "acc_mean": round(float(accs.mean()), 4),
        "acc_std": round(float(accs.std(ddof=1)), 4),
        "f1_mean": round(float(f1s.mean()), 4),
        "f1_std": round(float(f1s.std(ddof=1)), 4),
        "per_seed": by_eps[e],
    })
    per_seed = " ".join("%.3f" % r["best_acc"] for r in by_eps[e])
    print(
        f"eps {e:6.2f}: acc {accs.mean():.3f} ± {accs.std(ddof=1):.3f} "
        f"f1 {f1s.mean():.3f} ± {f1s.std(ddof=1):.3f} (seeds: {per_seed})",
        flush=True,
    )
print(f"[frontier] {len(members)} members x {args.epochs} epochs in {wall:.0f}s",
      flush=True)

os.makedirs(args.out, exist_ok=True)
with open(os.path.join(args.out, "frontier_seeds.json"), "w") as f:
    json.dump({"wall_s": wall, "summary": summary}, f, indent=1)

# the reference's recorded best accs at the nearest grid points
# (python/logs/compare_privacy_budget/eps_list + eps_representative)
REF = {0.1: 0.956, 1.0: 0.987, 3.0: 0.990, 5.0: 0.988, 10.0: 0.988}
fig = args.figure or os.path.join(args.out, "frontier_seeds.png")
plot_privacy_utility_seeds(
    epsilons,
    [s["acc_mean"] for s in summary],
    [s["acc_std"] for s in summary],
    fig,
    reference={e: REF[e] for e in epsilons if e in REF},
)
print(f"[frontier] figure: {fig}", flush=True)
