"""The PriGumbel alpha sweep — the last legacy experiment family without
committed runs.

The reference sweeps the privacy-regularized loss weight alpha over
exp(linspace(log 0.01, 2, 50)) with one full pretrain per alpha
(train_val.py:524-543) and plots mean±std accuracy with the 'Baseline
(Public)' line at 0.94 (plot.py:22-81). This driver runs a subsample of the
SAME grid (every k-th of the reference's 50 values — identical alphas, not a
re-spaced grid) from the row-reg-pretext encoder, then regenerates the
figure: mean = mean val accuracy over the final 10 epochs per alpha, std
across those epochs (the run-to-run band the reference's figure shows).

Usage:
  python examples/alpha_sweep_legacy.py --run_dir /tmp/r3_reg1 \
      --data_root /tmp/user_tree --out /tmp/alpha_sweep --stride 6
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np

from eeg_multimodal_tpu.data.compact_vocab import CompactVocab, remap_pairing
from eeg_multimodal_tpu.data.datasets import truncate_pair
from eeg_multimodal_tpu.experiments.legacy_drivers import AlphaSweep
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.models.bert import BertConfig
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree
from eeg_multimodal_tpu.visualization.plot import plot_alpha_sweep

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/r3_reg1")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/alpha_sweep")
p.add_argument("--stride", type=int, default=6,
               help="run every k-th of the reference's 50 alphas")
p.add_argument("--tail_epochs", type=int, default=10)
args = p.parse_args()

bert_params = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))

job = TrainAndTest(data_root=args.data_root)
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
train, test = truncate_pair(train, test)
train = remap_pairing(train, vocab)
test = remap_pairing(test, vocab)

import dataclasses

fc = dataclasses.replace(
    fusion.config_for("ti", "NDP", dtype="float32"),
    bert_config=BertConfig(vocab_size=vocab.size),
)
sweep = AlphaSweep(
    fusion_cfg=fc,
    out_root=os.path.join(args.out, "PriGumbel", "alpha"),
    bert_params=bert_params,
)
alphas = list(sweep.alphas(50)[:: args.stride])
print(f"[alpha] {len(alphas)} of the reference's 50 alphas "
      f"({alphas[0]:.4f} .. {alphas[-1]:.4f})", flush=True)

results = sweep.run(train, test, alphas=alphas)

means, stds = [], []
for a in alphas:
    acc = np.asarray(results[float(a)]["curves"]["val_acc"][-args.tail_epochs:])
    means.append(float(acc.mean()))
    stds.append(float(acc.std(ddof=1)))
    print(f"[alpha] {a:8.4f}: acc {acc.mean():.3f} ± {acc.std(ddof=1):.3f}",
          flush=True)

summary = {"alphas": [float(a) for a in alphas], "acc_mean": means,
           "acc_std": stds, "tail_epochs": args.tail_epochs}
with open(os.path.join(args.out, "alpha_sweep.json"), "w") as f:
    json.dump(summary, f, indent=1)
fig = os.path.join(args.out, "alpha_sweep.png")
plot_alpha_sweep(alphas, means, stds, fig)
print(f"[alpha] figure: {fig}", flush=True)
