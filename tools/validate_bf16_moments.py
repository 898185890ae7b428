"""Accuracy validation of bf16 Adam moment storage (ops/optim.py).

Reruns the flagship frontier member (ti, lapacian_dropout, eps=0.1, seed
980616, 50 epochs, row-reg-pretext encoder — the exact config whose f32-
moment run recorded best acc 0.980 / F1 0.986 in
examples/logs/eps_seeds_frontier/eps0.1_seed980616/) with BOTH Adam moments
stored in bf16, and reports the delta. A match within seed noise (±0.013 at
this eps, ACCURACY.md item 13) licenses the bf16-moments bench configuration.

Run on the TPU:
  python tools/validate_bf16_moments.py --run_dir /tmp/r3_reg1 \
      --data_root /tmp/user_tree
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")

from eeg_multimodal_tpu.data.compact_vocab import CompactVocab, remap_pairing
from eeg_multimodal_tpu.data.datasets import truncate_pair
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.models.bert import BertConfig
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree
from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/r3_reg1")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/bf16_moments")
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--epsilon", type=float, default=0.1)
p.add_argument("--seed", type=int, default=980616)
p.add_argument("--moments", choices=["bf16", "f32"], default="bf16",
               help="Adam moment storage; f32 runs the seed-band control "
                    "on the same encoder/tree")
args = p.parse_args()

bert_params = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))

job = TrainAndTest(data_root=args.data_root)
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
train, test = truncate_pair(train, test)
train = remap_pairing(train, vocab)
test = remap_pairing(test, vocab)

fc = dataclasses.replace(
    fusion.config_for("ti", "lapacian_dropout"),
    bert_config=BertConfig(vocab_size=vocab.size),
)
mdt = "bfloat16" if args.moments == "bf16" else "float32"
tc = TrainConfig(
    epochs=args.epochs, seed=args.seed, compute_dtype="bfloat16",
    adam_mu_dtype=mdt, adam_nu_dtype=mdt,
    # EEG_VALIDATE_PRECAST=1 -> validate the FULL bench configuration
    # (bf16 moments + carried bf16 param copy) in one run
    precast_params=bool(os.environ.get("EEG_VALIDATE_PRECAST")),
)
trainer = Trainer(fc, tc, bert_params=bert_params)
res = trainer.fit(
    train, test, args.epsilon,
    log_path=os.path.join(args.out, "logs"),
    model_path=None, echo=False,
)
best = res["best"] or max(res["history"], key=lambda h: h["f1"])
out = {
    "config": {"eps": args.epsilon, "seed": args.seed, "epochs": args.epochs,
               "adam_mu_dtype": mdt, "adam_nu_dtype": mdt,
               "precast_params": tc.precast_params},
    "best_acc": best["test_acc"],
    "best_f1": res["f1_best"],
    "epoch": best["epoch"],
    "f32_reference": {"best_acc": 0.9803, "best_f1": 0.9856, "epoch": 48,
                      "source": "examples/logs/eps_seeds_frontier/eps0.1_seed980616"},
}
os.makedirs(args.out, exist_ok=True)
with open(os.path.join(
        args.out, f"result_{args.moments}_seed{args.seed}.json"), "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1), flush=True)
