"""Staged training recipe: head-only warmup, then full fine-tune.

Without pretrained encoder weights (zero-egress), training all 110M params
at once from random init stalls at the majority-class plateau (see
ACCURACY.md). This recipe first trains only the non-BERT subtree (visual
encoder, cross-attention, fusion head) — cheap and stable — then unfreezes
everything at a low learning rate.

Usage: python examples/train_staged.py [--data_root /tmp/user_tree]
       [--head_epochs 60] [--full_epochs 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np
import optax

from eeg_multimodal_tpu.data import datasets as D
from eeg_multimodal_tpu.data.datasets import epoch_indices, gather_batch
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train import metrics as M
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.utils.trees import tree_merge, tree_partition

p = argparse.ArgumentParser()
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--head_epochs", type=int, default=60)
p.add_argument("--full_epochs", type=int, default=30)
p.add_argument("--head_lr", type=float, default=1e-4)
p.add_argument("--full_lr", type=float, default=1e-5)
p.add_argument("--epsilon", type=float, default=1.0)
args = p.parse_args()

job = TrainAndTest(data_root=args.data_root)
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
train, test = D.truncate_pair(train, test)
train_dev, test_dev = train.device_put(), test.device_put()

fc = fusion.config_for("ti", "lapacian_dropout", dtype="float32")
params = fusion.init(jax.random.PRNGKey(0), fc)


def make_stage(trainable_pred, lr):
    opt = optax.adam(lr)

    def loss_fn(sub, rest, batch, w, key):
        full = tree_merge(sub, rest)
        logits = fusion.apply(full, batch, fc, args.epsilon, True, key, True)
        loss, acc, _, _ = M.cal_loss(logits, batch["labels"], w)
        return loss, acc

    @jax.jit
    def train_epoch(sub, rest, opt_state, idx, w, key):
        keys = jax.random.split(key, idx.shape[0])

        def step(carry, xs):
            sub, opt_state = carry
            b_idx, bw, k = xs
            batch = gather_batch(train_dev, b_idx)
            (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(
                sub, rest, batch, bw, k
            )
            upd, opt_state = opt.update(g, opt_state, sub)
            sub = optax.apply_updates(sub, upd)
            return (sub, opt_state), (loss, acc)

        (sub, opt_state), (losses, _) = jax.lax.scan(
            step, (sub, opt_state), (idx, w, keys)
        )
        return sub, opt_state, losses.mean()

    @jax.jit
    def eval_epoch(sub, rest, idx, w, key):
        keys = jax.random.split(key, idx.shape[0])

        def step(_, xs):
            b_idx, bw, k = xs
            batch = gather_batch(test_dev, b_idx)
            full = tree_merge(sub, rest)
            logits = fusion.apply(full, batch, fc, args.epsilon, True, k, False)
            loss, acc, pred, lab = M.cal_loss(logits, batch["labels"], bw)
            return None, (acc, pred, lab, bw)

        return jax.lax.scan(step, None, (idx, w, keys))[1]

    return opt, train_epoch, eval_epoch


def run_stage(name, params, trainable_pred, lr, epochs):
    opt, train_epoch, eval_epoch = make_stage(trainable_pred, lr)
    sub, rest = tree_partition(params, trainable_pred)
    opt_state = opt.init(sub)
    key = jax.random.PRNGKey(980616)
    best = (0, 0.0, 0.0)
    for epoch in range(epochs):
        t0 = time.time()
        k = jax.random.fold_in(key, epoch)
        idx, w = epoch_indices(k, len(train), 8)
        sub, opt_state, tl = train_epoch(sub, rest, opt_state, idx, w, k)
        eidx, ew = epoch_indices(k, len(test), 8, shuffle=False)
        accs, preds, labs, ws = eval_epoch(sub, rest, eidx, ew, k)
        sel = np.asarray(ws).reshape(-1) > 0
        f1 = M.f1_binary(
            np.asarray(preds).reshape(-1)[sel], np.asarray(labs).reshape(-1)[sel]
        )
        acc = float(np.asarray(accs).mean())
        if f1 > best[2]:
            best = (epoch + 1, acc, f1)
        if (epoch + 1) % 10 == 0 or epoch == epochs - 1:
            print(
                f"[{name}] epoch {epoch+1}: loss {float(tl):.3f} acc {acc:.3f} "
                f"f1 {f1:.3f} ({time.time()-t0:.1f}s)", flush=True,
            )
    print(f"[{name}] BEST epoch {best[0]}: acc {best[1]:.3f} f1 {best[2]:.3f}", flush=True)
    return tree_merge(sub, rest)


head_pred = lambda p: not p.startswith("bert/")
params = run_stage("head", params, head_pred, args.head_lr, args.head_epochs)
params = run_stage("full", params, lambda p: True, args.full_lr, args.full_epochs)
