"""Legacy-generation trainers: the root-script capabilities, TPU-native.

1. :class:`MetricTrainer` — ref train.py: argparse-config trainer with
   n_para gradient-accumulation repeats (train.py:109-113, sum-reduced loss),
   eval every `interval` epochs with **n_eval stochastic repeats** per batch
   (train.py:126-138) vmapped over PRNG keys, a dynamic metric registry
   (train.py:79-80), results-dict accumulation saved every epoch
   (results.pth-equivalent pickle, train.py:144-145), DP-param history, and a
   best-Accuracy checkpoint (train.py:141-143).

2. :class:`PriGumbelPretrainer` — ref train_val.py pretrain(): the legacy
   ConcatModel head with learnable w + scaled Gumbel dropout + per-sample
   Laplace (train_val.py:125-158), trained with the privacy-regularized loss
   ``alpha * CE + max((1-w) e^eps + w)`` (train_val.py:80-93), recording
   privacy-budget / dropout-rate max & mean per epoch (train_val.py:222-226)
   and pickling the 7 curve lists to result.pkl (train_val.py:275-277).

3. :func:`alpha_sweep` — ref train_val.py:524-543: alpha over
   exp(linspace(log 1e-2, log 2? -- the reference uses linspace(log(0.01),
   2, 50) in log space)) — reproduced verbatim.
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.datasets import MultiModalArrays, epoch_indices, gather_batch
from ..models import fusion
from ..ops import dp as dp_ops
from ..utils.seeding import key_chain, set_seed
from . import checkpoint as ckpt
from . import metrics as M


@dataclasses.dataclass(frozen=True)
class MetricTrainConfig:
    """ref train.py:29-47 argparse surface."""

    exp: str = "test"
    name: str = "test"
    batch_size: int = 8
    eps: float = 2.0
    n_class: int = 2
    n_dp: int = 1
    n_para: int = 1
    n_eval: int = 5
    n_epochs: int = 50
    interval: int = 1
    metrics: str = "Accuracy"  # CSV of registry names (train.py:45)
    learning_rate: float = 1e-6
    seed: int = 980616


class MetricTrainer:
    def __init__(self, fusion_cfg: fusion.FusionConfig, cfg: MetricTrainConfig,
                 params=None, bert_params=None):
        self.fusion_cfg = fusion_cfg
        self.cfg = cfg
        self.root_key = set_seed(cfg.seed)
        self.params = params if params is not None else fusion.init(
            key_chain(self.root_key, "init"), fusion_cfg, bert_params
        )
        self.optimizer = optax.adam(cfg.learning_rate)
        self.opt_state = self.optimizer.init(self.params)
        self.metric_fns = {
            name: M.METRICS[name] for name in cfg.metrics.split(",")
        }
        self._train_jit = jax.jit(self._train_epoch)
        self._eval_jit = jax.jit(self._eval_epoch)

    def _loss(self, params, batch, weight, rng):
        logits = fusion.apply(
            params, batch, self.fusion_cfg, self.cfg.eps, hard=True,
            rng=rng, train=True,
        )
        ce = M.cross_entropy(logits, batch["labels"])
        # train.py:110-112: reduction='none' then .sum()
        return (ce * weight).sum(), logits

    def _train_epoch(self, params, opt_state, data, idx, weight, key):
        keys = jax.random.split(key, idx.shape[0])

        def step(carry, xs):
            params, opt_state = carry
            b_idx, w, sk = xs
            batch = gather_batch(data, b_idx)
            # n_para repeats accumulate grads before one optimizer step
            # (train.py:108-113)
            grads = None
            total = 0.0
            for r in range(self.cfg.n_para):
                (loss, _), g = jax.value_and_grad(self._loss, has_aux=True)(
                    params, batch, w, jax.random.fold_in(sk, r)
                )
                grads = g if grads is None else jax.tree_util.tree_map(
                    jnp.add, grads, g
                )
                total = total + loss
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), total / self.cfg.n_para

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (idx, weight, keys)
        )
        return params, opt_state, losses

    def _eval_epoch(self, params, data, idx, weight, key):
        """n_eval stochastic repeats per batch, vmapped over keys
        (replaces train.py:126-138's Python repeat loop)."""
        n_batches = idx.shape[0]
        keys = jax.random.split(key, n_batches * self.cfg.n_eval).reshape(
            n_batches, self.cfg.n_eval, -1
        )

        def one_batch(_, xs):
            b_idx, w, ks = xs
            batch = gather_batch(data, b_idx)

            def one_repeat(k):
                logits = fusion.apply(
                    params, batch, self.fusion_cfg, self.cfg.eps, hard=True,
                    rng=k, train=False,
                )
                ce = M.cross_entropy(logits, batch["labels"])
                return logits, jnp.argmax(logits, -1), ce

            logits, preds, ces = jax.vmap(one_repeat)(ks)
            return None, (logits, preds, ces, batch["labels"], w)

        _, (logits, preds, ces, labels, ws) = jax.lax.scan(
            one_batch, None, (idx, weight, keys)
        )
        return logits, preds, ces, labels, ws

    def fit(self, train_data: MultiModalArrays, val_data: MultiModalArrays,
            base_path: Optional[str] = None, echo: bool = True) -> Dict[str, Any]:
        cfg = self.cfg
        if base_path is None:
            base_path = f"experiment/{cfg.exp}/{cfg.name}/"
        os.makedirs(base_path, exist_ok=True)
        from ..utils.logging import setup_run_logging

        logger = setup_run_logging(base_path) if echo else None

        train_dev = train_data.device_put()
        val_dev = val_data.device_put()
        results: Dict[str, List] = {k: [] for k in (
            "train_loss", "logits", "pred", "val_loss", "DP_params"
        )}
        for name in self.metric_fns:
            results[name] = []
        results["labels"] = np.asarray(val_data.labels)
        best_acc = 0.0

        for epoch in range(cfg.n_epochs):
            ek = jax.random.fold_in(key_chain(self.root_key, "epoch"), epoch)
            k_sh, k_tr, k_ev = jax.random.split(ek, 3)
            idx, w = epoch_indices(k_sh, len(train_data), cfg.batch_size)
            self.params, self.opt_state, losses = self._train_jit(
                self.params, self.opt_state, train_dev, idx, w, k_tr
            )
            results["train_loss"].append(np.asarray(losses))
            if logger:
                logger.debug(
                    f"Train Epoch: {epoch:3d} loss {float(losses.mean()):.4f}"
                )

            if (epoch + 1) % cfg.interval == 0:
                eidx, ew = epoch_indices(
                    k_ev, len(val_data), cfg.batch_size, shuffle=False
                )
                logits, preds, ces, labels, ws = self._eval_jit(
                    self.params, val_dev, eidx, ew, k_ev
                )
                # (n_batches, n_eval, B, ...) -> (N, n_eval, ...) sample-major
                preds_np = np.asarray(preds).transpose(0, 2, 1).reshape(
                    -1, cfg.n_eval
                )
                sel = np.asarray(ws).reshape(-1) > 0
                preds_np = preds_np[sel]
                labels_np = np.asarray(labels).reshape(-1)[sel]
                results["pred"].append(preds_np)
                results["val_loss"].append(np.asarray(ces))
                info = f"Eval  Epoch: {epoch:3d}"
                for name, fn in self.metric_fns.items():
                    vals = np.asarray([
                        fn(labels_np, preds_np[:, r]) for r in range(cfg.n_eval)
                    ])
                    results[name].append(vals)
                    info += f" | {name}: {vals.mean():5.2f}"
                if "DP" in self.params:
                    results["DP_params"].append(np.asarray(self.params["DP"]))
                if logger:
                    logger.info(info)
                acc = results.get("Accuracy", [[0.0]])[-1].mean()
                if acc > best_acc:
                    best_acc = acc
                    ckpt.save_torch_checkpoint(
                        os.path.join(base_path, "model.pth"),
                        self.params, self.fusion_cfg,
                    )
            # results.pth-equivalent dump every epoch (train.py:144-145)
            with open(os.path.join(base_path, "results.pkl"), "wb") as f:
                pickle.dump(
                    {k: v for k, v in results.items() if k not in ("labels",)}, f
                )
        return {"results": results, "best_acc": best_acc}


# ---------------------------------------------------------------------------
# PriGumbel pretraining (train_val.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PriGumbelConfig:
    tau: float = 0.1  # train_val.py pretrain(tau=...)
    epsilon: float = 0.1
    alpha: float = 1.0
    learning_rate: float = 1e-6
    batch_size: int = 8
    epochs: int = 30  # train_val.py:172
    seed: int = 980616


class PriGumbelPretrainer:
    def __init__(self, fusion_cfg: fusion.FusionConfig, cfg: PriGumbelConfig,
                 params=None, bert_params=None):
        self.fusion_cfg = fusion_cfg
        self.cfg = cfg
        self.root_key = set_seed(cfg.seed)
        if params is None:
            params = fusion.legacy_pri_gumbel_init(
                key_chain(self.root_key, "init"), fusion_cfg, bert_params
            )
        self.params = params
        self.optimizer = optax.adam(cfg.learning_rate)
        self.opt_state = self.optimizer.init(self.params)
        self._train_jit = jax.jit(self._train_epoch)
        self._eval_jit = jax.jit(self._eval_epoch)

    def _loss(self, params, batch, weight, rng, train):
        logits = fusion.legacy_pri_gumbel_apply(
            params, batch, self.fusion_cfg, self.cfg.epsilon, self.cfg.tau,
            rng, train,
        )
        ce, acc, pred, label = M.cal_loss(logits, batch["labels"], weight)
        total = dp_ops.privacy_regularized_loss(
            ce, params["w"], self.cfg.alpha, self.cfg.epsilon
        )
        return total, (acc, pred)

    def _train_epoch(self, params, opt_state, data, idx, weight, key):
        keys = jax.random.split(key, idx.shape[0])

        def step(carry, xs):
            params, opt_state = carry
            b_idx, w, sk = xs
            batch = gather_batch(data, b_idx)
            (loss, (acc, _)), g = jax.value_and_grad(
                self._loss, has_aux=True
            )(params, batch, w, sk, True)
            updates, opt_state = self.optimizer.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, acc)

        (params, opt_state), (losses, accs) = jax.lax.scan(
            step, (params, opt_state), (idx, weight, keys)
        )
        return params, opt_state, losses.mean(), accs.mean()

    def _eval_epoch(self, params, data, idx, weight, key):
        keys = jax.random.split(key, idx.shape[0])

        def step(_, xs):
            b_idx, w, sk = xs
            batch = gather_batch(data, b_idx)
            loss, (acc, pred) = self._loss(params, batch, w, sk, False)
            return None, (loss, acc, pred, batch["labels"], w)

        return jax.lax.scan(step, None, (idx, weight, keys))[1]

    def pretrain(self, train_data, val_data, path: str, echo: bool = True):
        """ref train_val.py pretrain(): epoch loop recording the 7 curve
        lists + privacy stats, result.pkl + best-F1 checkpoint."""
        cfg = self.cfg
        os.makedirs(path, exist_ok=True)
        from .records import RunRecorder

        recorder = RunRecorder(path, echo=echo)
        train_dev = train_data.device_put()
        val_dev = val_data.device_put()
        curves = {k: [] for k in (
            "train_loss", "train_acc", "val_loss", "val_acc", "f1",
            "privacy_budget_max", "privacy_budget_avg",
        )}
        f1_best = 0.5
        for epoch in range(cfg.epochs):
            t0 = time.time()
            ek = jax.random.fold_in(key_chain(self.root_key, "epoch"), epoch)
            k_sh, k_tr, k_ev = jax.random.split(ek, 3)
            idx, w = epoch_indices(k_sh, len(train_data), cfg.batch_size)
            self.params, self.opt_state, tr_loss, tr_acc = self._train_jit(
                self.params, self.opt_state, train_dev, idx, w, k_tr
            )
            eidx, ew = epoch_indices(k_ev, len(val_data), cfg.batch_size, shuffle=False)
            losses, accs, preds, labels, ws = self._eval_jit(
                self.params, val_dev, eidx, ew, k_ev
            )
            sel = np.asarray(ws).reshape(-1) > 0
            f1 = M.f1_binary(
                np.asarray(preds).reshape(-1)[sel],
                np.asarray(labels).reshape(-1)[sel],
            )
            # privacy budget per feature: (1-w) e^eps + w (train_val.py:222-226)
            wv = np.asarray(self.params["w"])
            budget = (1 - wv) * np.exp(cfg.epsilon) + wv
            dt = time.time() - t0
            for k, v in (
                ("train_loss", float(tr_loss)), ("train_acc", float(tr_acc)),
                ("val_loss", float(np.asarray(losses).mean())),
                ("val_acc", float(np.asarray(accs).mean())),
                ("f1", float(f1)),
                ("privacy_budget_max", float(budget.max())),
                ("privacy_budget_avg", float(budget.mean())),
            ):
                curves[k].append(v)
            rec = recorder.epoch(
                epoch, tr_loss, tr_acc, curves["val_loss"][-1],
                curves["val_acc"][-1], f1, dt,
                extra={
                    "privacy_budget_max": curves["privacy_budget_max"][-1],
                    "privacy_budget_avg": curves["privacy_budget_avg"][-1],
                    "alpha": cfg.alpha,
                },
            )
            if f1 > f1_best:
                f1_best = f1
                ckpt.save_torch_checkpoint(
                    os.path.join(path, "best_f1.pickle"),
                    self.params, self.fusion_cfg,
                )
                recorder.best_record(rec)
            with open(os.path.join(path, "result.pkl"), "wb") as f:
                pickle.dump(curves, f)
        return {"curves": curves, "f1_best": f1_best}


def alpha_sweep_values(n: int = 50) -> np.ndarray:
    """ref train_val.py:532: exp(linspace(log(0.01), 2, 50))."""
    return np.exp(np.linspace(np.log(0.01), 2.0, n))
