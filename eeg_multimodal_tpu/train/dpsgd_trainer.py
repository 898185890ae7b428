"""The DP-SGD training regime (ref: base_train.py:258-434, dp_mode='DPSGD').

Reference behavior: TICA_DPSGD model (2-modal concat trunk, no feature DP),
all params frozen except [last BERT layer, pooler, fc_layers, visual_encoder,
classifier], Opacus make_private_with_epsilon (delta=1/len(loader),
max_grad_norm=0.1), Adam at 1e-6, 50 epochs, per-epoch eval + best-F1
checkpoint in the same record format.

TPU-native: sigma from our RDP accountant, per-example grads via vmap(grad)
restricted to the trainable subtree, the whole epoch as one jitted lax.scan
over Poisson-sampled fixed-width batches.
"""
from __future__ import annotations

import math
import time
from typing import Any, Dict, Optional

import jax
import numpy as np
import optax

from ..data.datasets import MultiModalArrays, epoch_indices, gather_batch
from ..dp import dpsgd
from ..models import fusion
from ..utils.seeding import key_chain, set_seed
from ..utils.trees import tree_partition
from . import checkpoint as ckpt
from . import metrics as M
from .records import RunRecorder
from .trainer import StepFunctions, TrainConfig


class DPSGDTrainer:
    def __init__(
        self,
        fusion_cfg: fusion.FusionConfig,
        dp_cfg: dpsgd.DPSGDConfig,
        params=None,
        bert_params=None,
    ):
        assert fusion_cfg.dp_mode == "DPSGD"
        self.fusion_cfg = fusion_cfg
        self.dp_cfg = dp_cfg
        self.root_key = set_seed()
        if params is None:
            params = fusion.init(key_chain(self.root_key, "init"), fusion_cfg, bert_params)
        self.params = params
        self.n_bert_layers = fusion_cfg.bert_cfg().num_layers
        self.optimizer = optax.adam(dp_cfg.learning_rate)
        # eval reuses the standard step functions (deterministic forward)
        self.eval_steps = StepFunctions(
            fusion_cfg, TrainConfig(batch_size=dp_cfg.batch_size)
        )
        self._epoch_jit = None

    def _example_loss(self, params, example, rng):
        batch = {k: v[None] for k, v in example.items() if k != "labels"}
        batch["labels"] = example["labels"][None]
        logits = fusion.apply(
            params, batch, self.fusion_cfg, 0.0, hard=True, rng=rng, train=True
        )
        return M.cross_entropy(logits, batch["labels"])[0]

    def fit(
        self,
        train_data: MultiModalArrays,
        test_data: MultiModalArrays,
        log_path: Optional[str] = None,
        model_path: Optional[str] = None,
        echo: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.dp_cfg
        n = len(train_data)
        sigma, q, delta, steps_per_epoch = dpsgd.make_private(n, cfg)
        if echo:
            print(
                f"DP-SGD: sigma={sigma:.3f} q={q:.5f} delta={delta:.5f} "
                f"steps/epoch={steps_per_epoch} (target eps={cfg.target_epsilon})"
            )
        mean = n * q
        b_max = int(mean + 6 * math.sqrt(max(mean * (1 - q), 1.0))) + 1
        pred = lambda p: dpsgd.trainable_predicate(p, self.n_bert_layers)

        step_fn = dpsgd.make_dpsgd_step(
            self._example_loss, pred, self.optimizer, sigma,
            cfg.max_grad_norm, cfg.batch_size,
        )

        trainable, _ = tree_partition(self.params, pred)
        opt_state = self.optimizer.init(trainable)

        def epoch_fn(params, opt_state, data, key):
            step_keys = jax.random.split(key, steps_per_epoch)

            def one_step(carry, sk):
                params, opt_state = carry
                k_sel, k_step, k_fwd = jax.random.split(sk, 3)
                idx, w = dpsgd.poisson_batch_indices(k_sel, n, q, b_max)
                batch = gather_batch(data, idx)
                params, opt_state = step_fn(params, opt_state, batch, w, k_step)
                # batch train metrics (post-update fwd would double cost;
                # use a cheap weighted forward on the sampled batch)
                logits = fusion.apply(
                    params, batch, self.fusion_cfg, 0.0, hard=True,
                    rng=k_fwd, train=False,
                )
                loss, acc, _, _ = M.cal_loss(logits, batch["labels"], w)
                return (params, opt_state), (loss, acc)

            (params, opt_state), (losses, accs) = jax.lax.scan(
                one_step, (params, opt_state), step_keys
            )
            return params, opt_state, losses.mean(), accs.mean()

        epoch_jit = jax.jit(epoch_fn)

        recorder = RunRecorder(log_path, echo=echo) if log_path else None
        train_dev = train_data.device_put()
        test_dev = test_data.device_put()
        f1_best = 0.5
        history = []
        best = None
        params = self.params

        for epoch in range(cfg.epochs):
            t0 = time.time()
            ek = jax.random.fold_in(key_chain(self.root_key, "dpsgd_epoch"), epoch)
            k_train, k_eval = jax.random.split(ek)
            params, opt_state, tr_loss, tr_acc = epoch_jit(
                params, opt_state, train_dev, k_train
            )
            eidx, ew = epoch_indices(k_eval, len(test_data), cfg.batch_size, shuffle=False)
            te_loss, te_acc, preds, labels, _, ws = self.eval_steps.eval_epoch(
                params, test_dev, eidx, ew, 0.0, k_eval
            )
            sel = np.asarray(ws) > 0
            f1 = M.f1_binary(np.asarray(preds)[sel], np.asarray(labels)[sel])
            jax.block_until_ready(te_loss)
            dt = time.time() - t0
            row = dict(
                epoch=epoch + 1, train_loss=float(tr_loss), train_acc=float(tr_acc),
                test_loss=float(te_loss), test_acc=float(te_acc), f1=float(f1),
                time_cost=dt, sigma=sigma, delta=delta,
            )
            history.append(row)
            rec = None
            if recorder:
                rec = recorder.epoch(
                    epoch, tr_loss, tr_acc, te_loss, te_acc, f1, dt,
                    extra={"sigma": sigma, "delta": delta},
                )
            if f1 > f1_best:
                f1_best = f1
                best = row
                if model_path:
                    ckpt.save_torch_checkpoint(model_path, params, self.fusion_cfg)
                if recorder and rec:
                    recorder.best_record(rec)

        self.params = params
        return {
            "history": history, "best": best, "f1_best": f1_best,
            "sigma": sigma, "delta": delta,
        }
