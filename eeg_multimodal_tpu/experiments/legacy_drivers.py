"""Legacy root-script drivers: eps_experiment sweep + feawei extraction.

- :func:`eps_experiment_epsilons` / :class:`EpsExperiment` — ref past_acc.py
  __main__ (:254-258): epsilon from round(logspace(log10(0.01), log10(5.0),
  20), 3) selected by index, trained with the alternating-optimizer scheme
  into model_dict/eps_experiment/<eps>/ — here the whole grid can also run
  as ONE vmapped sweep.
- :func:`extract_feawei` — ref past_acc_feawei.py:131-148: run the truncated
  trunk over the train set, dump the (N, 2304) normalized features to
  feawei.pkl for the feature-magnitude DP init.
- :func:`rewrite_val_to_test` — ref 1224.py:12-31: bulk log rewriting
  (Val -> Test) across record trees.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.datasets import MultiModalArrays, epoch_indices, gather_batch
from ..models import fusion
from ..train.sweep import SweepMember, SweepRunner
from ..train.trainer import TrainConfig, Trainer
from ..utils.seeding import set_seed


def eps_experiment_epsilons() -> np.ndarray:
    """round(logspace(log10(0.01), log10(5.0), 20), 3) (past_acc.py:255-256)."""
    return np.around(np.logspace(np.log10(0.01), np.log10(5.0), 20), decimals=3)


class EpsExperiment:
    """ref past_acc.py main2: ConcatModel (== TICA_LapDropout trunk) with the
    alternating optimizers, one run per epsilon index, records under
    model_dict/eps_experiment/<suffix>."""

    def __init__(self, fusion_cfg: Optional[fusion.FusionConfig] = None,
                 train_cfg: Optional[TrainConfig] = None,
                 out_root: str = "model_dict/eps_experiment"):
        self.fusion_cfg = fusion_cfg or fusion.config_for("ti", "lapacian_dropout")
        self.train_cfg = train_cfg or TrainConfig()
        self.out_root = out_root

    def run_index(self, i: int, train_data, test_data, dp_init=None):
        eps = float(eps_experiment_epsilons()[i])
        suffix = f"{eps}/"
        trainer = Trainer(self.fusion_cfg, self.train_cfg)
        if dp_init is not None:
            trainer.params["DP"] = dp_init
        return trainer.fit(
            train_data, test_data, eps,
            log_path=os.path.join(self.out_root, suffix),
            model_path=os.path.join(self.out_root, suffix, "best_f1.pickle"),
        )

    def run_all_vmapped(self, train_data, test_data, log_root=None, **kw):
        """The TPU-native upgrade: all 20 epsilons as one vmapped sweep."""
        members = [
            SweepMember(float(e), label=str(e)) for e in eps_experiment_epsilons()
        ]
        runner = SweepRunner(self.fusion_cfg, self.train_cfg, members, **kw)
        return runner.run(train_data, test_data, log_root=log_root or self.out_root)


def extract_feawei(
    params,
    fusion_cfg: fusion.FusionConfig,
    train_data: MultiModalArrays,
    out_path: Optional[str] = "feawei.pkl",
    batch_size: int = 8,
) -> np.ndarray:
    """Extract the normalized fused features over a split
    (past_acc_feawei.py:131-148). Deterministic (eval-mode trunk)."""
    data = train_data.device_put()
    # params may carry host numpy leaves (pickle-loaded / vocab-expanded
    # trees); numpy arrays cannot be indexed by tracers under jit. They must
    # also enter the jit as an ARGUMENT, not a closure: closure trees are
    # baked into the HLO as literal constants, and a BERT-base tree blows
    # the axon remote-compile payload limit (HTTP 413).
    params = jax.tree_util.tree_map(jnp.asarray, params)
    idx, w = epoch_indices(set_seed(), len(train_data), batch_size, shuffle=False)

    @jax.jit
    def batch_features(p, b_idx):
        batch = gather_batch(data, b_idx)
        return fusion.apply(
            p, batch, fusion_cfg, 0.0, hard=True, rng=None, train=False,
            return_features=True,
        )

    feats: List[np.ndarray] = []
    for b in range(idx.shape[0]):
        f = np.asarray(batch_features(params, idx[b]))
        keep = np.asarray(w[b]) > 0
        feats.append(f[keep])
    out = np.concatenate(feats, axis=0)
    if out_path:
        with open(out_path, "wb") as f:
            pickle.dump(out, f)
    return out


class AlphaSweep:
    """ref train_val.py:524-543: sweep the privacy-regularized loss weight
    alpha over exp(linspace(log 0.01, 2, 50)) with the PriGumbel pretrainer,
    one run per alpha under <out_root>/<alpha>/."""

    def __init__(self, fusion_cfg=None, out_root: str = "model_dict/PriGumbel/alpha",
                 bert_params=None):
        from ..train.legacy import PriGumbelConfig

        self.fusion_cfg = fusion_cfg or fusion.config_for("ti", "NDP")
        self.out_root = out_root
        self.base_cfg = PriGumbelConfig()
        self.bert_params = bert_params

    def alphas(self, n: int = 50):
        from ..train.legacy import alpha_sweep_values

        return alpha_sweep_values(n)

    def run(self, train_data, test_data, n: int = 50, echo: bool = False,
            alphas=None):
        """``alphas`` overrides the grid (e.g. a subsample of the reference's
        50 values); default = the reference's full grid."""
        import dataclasses as dc

        from ..train.legacy import PriGumbelPretrainer

        results = {}
        for alpha in (self.alphas(n) if alphas is None else alphas):
            cfg = dc.replace(self.base_cfg, alpha=float(alpha))
            trainer = PriGumbelPretrainer(self.fusion_cfg, cfg,
                                          bert_params=self.bert_params)
            results[float(alpha)] = trainer.pretrain(
                train_data, test_data,
                path=os.path.join(self.out_root, f"{alpha:.4f}"),
                echo=echo,
            )
        return results


def rewrite_val_to_test(root: str) -> int:
    """Bulk-rewrite 'Val' -> 'Test' in every *record*.txt under root
    (ref 1224.py:12-31). Returns the number of files rewritten."""
    count = 0
    for dirpath, _, files in os.walk(root):
        for name in files:
            if name.endswith(".txt") and "record" in name:
                p = os.path.join(dirpath, name)
                text = open(p).read()
                new = text.replace("Val Loss", "Test Loss").replace(
                    "Val Accuracy", "Test Accuracy"
                )
                if new != text:
                    with open(p, "w") as f:
                        f.write(new)
                    count += 1
    return count
