"""Pretrain -> finetune pipelines and resumable training state.

The reference's legacy flow (main_0425.py / main_0430.py): pretrain the
ConcatModel plainly (``pretrain()``), checkpoint, then resume with
``load_state_dict(..., strict=False)`` (main_0425.py:271, main_0430.py:137-139)
and finetune under a DP scheme ('feature_all_lap' per-sample Laplace, or the
Opacus path). The unified driver (main_0430.py:129-235) switches on
``(pretrain, load_stat)`` flags.

Also here: full-train-state checkpointing every N steps with resume —
SURVEY §5's failure-recovery plan (the reference's only durable state is the
best-F1 params checkpoint).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

from ..data.datasets import MultiModalArrays
from ..models import fusion
from . import checkpoint as ckpt
from .trainer import TrainConfig, Trainer


# ---------------------------------------------------------------------------
# Resumable training state
# ---------------------------------------------------------------------------

def save_train_state(path: str, trainer: Trainer, epoch: int) -> None:
    """Durable full state: params + both optimizer states + epoch index."""
    ckpt.save_pytree(path, {
        "params": trainer.params,
        "dp_os": trainer.dp_os,
        "model_os": trainer.model_os,
        "epoch": epoch,
    })


def load_train_state(path: str, trainer: Trainer) -> int:
    state = ckpt.load_pytree(path)
    trainer.params = state["params"]
    trainer.dp_os = state["dp_os"]
    trainer.model_os = state["model_os"]
    return int(state["epoch"])


class ResumableTrainer(Trainer):
    """Trainer that checkpoints full state every epoch and resumes from the
    latest state file if present (sweep runners skip completed configs by
    its presence — mirrors the reference's os.path.exists log checks,
    visualization/plot.py:147-149)."""

    STATE_FILE = "train_state.pickle"

    def fit(self, train_data, test_data, epsilon, log_path=None,
            model_path=None, echo=True, **kw):
        state_path = os.path.join(log_path, self.STATE_FILE) if log_path else None
        start_epoch = 0
        if state_path and os.path.exists(state_path):
            start_epoch = load_train_state(state_path, self) + 1
            if echo:
                print(f"resuming from epoch {start_epoch}")
        if start_epoch >= self.train_cfg.epochs:
            return {"history": [], "best": None, "f1_best": None,
                    "resumed_complete": True}

        hook = (
            (lambda epoch: save_train_state(state_path, self, epoch))
            if state_path else None
        )
        return super().fit(
            train_data, test_data, epsilon, log_path=log_path,
            model_path=model_path, echo=echo, start_epoch=start_epoch,
            epoch_end_hook=hook,
        )


# ---------------------------------------------------------------------------
# Pretrain -> finetune (main_0430.py's unified train())
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PipelineConfig:
    epsilon: float = 0.1  # finetune DP epsilon (main_0425.py hard-codes 0.1)
    pretrain_epochs: int = 30  # ref train_val.py:172 / main_0425 pretrain
    finetune_epochs: int = 50
    batch_size: int = 8
    learning_rate: float = 1e-6
    compute_dtype: str = "float32"


def pretrain_finetune(
    train_data: MultiModalArrays,
    test_data: MultiModalArrays,
    out_root: str,
    cfg: PipelineConfig = PipelineConfig(),
    bert_params=None,
    echo: bool = True,
    load_stat: Optional[str] = None,
) -> Dict[str, Any]:
    """main_0430.py:129-235 semantics: (1) plain pretrain of the concat
    trunk (dp_mode NDP); (2) finetune with per-sample feature Laplace
    ('feature_all_lap'), initializing from the pretrain checkpoint
    (strict=False tolerant load — extra/missing keys ignored).
    ``load_stat`` skips (1) and loads the given checkpoint instead."""
    pre_cfg = fusion.config_for("ti", "NDP", dtype=cfg.compute_dtype)
    fin_cfg = fusion.config_for("ti", "feature_all_lap", dtype=cfg.compute_dtype)

    if load_stat is None:
        pre_trainer = Trainer(
            pre_cfg,
            TrainConfig(batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
                        epochs=cfg.pretrain_epochs, compute_dtype=cfg.compute_dtype),
            bert_params=bert_params,
        )
        pre_out = pre_trainer.fit(
            train_data, test_data, epsilon=0.0,
            log_path=os.path.join(out_root, "pretrain"),
            model_path=os.path.join(out_root, "pretrain", "best_f1.pickle"),
            echo=echo,
        )
        pre_params = pre_trainer.params
    else:
        pre_out = None
        pre_params = ckpt.fusion_from_torch_state_dict(
            ckpt.normalize_torch_keys(_load_any(load_stat)), pre_cfg
        )

    # strict=False: carry over every shared key; finetune config has the
    # same trunk (feature_all_lap adds no params)
    fin_trainer = Trainer(
        fin_cfg,
        TrainConfig(batch_size=cfg.batch_size, learning_rate=cfg.learning_rate,
                    epochs=cfg.finetune_epochs, compute_dtype=cfg.compute_dtype),
        params=pre_params,
    )
    fin_out = fin_trainer.fit(
        train_data, test_data, epsilon=cfg.epsilon,
        log_path=os.path.join(out_root, "fineturn"),  # ref dir spelling
        model_path=os.path.join(out_root, "fineturn", "best_f1.pickle"),
        echo=echo,
    )
    return {"pretrain": pre_out, "finetune": fin_out}


def _load_any(path: str):
    import pickle

    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        import torch

        return torch.load(path, map_location="cpu")
