"""Tests: resumable training state, pretrain->finetune pipeline, profiling."""
import dataclasses
import os

import numpy as np
import pytest
import jax

from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train import pipeline as P
from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer
from eeg_multimodal_tpu.utils import profiling
from test_trainer import TINY_BERT, tiny_dataset


def tiny_cfg(dp_mode="lapacian_dropout"):
    return dataclasses.replace(
        fusion.config_for("ti", dp_mode), bert_config=TINY_BERT
    )


@pytest.mark.slow
def test_save_load_train_state(tmp_path):
    tr = Trainer(tiny_cfg(), TrainConfig(batch_size=4, epochs=1, learning_rate=1e-3))
    tr.fit(tiny_dataset(8), tiny_dataset(4, seed=1), epsilon=1.0)
    path = str(tmp_path / "state.pickle")
    P.save_train_state(path, tr, epoch=0)

    tr2 = Trainer(tiny_cfg(), TrainConfig(batch_size=4, epochs=1, learning_rate=1e-3))
    epoch = P.load_train_state(path, tr2)
    assert epoch == 0
    for a, b in zip(
        jax.tree_util.tree_leaves(tr.params), jax.tree_util.tree_leaves(tr2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_resumable_trainer_resumes(tmp_path):
    log = str(tmp_path / "run")
    tc = TrainConfig(batch_size=4, epochs=2, learning_rate=1e-3)
    tr = P.ResumableTrainer(tiny_cfg(), tc)
    out1 = tr.fit(tiny_dataset(8), tiny_dataset(4, seed=1), 1.0, log_path=log, echo=False)
    assert len(out1["history"]) == 2
    assert os.path.exists(os.path.join(log, P.ResumableTrainer.STATE_FILE))

    # resuming a completed run does nothing
    tr2 = P.ResumableTrainer(tiny_cfg(), tc)
    out2 = tr2.fit(tiny_dataset(8), tiny_dataset(4, seed=1), 1.0, log_path=log, echo=False)
    assert out2.get("resumed_complete")

    # extending epochs resumes from the saved state
    tc3 = TrainConfig(batch_size=4, epochs=3, learning_rate=1e-3)
    tr3 = P.ResumableTrainer(tiny_cfg(), tc3)
    out3 = tr3.fit(tiny_dataset(8), tiny_dataset(4, seed=1), 1.0, log_path=log, echo=False)
    assert len(out3["history"]) == 1
    assert out3["history"][0]["epoch"] == 3


@pytest.mark.slow
def test_pretrain_finetune_pipeline(tmp_path):
    cfg = P.PipelineConfig(
        epsilon=0.5, pretrain_epochs=1, finetune_epochs=1,
        batch_size=4, learning_rate=1e-3,
    )
    import eeg_multimodal_tpu.train.pipeline as pp
    import eeg_multimodal_tpu.models.fusion as F

    # shrink BERT for the test by monkeypatching config_for
    orig = F.config_for

    def small_config_for(*a, **kw):
        return dataclasses.replace(orig(*a, **kw), bert_config=TINY_BERT)

    F.config_for = small_config_for
    pp.fusion.config_for = small_config_for
    try:
        out = P.pretrain_finetune(
            tiny_dataset(8), tiny_dataset(4, seed=1), str(tmp_path), cfg, echo=False
        )
    finally:
        F.config_for = orig
        pp.fusion.config_for = orig
    assert out["pretrain"]["history"][0]["epoch"] == 1
    assert out["finetune"]["history"][0]["epoch"] == 1
    assert os.path.exists(tmp_path / "pretrain" / "whole_record.txt")
    assert os.path.exists(tmp_path / "fineturn" / "whole_record.txt")  # ref dir name


def test_step_timer_and_finite_guard():
    t = profiling.StepTimer()
    t.start()
    x = jax.numpy.ones((4,))
    t.stop(x)
    assert t.median >= 0
    assert t.steps_per_sec(10) > 0
    profiling.assert_finite({"a": x})
    import pytest

    with pytest.raises(FloatingPointError):
        profiling.assert_finite({"a": jax.numpy.asarray([float("nan")])})


def test_orbax_backend_round_trip(tmp_path):
    import jax.numpy as jnp

    from eeg_multimodal_tpu.train import checkpoint as C

    tree = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    path = str(tmp_path / "orbax_ckpt")
    C.save_pytree_orbax(path, tree)
    out = C.load_pytree_orbax(path, like=tree)
    for x, y in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
