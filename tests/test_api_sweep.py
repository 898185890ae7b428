"""Tests for the TrainAndTest facade, experiment drivers, and sweep engine."""
import dataclasses
import os

import numpy as np
import pytest
import jax

from eeg_multimodal_tpu.experiments import drivers as drv
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train.api import TrainAndTest, standardize_coef
from eeg_multimodal_tpu.train.sweep import SweepMember, SweepRunner, privacy_utility_frontier
from eeg_multimodal_tpu.train.trainer import TrainConfig
from test_trainer import TINY_BERT, tiny_dataset


def test_standardize_coef():
    # ref base_train.py:74-75
    assert standardize_coef("ViT-B/32") == "ViT_B_32"
    assert standardize_coef("bert-base-uncased") == "bert_base_uncased"


def test_embedding_path_layout():
    job = TrainAndTest(data_root="/data")
    p = job._embedding_path("EEG", "txt", "bert", "bert-base-uncased", "train")
    assert p == "/data/data/embedding/EEG/txt/bert_bert_base_uncased/train.pickle"


def test_driver_grids_match_reference():
    eps = drv.eps_list_20()
    assert len(eps) == 20
    assert eps[0] == 0.01 and eps[-1] == 5.0
    assert abs(eps[5] - 0.051) < 1e-9  # logspace, rounded to 3 decimals
    assert drv.EPS_REPRESENTATIVE == [0.01, 0.1, 1.0]
    assert len(drv.CompareModal().configs()) == 4
    assert [c["dp_mode"] for c in drv.ComparePrivateScheme().configs()] == [
        "lapacian_dropout", "DPSGD", "lapacian_dropout_equal_weight", "NDP"
    ]
    assert len(drv.CompareModelInitWeight().configs()) == 6
    assert [c["cross_atn_type"] for c in drv.CompareCrossModalType().configs()] == [
        "double_stream", "single_stream"
    ]
    demo = drv.Demo().configs()[0]
    assert demo["train_type"] == "demo" and demo["path_suffix"] == "DPMLD/"
    assert demo["epsilon"] == 0.1
    assert len(privacy_utility_frontier()) == 5


@pytest.mark.slow
def test_facade_train_on_writes_reference_layout(tmp_path):
    job = TrainAndTest(
        batch_size=4, learning_rate=1e-3, epochs=1,
        data_root=str(tmp_path), compute_dtype="float32", echo=False,
    )
    out = job.train_on(
        tiny_dataset(8), tiny_dataset(4, seed=1),
        train_type="demo", path_suffix="DPMLD/",
        multimodal_type="ti", dp_mode="lapacian_dropout",
        epsilon=0.5, bert_config=TINY_BERT,
    )
    assert np.isfinite(out["history"][0]["train_loss"])
    assert os.path.exists(tmp_path / "logs" / "demo" / "DPMLD" / "whole_record.txt")


@pytest.mark.slow
def test_sweep_two_members(tmp_path):
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, learning_rate=1e-3, epochs=2)
    runner = SweepRunner(
        fc, tc,
        [SweepMember(epsilon=0.1), SweepMember(epsilon=5.0)],
    )
    out = runner.run(
        tiny_dataset(8), tiny_dataset(4, seed=1),
        log_root=str(tmp_path / "sweep"), echo=False,
    )
    assert len(out) == 2
    for member in out:
        assert len(member["history"]) == 2
        assert np.isfinite(member["history"][-1]["test_loss"])
    # different eps => different training trajectories
    a = out[0]["history"][-1]["train_loss"]
    b = out[1]["history"][-1]["train_loss"]
    assert a != b
    assert os.path.exists(tmp_path / "sweep" / "eps0.1_seed980616" / "whole_record.txt")


@pytest.mark.slow
def test_sweep_seed_variation():
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, learning_rate=1e-3, epochs=1)
    runner = SweepRunner(
        fc, tc, [SweepMember(1.0, seed=1), SweepMember(1.0, seed=2)]
    )
    out = runner.run(tiny_dataset(8), tiny_dataset(4, seed=1), echo=False)
    assert out[0]["history"][0]["train_loss"] != out[1]["history"][0]["train_loss"]


def test_sweep_with_injected_bert_params():
    """SweepRunner(bert_params=...) threads the encoder init as a jit
    argument (not a baked constant — a BERT-base tree as program constants
    overflows the remote-compile transport) and every member starts from it."""
    import dataclasses

    import jax
    import numpy as np

    from eeg_multimodal_tpu.models import bert as bert_mod
    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.sweep import SweepMember, SweepRunner
    from eeg_multimodal_tpu.train.trainer import TrainConfig
    from test_trainer import TINY_BERT, tiny_dataset

    bert_params = bert_mod.init(jax.random.PRNGKey(5), TINY_BERT)
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, learning_rate=1e-3, epochs=1)
    runner = SweepRunner(fc, tc, [SweepMember(0.1), SweepMember(1.0)],
                         bert_params=bert_params)
    params, _, _ = runner._init_members(runner.members)
    # every member's word table equals the injected encoder's
    word = np.asarray(bert_params["embeddings"]["word"])
    for s in range(2):
        np.testing.assert_array_equal(
            np.asarray(params["bert"]["embeddings"]["word"][s]), word
        )
    out = runner.run(tiny_dataset(8), tiny_dataset(6, seed=1), echo=False)
    assert all(np.isfinite(r["history"][0]["train_loss"]) for r in out)
