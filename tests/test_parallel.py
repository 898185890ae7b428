"""Mesh/sharding tests on the 8-virtual-device CPU mesh (conftest sets
--xla_force_host_platform_device_count=8)."""
import dataclasses

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.parallel import mesh as mesh_mod
from eeg_multimodal_tpu.parallel import sharding as shard_mod
from eeg_multimodal_tpu.parallel.train import shard_trainer
from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer
from test_trainer import TINY_BERT, tiny_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_factorize():
    assert mesh_mod.factorize(8) == (2, 4)
    assert mesh_mod.factorize(4) == (1, 4)
    assert mesh_mod.factorize(2) == (1, 2)
    assert mesh_mod.factorize(1) == (1, 1)
    assert mesh_mod.factorize(16, max_model=4) == (4, 4)


def test_param_pspec_rules():
    assert shard_mod.param_pspec("bert/layers/3/attn/query/kernel") == P(None, "model")
    assert shard_mod.param_pspec("bert/layers/3/attn/output/kernel") == P("model", None)
    assert shard_mod.param_pspec("bert/layers/0/ffn/intermediate/kernel") == P(None, "model")
    assert shard_mod.param_pspec("bert/layers/0/ffn/output/kernel") == P("model", None)
    assert shard_mod.param_pspec("bert/embeddings/word") == P()
    assert shard_mod.param_pspec("cross/layers/1/linear1/kernel") == P(None, "model")
    assert shard_mod.param_pspec("cross/layers/1/self_attn/out_proj/kernel") == P("model", None)
    assert shard_mod.param_pspec("DP") == P()
    assert shard_mod.param_pspec("fc1/kernel") == P(None, "model")


@pytest.mark.slow
def test_sharded_trainer_epoch_runs_and_matches_unsharded():
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, learning_rate=1e-3, epochs=1)

    tr_ref = Trainer(fc, tc)
    out_ref = tr_ref.fit(tiny_dataset(8), tiny_dataset(4, seed=1), 1.0)

    tr_sh = Trainer(fc, tc)
    mesh = shard_trainer(tr_sh)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    out_sh = tr_sh.fit(tiny_dataset(8), tiny_dataset(4, seed=1), 1.0)

    # GSPMD must not change the math (same shuffles, keys, data)
    assert abs(out_ref["history"][0]["train_loss"] - out_sh["history"][0]["train_loss"]) < 1e-3
    assert abs(out_ref["history"][0]["test_acc"] - out_sh["history"][0]["test_acc"]) < 1e-6

    # params really are distributed over the mesh
    qk = tr_sh.params["bert"]["layers"][0]["attn"]["query"]["kernel"]
    assert len(qk.sharding.device_set) > 1


@pytest.mark.slow
def test_dpsgd_under_mesh_matches_unsharded():
    """Per-example vmap(grad) composes with GSPMD: the DP-SGD trainer run
    with Megatron-sharded params on the 2x4 mesh reproduces the unsharded
    run (same Poisson draws, same noise keys — layout must not change the
    math)."""
    from eeg_multimodal_tpu.dp.dpsgd import DPSGDConfig
    from eeg_multimodal_tpu.parallel.train import shard_dpsgd_trainer
    from eeg_multimodal_tpu.train.dpsgd_trainer import DPSGDTrainer

    fc = dataclasses.replace(
        fusion.config_for("ti", "DPSGD"), bert_config=TINY_BERT
    )
    dc = DPSGDConfig(target_epsilon=2.0, epochs=1, batch_size=4)
    train, test = tiny_dataset(12), tiny_dataset(8, seed=1)

    tr_ref = DPSGDTrainer(fc, dc)
    out_ref = tr_ref.fit(train, test, echo=False)

    tr_sh = DPSGDTrainer(fc, dc)
    mesh = shard_dpsgd_trainer(tr_sh)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    out_sh = tr_sh.fit(train, test, echo=False)

    a, b = out_ref["history"][0], out_sh["history"][0]
    np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=2e-4)
    np.testing.assert_allclose(a["test_loss"], b["test_loss"], rtol=2e-4)
    assert a["test_acc"] == pytest.approx(b["test_acc"], abs=1e-6)
    assert out_ref["sigma"] == out_sh["sigma"]

    # trainable params really are distributed (last BERT layer is in the
    # private subtree and carries the Megatron split)
    qk = tr_sh.params["bert"]["layers"][-1]["attn"]["query"]["kernel"]
    assert len(qk.sharding.device_set) > 1


@pytest.mark.slow
def test_sweep_under_mesh_matches_unsharded():
    """Composing the vmapped sweep with the device mesh (members placed along
    the data axis) must be a pure layout change: per-member histories equal
    the meshless run's. 3 members on a 2-wide data axis also exercises the
    pad-to-tile path (one padded member dropped from results)."""
    from eeg_multimodal_tpu.train.sweep import SweepMember, SweepRunner

    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, learning_rate=1e-3, epochs=1)
    members = [SweepMember(0.1), SweepMember(1.0), SweepMember(5.0)]
    train, test = tiny_dataset(12), tiny_dataset(8, seed=1)

    plain = SweepRunner(fc, tc, members).run(train, test, echo=False)

    mesh = mesh_mod.make_mesh(jax.devices()[:8], data=2, model=4)
    meshed = SweepRunner(fc, tc, members, mesh=mesh).run(train, test, echo=False)

    assert len(plain) == len(meshed) == 3
    for a, b in zip(plain, meshed):
        assert a["member"] == b["member"]
        for ra, rb in zip(a["history"], b["history"]):
            np.testing.assert_allclose(ra["train_loss"], rb["train_loss"], rtol=2e-4)
            np.testing.assert_allclose(ra["test_loss"], rb["test_loss"], rtol=2e-4)
            assert ra["f1"] == pytest.approx(rb["f1"], abs=1e-6)
