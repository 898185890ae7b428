"""Tests: dp_inits, eps_experiment grid, feawei extraction, CLI parsing."""
import dataclasses
import os
import pickle

import numpy as np
import jax.numpy as jnp

from eeg_multimodal_tpu.experiments import legacy_drivers as LD
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.ops import dp_inits
from test_trainer import TINY_BERT, tiny_dataset


def test_eps_experiment_epsilons_match_reference():
    eps = LD.eps_experiment_epsilons()
    assert len(eps) == 20
    assert eps[0] == 0.01 and eps[-1] == 5.0
    # spot values recorded in the reference's model_dict/eps_experiment dirs
    for v in (0.019, 0.051, 0.137, 0.263, 0.974, 1.351, 1.874, 2.599, 3.605):
        assert v in eps.tolist()


def test_dp_init_modality_constants():
    dp = np.asarray(dp_inits.modality_constants())
    assert dp.shape == (1, 2304)
    assert (dp[0, :768] == np.float32(0.4)).all()
    assert (dp[0, 768:1536] == np.float32(0.5)).all()
    assert (dp[0, 1536:] == np.float32(0.3)).all()


def test_dp_init_feawei_formula():
    rng = np.random.RandomState(0)
    feats = rng.rand(100, 6).astype(np.float32)
    out = np.asarray(dp_inits.feawei(feats, k=1.0, base_values=(0.4, 0.5, 0.3)))
    mean = feats.mean(0)
    std = (mean - mean.mean()) / mean.std()
    w_init = 1 - 1 / (1 + np.exp(-std))
    base = np.concatenate([np.full(2, 0.4), np.full(2, 0.5), np.full(2, 0.3)])
    np.testing.assert_allclose(out[0], base + w_init - 0.5, rtol=1e-5)


def test_extract_feawei(tmp_path):
    cfg = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    import jax

    params = fusion.init(jax.random.PRNGKey(0), cfg)
    data = tiny_dataset(10)
    out_path = str(tmp_path / "feawei.pkl")
    feats = LD.extract_feawei(params, cfg, data, out_path, batch_size=4)
    assert feats.shape == (10, 2304)
    assert feats.min() >= 0.0 and feats.max() <= 1.0 + 1e-5  # minmax-normalized
    with open(out_path, "rb") as f:
        saved = pickle.load(f)
    np.testing.assert_array_equal(saved, feats)
    # and it feeds the feawei init
    dp = dp_inits.feawei(feats)
    assert dp.shape == (1, 2304)


def test_extract_feawei_accepts_numpy_params():
    # regression: pickle-loaded / vocab-expanded trees carry host numpy
    # leaves; indexing numpy word embeddings with a traced id array raised
    # TracerArrayConversionError inside the jitted feature extractor
    cfg = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    import jax

    params = fusion.init(jax.random.PRNGKey(0), cfg)
    np_params = jax.tree_util.tree_map(np.asarray, params)
    data = tiny_dataset(8)
    feats = LD.extract_feawei(np_params, cfg, data, out_path=None, batch_size=4)
    assert feats.shape == (8, 2304)


def test_fusion_init_converts_injected_numpy_bert():
    cfg = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    import jax

    fresh = fusion.init(jax.random.PRNGKey(0), cfg)
    np_bert = jax.tree_util.tree_map(np.asarray, fresh["bert"])
    merged = fusion.init(jax.random.PRNGKey(1), cfg, bert_params=np_bert)
    assert all(
        isinstance(leaf, jnp.ndarray)
        for leaf in jax.tree_util.tree_leaves(merged["bert"])
    )


def test_rewrite_val_to_test(tmp_path):
    p = tmp_path / "run"
    os.makedirs(p)
    with open(p / "whole_record.txt", "w") as f:
        f.write("| Val Loss:  0.5\n| Val Accuracy:  0.9\n")
    n = LD.rewrite_val_to_test(str(tmp_path))
    assert n == 1
    text = open(p / "whole_record.txt").read()
    assert "Test Loss" in text and "Val" not in text


def test_cli_parses_all_subcommands():
    from eeg_multimodal_tpu import cli

    # parse-only smoke: invalid run dir => the commands would fail on data
    # loading, so just check argparse wiring via --help exits cleanly
    import pytest

    for cmd in ("demo", "train", "legacy", "compare", "sweep", "embed", "process"):
        with pytest.raises(SystemExit) as e:
            cli.main([cmd, "--help"])
        assert e.value.code == 0
