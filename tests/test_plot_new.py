"""The legacy plot_new figure suite regenerates from framework artifacts."""
import os

import numpy as np

from eeg_multimodal_tpu.train.records import RunRecorder
from eeg_multimodal_tpu.visualization import plot_new as PN


def _write_run(path, n_epochs=12, base=0.6):
    rec = RunRecorder(path + "/", echo=False)
    rng = np.random.RandomState(hash(path) % 2**31)
    for e in range(n_epochs):
        acc = min(base + 0.02 * e + rng.rand() * 0.01, 0.99)
        rec.epoch(e, 0.7 - 0.01 * e, acc - 0.05, 0.65 - 0.01 * e, acc, acc, 1.0)


def test_regenerate_plot_new_all_figures(tmp_path):
    eps_root = tmp_path / "eps_experiment"
    grid = [0.01, 0.1, 1.0]
    for e in grid:
        _write_run(str(eps_root / str(e)))

    dp_param = np.random.RandomState(0).randn(1, 3 * 768).astype(np.float32)
    feawei = np.random.RandomState(1).rand(40, 3 * 768).astype(np.float32)

    written = PN.regenerate_plot_new(
        str(eps_root), str(tmp_path / "figs"),
        dp_param=dp_param, feawei=feawei, grid_eps=grid,
    )
    names = {os.path.basename(w) for w in written}
    assert names == {
        "cp4_fig1_new.png", "cp4_fig2.png", "cp4_fig3.png",
        "cp4_fig5_new.png", "cp4_fig6_new.png", "cp4_fig7.png",
    }
    for w in written:
        assert os.path.getsize(w) > 1000


def test_fig6_uses_epoch10_and_best(tmp_path):
    _write_run(str(tmp_path / "0.5"), n_epochs=12)
    rows = PN.load_run(str(tmp_path / "0.5"))
    out = PN.fig6_eps_best_vs_epoch10({0.5: rows}, str(tmp_path / "f6.png"))
    assert os.path.getsize(out) > 1000


def test_parses_reference_logs_when_present(tmp_path):
    """The suite consumes the reference's committed eps_experiment logs
    directly (same parser handles the legacy format)."""
    ref = "/root/reference/model_dict/eps_experiment"
    if not os.path.isdir(ref):
        import pytest

        pytest.skip("reference tree absent")
    written = PN.regenerate_plot_new(ref, str(tmp_path / "figs"))
    names = {os.path.basename(w) for w in written}
    assert "cp4_fig5_new.png" in names and "cp4_fig6_new.png" in names
