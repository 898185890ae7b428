"""Raw->processed CSV pipeline tests (ref: process.py:16-48 semantics)."""
import os

import numpy as np

from eeg_multimodal_tpu.data import process as P
from eeg_multimodal_tpu.data.datasets import load_feature_csv, load_label_csv


def make_raw(tmp_path, n=50, seed=0):
    rng = np.random.RandomState(seed)
    # 57 cols: time + 25 act + 30 eeg + label
    data = np.concatenate(
        [
            np.arange(n)[:, None],
            rng.randn(n, 25) * 100,
            rng.randn(n, 30) * 10,
            rng.randint(0, 2, (n, 1)),
        ],
        axis=1,
    )
    path = tmp_path / "task_1.txt"
    np.savetxt(path, data)
    return str(path), data


def test_process_writes_reference_layout(tmp_path):
    raw, data = make_raw(tmp_path)
    out = str(tmp_path / "processed")
    P.process([raw], out)
    for split in ("train", "test"):
        for name in ("EEG", "act", "label"):
            assert os.path.exists(os.path.join(out, f"{split}_{name}.csv"))
    eeg = load_feature_csv(os.path.join(out, "train_EEG.csv"))
    act = load_feature_csv(os.path.join(out, "train_act.csv"))
    lab = load_label_csv(os.path.join(out, "train_label.csv"))
    assert eeg.shape[1] == 30 and act.shape[1] == 25
    assert len(eeg) == len(act) == len(lab) == 40  # 80% of 50
    test_lab = load_label_csv(os.path.join(out, "test_label.csv"))
    assert len(test_lab) == 10

    # header matches the reference's channel names
    header = open(os.path.join(out, "train_EEG.csv")).readline().strip()
    assert header == ",".join(P.EEG_CHANNELS)
    header = open(os.path.join(out, "train_act.csv")).readline().strip()
    assert header == ",".join(P.ACT_CHANNELS)


def test_process_rounds_to_int_and_is_deterministic(tmp_path):
    raw, data = make_raw(tmp_path, seed=1)
    out1, out2 = str(tmp_path / "p1"), str(tmp_path / "p2")
    P.process([raw], out1)
    P.process([raw], out2)
    a = load_feature_csv(os.path.join(out1, "train_EEG.csv"))
    b = load_feature_csv(os.path.join(out2, "train_EEG.csv"))
    np.testing.assert_array_equal(a, b)
    # values are rounded ints
    assert np.array_equal(a, np.rint(a))


def test_split_indices_disjoint_and_cover(tmp_path):
    tr, te = P.train_test_split(100)
    assert len(tr) == 80 and len(te) == 20
    assert set(tr).isdisjoint(te)
    assert set(tr) | set(te) == set(range(100))
