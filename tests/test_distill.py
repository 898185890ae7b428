"""CLIP-embedding distillation (train/distill.py).

The reference's train-side act CLIP pickle is a missing large blob
(.MISSING_LARGE_BLOBS:2); distill.py learns row -> CLIP(render(row)) from
the 601 committed test-side pairs (feature/action/test_clip_v2.pickle,
produced by get_embedding.py:62-71) and synthesizes the train side. These
tests pin the mechanism on a synthetic deterministic row->embedding map:
the distiller must generalize to held-out rows, prediction must be
deterministic per seed, and the tree builder must write a complete
drop-in data root.
"""
import os
import pickle

import numpy as np
import pytest

from eeg_multimodal_tpu.train.distill import (
    CLIPDistiller,
    DistillConfig,
    build_distilled_act_tree,
)

# small config: the real fit (601x24 -> 512, 4000 steps) is a TPU job; the
# mechanism is checked on a scaled-down analogue
CFG = DistillConfig(hidden=64, depth=2, steps=600, learning_rate=3e-3,
                    warmup=20, seed=0)


def synth_pairs(n=400, d_in=8, d_out=16, seed=0):
    """A deterministic smooth row->embedding function, like CLIP(render(row))
    is of the act row (get_embedding.py:26-31 render is deterministic)."""
    rng = np.random.RandomState(seed)
    rows = rng.randint(0, 50, (n, d_in)).astype(np.float32)
    w1 = rng.randn(d_in, 32).astype(np.float32)
    w2 = rng.randn(32, d_out).astype(np.float32)
    targets = np.tanh(rows / 25.0 - 1.0) @ w1
    targets = np.tanh(targets) @ w2
    return rows, targets.astype(np.float32)


def test_distiller_generalizes_to_heldout_rows():
    rows, targets = synth_pairs()
    params, metrics = CLIPDistiller(CFG).fit(rows, targets)
    # held-out metrics were computed on rows the fit never saw; the real
    # 601-pair/4000-step fit reaches 0.99996 held-out cosine (ACCURACY.md),
    # this scaled-down config pins that the mechanism generalizes at all
    assert metrics["n_val"] == 40
    assert metrics["val_cosine_mean"] > 0.93, metrics
    assert metrics["val_rel_mse"] < 0.25, metrics


def test_distiller_deterministic_per_seed():
    rows, targets = synth_pairs(n=120)
    d = CLIPDistiller(CFG)
    p1, m1 = d.fit(rows, targets)
    p2, m2 = d.fit(rows, targets)
    np.testing.assert_array_equal(
        np.asarray(d.predict(p1, rows[:7])), np.asarray(d.predict(p2, rows[:7]))
    )
    assert m1 == m2


def test_extra_rows_only_shift_normalizer():
    """extra_rows (the train split) widen the input standardization moments
    but contribute no training pairs — the val metrics stay honest."""
    rows, targets = synth_pairs(n=150)
    extra = rows[:50] * 3.0  # out-of-range rows
    d = CLIPDistiller(CFG)
    p_with, _ = d.fit(rows, targets, extra_rows=extra)
    p_wo, _ = d.fit(rows, targets)
    assert not np.allclose(np.asarray(p_with["x_mean"]), np.asarray(p_wo["x_mean"]))


def test_build_distilled_act_tree(tmp_path):
    """End-to-end tree build: test side = the real array verbatim, train
    side = predictions for every train row, other tree content copied."""
    d_in, d_out, n_te, n_tr = 6, 8, 60, 90
    rows_te, clip_te = synth_pairs(n=n_te, d_in=d_in, d_out=d_out, seed=1)
    rows_tr, _ = synth_pairs(n=n_tr, d_in=d_in, d_out=d_out, seed=2)

    root = tmp_path / "root"
    proc = root / "data" / "processed"
    proc.mkdir(parents=True)
    header = ",".join(f"c{i}" for i in range(d_in))
    np.savetxt(proc / "test_act.csv", rows_te, delimiter=",",
               header=header, comments="")
    np.savetxt(proc / "train_act.csv", rows_tr, delimiter=",",
               header=header, comments="")
    # a txt-embedding dir that must be copied through
    txt = root / "data" / "embedding" / "EEG" / "txt" / "bert_bert_base_uncased"
    txt.mkdir(parents=True)
    (txt / "train.pickle").write_bytes(pickle.dumps({"input_ids": [1]}))
    real = root / "test_clip.pickle"
    real.write_bytes(pickle.dumps(clip_te))

    out = tmp_path / "out"
    metrics = build_distilled_act_tree(
        str(root), str(out), str(real), cfg=CFG, echo=False
    )
    assert metrics["val_cosine_mean"] > 0.9

    save = out / "data" / "embedding" / "act" / "img" / "clip_ViT_B_32"
    with open(save / "test.pickle", "rb") as f:
        np.testing.assert_array_equal(pickle.load(f), clip_te)
    with open(save / "train.pickle", "rb") as f:
        train_clip = pickle.load(f)
    assert train_clip.shape == (n_tr, d_out)
    assert train_clip.dtype == np.float32
    assert np.isfinite(train_clip).all()
    assert (out / "data" / "processed" / "train_act.csv").exists()
    assert (out / "data" / "embedding" / "EEG" / "txt"
            / "bert_bert_base_uncased" / "train.pickle").exists()


def test_fit_fraction_control(tmp_path):
    """The half-fit leakage control (ACCURACY.md 15): fit_fraction < 1 fits
    the deployed distiller on a strict random subset of the test pairs, the
    tree still carries full-size train predictions and the verbatim real
    test array, and the subset choice is recorded in the metrics."""
    d_in, d_out, n_te, n_tr = 6, 8, 80, 50
    rows_te, clip_te = synth_pairs(n=n_te, d_in=d_in, d_out=d_out, seed=5)
    rows_tr, _ = synth_pairs(n=n_tr, d_in=d_in, d_out=d_out, seed=6)
    root = tmp_path / "root"
    proc = root / "data" / "processed"
    proc.mkdir(parents=True)
    header = ",".join(f"c{i}" for i in range(d_in))
    np.savetxt(proc / "test_act.csv", rows_te, delimiter=",",
               header=header, comments="")
    np.savetxt(proc / "train_act.csv", rows_tr, delimiter=",",
               header=header, comments="")
    real = root / "real.pickle"
    real.write_bytes(pickle.dumps(clip_te))

    import dataclasses

    half = dataclasses.replace(CFG, fit_fraction=0.5)
    out = tmp_path / "out_half"
    metrics = build_distilled_act_tree(
        str(root), str(out), str(real), cfg=half, echo=False
    )
    assert metrics["fit_fraction"] == 0.5
    # fit saw only 40 of 80 pairs; its val split is carved from those 40
    assert metrics["n_val"] == 4

    save = out / "data" / "embedding" / "act" / "img" / "clip_ViT_B_32"
    with open(save / "test.pickle", "rb") as f:
        np.testing.assert_array_equal(pickle.load(f), clip_te)  # verbatim
    with open(save / "train.pickle", "rb") as f:
        train_clip = pickle.load(f)
    assert train_clip.shape == (n_tr, d_out)
    assert np.isfinite(train_clip).all()

    # a different seed draws a different subset -> different predictions
    other = dataclasses.replace(half, seed=half.seed + 7)
    out2 = tmp_path / "out_half2"
    build_distilled_act_tree(str(root), str(out2), str(real), cfg=other,
                             echo=False)
    with open(out2 / "data" / "embedding" / "act" / "img" / "clip_ViT_B_32"
              / "train.pickle", "rb") as f:
        train_clip2 = pickle.load(f)
    assert not np.array_equal(train_clip, train_clip2)


def test_cli_distill_subcommand(tmp_path):
    """The distill subcommand wires build_distilled_act_tree."""
    from eeg_multimodal_tpu import cli

    d_in, d_out = 4, 6
    rows_te, clip_te = synth_pairs(n=40, d_in=d_in, d_out=d_out, seed=3)
    rows_tr, _ = synth_pairs(n=50, d_in=d_in, d_out=d_out, seed=4)
    root = tmp_path / "root"
    proc = root / "data" / "processed"
    proc.mkdir(parents=True)
    header = ",".join(f"c{i}" for i in range(d_in))
    np.savetxt(proc / "test_act.csv", rows_te, delimiter=",",
               header=header, comments="")
    np.savetxt(proc / "train_act.csv", rows_tr, delimiter=",",
               header=header, comments="")
    real = root / "real.pickle"
    real.write_bytes(pickle.dumps(clip_te))

    rc = cli.main([
        "distill", "--data_root", str(root), "--out", str(tmp_path / "o"),
        "--real_test_pickle", str(real), "--steps", "200",
    ])
    assert rc == 0
    assert (tmp_path / "o" / "data" / "embedding" / "act" / "img"
            / "clip_ViT_B_32" / "train.pickle").exists()
