"""CLI integration: run the real subcommands end-to-end on a synthetic data
tree with a tiny BERT (CPU)."""
import os
import pickle

import numpy as np
import pytest

from eeg_multimodal_tpu import cli


@pytest.fixture()
def data_tree(tmp_path):
    """Reference-layout tree: processed label CSVs + embedding pickles."""
    rng = np.random.RandomState(0)
    n = {"train": 10, "test": 6}
    for split, count in n.items():
        os.makedirs(tmp_path / "data" / "processed", exist_ok=True)
        with open(tmp_path / "data" / "processed" / f"{split}_label.csv", "w") as f:
            f.write("label\n")
            for v in rng.randint(0, 2, count):
                f.write(f"{v}\n")
        # eeg txt pickles (BatchEncoding-dict list) and act img pickles
        txt_dir = tmp_path / "data" / "embedding" / "EEG" / "txt" / "bert_bert_base_uncased"
        img_dir = tmp_path / "data" / "embedding" / "act" / "img" / "clip_ViT_B_32"
        os.makedirs(txt_dir, exist_ok=True)
        os.makedirs(img_dir, exist_ok=True)
        txt = [
            {
                "input_ids": np.concatenate(
                    [rng.randint(1, 50, 6), np.zeros(506, np.int64)]
                ).astype(np.int64),
                "attention_mask": np.concatenate(
                    [np.ones(6, np.int64), np.zeros(506, np.int64)]
                ),
            }
            for _ in range(count)
        ]
        with open(txt_dir / f"{split}.pickle", "wb") as f:
            pickle.dump(txt, f)
        with open(img_dir / f"{split}.pickle", "wb") as f:
            pickle.dump(rng.randn(count, 512).astype(np.float32), f)
    return tmp_path


@pytest.mark.slow
def test_cli_train_runs_end_to_end(data_tree, monkeypatch):
    """`cli train` on the synthetic tree with a tiny BERT."""
    import dataclasses

    import eeg_multimodal_tpu.models.fusion as F
    from test_trainer import TINY_BERT

    small = dataclasses.replace(TINY_BERT, max_position_embeddings=512)
    orig = F.config_for

    def small_config_for(*a, **kw):
        return dataclasses.replace(orig(*a, **kw), bert_config=small)

    monkeypatch.setattr(F, "config_for", small_config_for)
    import eeg_multimodal_tpu.train.api as api_mod

    monkeypatch.setattr(api_mod.fusion, "config_for", small_config_for)

    rc = cli.main([
        "train", "--data_root", str(data_tree), "-n", "1", "-bs", "4",
        "-lr", "1e-3", "--dtype", "float32",
        "--train_type", "citest", "--path_suffix", "run/",
    ])
    assert rc == 0
    rec = (data_tree / "logs" / "citest" / "run" / "whole_record.txt").read_text()
    assert rec.startswith("Epochs: 1")


def test_cli_process_runs(tmp_path):
    rng = np.random.RandomState(1)
    data = np.concatenate(
        [np.arange(20)[:, None], rng.randn(20, 55) * 10, rng.randint(0, 2, (20, 1))],
        axis=1,
    )
    raw = tmp_path / "task_1.txt"
    np.savetxt(raw, data)
    out = tmp_path / "proc"
    rc = cli.main(["process", str(raw), "--out", str(out)])
    assert rc == 0
    assert (out / "train_EEG.csv").exists()


@pytest.mark.slow
def test_pretrain_finetune_pipeline(data_tree):
    """The weights-free accuracy pipeline end-to-end on the synthetic tree
    (tiny shapes): compact vocab build, MLM pretraining, faithful fine-tune,
    artifacts under the run dir."""
    from test_trainer import TINY_BERT

    from eeg_multimodal_tpu.train.mlm import pretrain_finetune_mlm

    out = data_tree / "run"
    result = pretrain_finetune_mlm(
        str(data_tree), str(out), mlm_steps=4, mlm_batch=4, epochs=1,
        batch_size=4, learning_rate=1e-3, compute_dtype="float32",
        bert_config=TINY_BERT, echo=False,
    )
    assert np.isfinite(result["history"][0]["train_loss"])
    assert (out / "bert_mlm.pickle").exists()
    assert (out / "compact_vocab.npz").exists()
    assert (out / "mlm_history.json").exists()
    assert (out / "logs" / "demo" / "DPMLD" / "whole_record.txt").exists()

    # resume from the saved encoder (bert_ckpt path)
    result2 = pretrain_finetune_mlm(
        str(data_tree), str(out), epochs=1, batch_size=4,
        learning_rate=1e-3, compute_dtype="float32",
        bert_config=TINY_BERT, bert_ckpt=str(out / "bert_mlm.pickle"),
        echo=False,
    )
    assert np.isfinite(result2["history"][0]["train_loss"])


@pytest.mark.slow
def test_pretrain_pipeline_row_regression(data_tree):
    """row_reg_weight wires the numeric-row targets through the pipeline:
    with the processed train CSV present the joint pretext trains; without
    it, an explicitly-requested pretext must FAIL LOUDLY (silently training
    MLM-only would deviate from what the caller asked for), while
    row_reg_weight=0 still runs MLM-only."""
    from test_trainer import TINY_BERT

    from eeg_multimodal_tpu.train.mlm import pretrain_finetune_mlm

    rng = np.random.RandomState(3)
    # processed numeric rows aligned with the EEG txt pickle (10 train rows)
    with open(data_tree / "data" / "processed" / "train_EEG.csv", "w") as f:
        f.write(",".join(f"c{i}" for i in range(5)) + "\n")
        for _ in range(10):
            f.write(",".join(str(v) for v in rng.randint(-50, 50, 5)) + "\n")

    out = data_tree / "run_reg"
    result = pretrain_finetune_mlm(
        str(data_tree), str(out), mlm_steps=4, mlm_batch=4, epochs=1,
        batch_size=4, learning_rate=1e-3, compute_dtype="float32",
        bert_config=TINY_BERT, echo=False, row_reg_weight=1.0,
    )
    assert np.isfinite(result["history"][0]["train_loss"])
    assert (out / "logs" / "demo" / "DPMLD" / "whole_record.txt").exists()

    # no CSV + row_reg_weight>0 -> loud failure, not a silent MLM-only run
    os.remove(data_tree / "data" / "processed" / "train_EEG.csv")
    out2 = data_tree / "run_reg_nocsv"
    with pytest.raises(FileNotFoundError, match="row_reg_weight"):
        pretrain_finetune_mlm(
            str(data_tree), str(out2), mlm_steps=4, mlm_batch=4, epochs=1,
            batch_size=4, learning_rate=1e-3, compute_dtype="float32",
            bert_config=TINY_BERT, echo=False, row_reg_weight=1.0,
        )

    # row_reg_weight=0 with no CSV -> plain MLM-only pretext still runs
    result2 = pretrain_finetune_mlm(
        str(data_tree), str(out2), mlm_steps=4, mlm_batch=4, epochs=1,
        batch_size=4, learning_rate=1e-3, compute_dtype="float32",
        bert_config=TINY_BERT, echo=False, row_reg_weight=0.0,
    )
    assert np.isfinite(result2["history"][0]["train_loss"])


def test_cli_predict_roundtrip(data_tree, monkeypatch):
    """Train via train_on (writing a best-F1 checkpoint), then `cli predict`
    evaluates it and writes a per-sample predictions CSV."""
    import dataclasses

    import eeg_multimodal_tpu.models.fusion as F
    import eeg_multimodal_tpu.train.api as api_mod
    from test_trainer import TINY_BERT

    small = dataclasses.replace(TINY_BERT, max_position_embeddings=512)
    orig = F.config_for

    def small_config_for(*a, **kw):
        return dataclasses.replace(orig(*a, **kw), bert_config=small)

    monkeypatch.setattr(F, "config_for", small_config_for)
    monkeypatch.setattr(api_mod.fusion, "config_for", small_config_for)

    # write a checkpoint in the reference layout (training only checkpoints
    # on an f1 improvement, which random fixture data need not produce)
    import jax

    from eeg_multimodal_tpu.train import checkpoint as ckpt_mod

    fc = small_config_for("ti", "lapacian_dropout")
    params = F.init(jax.random.PRNGKey(0), fc)
    ckpt = data_tree / "models" / "custom" / "predtest" / "run" / "best_f1.pickle"
    os.makedirs(ckpt.parent, exist_ok=True)
    ckpt_mod.save_torch_checkpoint(str(ckpt), params, fc)

    out_csv = data_tree / "preds.csv"
    rc = cli.main([
        "predict", str(ckpt), "--data_root", str(data_tree), "-bs", "4",
        "--dtype", "float32", "--out_csv", str(out_csv),
    ])
    assert rc == 0
    lines = out_csv.read_text().strip().splitlines()
    assert lines[0] == "index,prediction,label,score"
    assert len(lines) == 1 + 6  # test split has 6 samples
    for row in lines[1:]:
        i, p, l, s = row.split(",")
        assert p in ("0", "1") and l in ("0", "1")
