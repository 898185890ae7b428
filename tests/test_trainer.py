"""End-to-end trainer smoke test on tiny synthetic data (CPU).

Covers SURVEY.md §4's planned layers: determinism (same seed => identical
params after k steps), the alternating-optimizer scheme, the legacy record
format round trip, and best-F1 checkpointing in the reference state-dict
format.
"""
import dataclasses
import os

import numpy as np
import pytest
import jax.numpy as jnp
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.data.datasets import MultiModalArrays
from eeg_multimodal_tpu.models import bert as B
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train import checkpoint as ckpt
from eeg_multimodal_tpu.train.records import parse_legacy_records
from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer

TINY_BERT = B.BertConfig(
    vocab_size=50, hidden_size=768, num_layers=1, num_heads=12,
    intermediate_size=64, max_position_embeddings=16,
)


def tiny_dataset(n=10, seq=8, seed=0):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 2, n).astype(np.int32)
    ids = rng.randint(0, 50, size=(n, seq)).astype(np.int32)
    mask = np.ones((n, seq), np.int32)
    emb = (rng.randn(n, 1, 512) + labels[:, None, None]).astype(np.float32)
    emask = np.ones((n, 1), np.int32)
    return MultiModalArrays(ids, mask, emb, emask, labels, "ti")


def make_trainer(dp_mode="lapacian_dropout", lr=1e-3, epochs=2):
    fc = dataclasses.replace(
        fusion.config_for("ti", dp_mode), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, learning_rate=lr, epochs=epochs)
    return Trainer(fc, tc)


@pytest.mark.slow
def test_trainer_runs_and_records(tmp_path):
    tr = make_trainer()
    train, test = tiny_dataset(10), tiny_dataset(6, seed=1)
    log_path = str(tmp_path / "logs")
    model_path = str(tmp_path / "best_f1.pickle")
    out = tr.fit(train, test, epsilon=1.0, log_path=log_path,
                 model_path=model_path, echo=False)
    assert len(out["history"]) == 2
    for row in out["history"]:
        for k in ("train_loss", "test_loss", "f1"):
            assert np.isfinite(row[k])

    recs = parse_legacy_records(
        open(os.path.join(log_path, "whole_record.txt")).read()
    )
    assert len(recs) == 2
    assert recs[0]["epoch"] == 1
    assert abs(recs[1]["Test Accuracy"] - round(out["history"][1]["test_acc"], 3)) < 2e-3

    if out["f1_best"] > 0.5:
        assert os.path.exists(model_path)
        params2 = ckpt.load_torch_checkpoint(model_path, tr.fusion_cfg)
        assert params2["DP"].shape == (1, 2304)


@pytest.mark.slow
def test_trainer_is_deterministic_per_seed():
    outs = []
    for _ in range(2):
        tr = make_trainer(epochs=1)
        train, test = tiny_dataset(8), tiny_dataset(4, seed=1)
        tr.fit(train, test, epsilon=1.0)
        outs.append(jax.tree_util.tree_leaves(tr.params))
    for a, b in zip(*outs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_dp_param_actually_trains():
    """The alternating scheme must move the DP parameter (phase 1) and the
    model parameters (phase 2)."""
    tr = make_trainer(epochs=1, lr=1e-2)
    dp_before = np.asarray(tr.params["DP"]).copy()
    cls_before = np.asarray(tr.params["classifier"]["kernel"]).copy()
    train, test = tiny_dataset(8), tiny_dataset(4, seed=1)
    tr.fit(train, test, epsilon=1.0)
    assert np.abs(np.asarray(tr.params["DP"]) - dp_before).max() > 0
    assert np.abs(np.asarray(tr.params["classifier"]["kernel"]) - cls_before).max() > 0


def test_single_optimizer_mode_ndp():
    tr = make_trainer(dp_mode="NDP", epochs=1)
    train, test = tiny_dataset(8), tiny_dataset(4, seed=1)
    out = tr.fit(train, test, epsilon=1.0)
    assert np.isfinite(out["history"][0]["train_loss"])
    assert "DP" not in tr.params


def test_truncate_tokens_is_exact():
    """Truncating all-padding columns must not change logits."""
    import dataclasses

    from eeg_multimodal_tpu.data.datasets import truncate_pair, truncate_tokens
    from eeg_multimodal_tpu.models import fusion as F

    data = tiny_dataset(6)
    # widen tokens to 16 with only first 5 valid
    ids = np.zeros((6, 16), np.int32)
    mask = np.zeros((6, 16), np.int32)
    ids[:, :8] = data.eeg_input
    mask[:, :5] = 1
    import dataclasses as dc

    wide = dc.replace(data, eeg_input=ids, eeg_mask=mask)
    cut = truncate_tokens(wide, multiple=8)
    assert cut.eeg_input.shape[1] == 8
    np.testing.assert_array_equal(cut.eeg_input, ids[:, :8])

    cfg = dataclasses.replace(F.config_for("ti", "NDP"), bert_config=TINY_BERT)
    params = F.init(jax.random.PRNGKey(0), cfg)

    def logits(arr):
        batch = {
            "eeg_input": jnp.asarray(arr.eeg_input),
            "eeg_mask": jnp.asarray(arr.eeg_mask),
            "act_input": jnp.asarray(arr.act_input),
            "act_mask": jnp.asarray(arr.act_mask),
        }
        return np.asarray(F.apply(params, batch, cfg, 0.1, True, None, False))

    np.testing.assert_allclose(logits(wide), logits(cut), rtol=1e-4, atol=1e-5)

    a, b = truncate_pair(wide, wide, multiple=8)
    assert a.eeg_input.shape[1] == b.eeg_input.shape[1] == 8


@pytest.mark.slow
def test_n_eval_repeated_evaluation():
    """n_eval > 1 averages stochastic eval repeats (majority-vote preds)."""
    tr = make_trainer(epochs=1)
    tr8 = make_trainer(epochs=1)
    tr8.train_cfg = dataclasses.replace(tr8.train_cfg, n_eval=4)
    tr8.steps = type(tr.steps)(tr8.fusion_cfg, tr8.train_cfg)
    train, test = tiny_dataset(8), tiny_dataset(4, seed=1)
    out1 = tr.fit(train, test, epsilon=0.05)
    out4 = tr8.fit(train, test, epsilon=0.05)
    for o in (out1, out4):
        assert np.isfinite(o["history"][0]["test_loss"])
    # repeated eval under heavy noise is a valid (generally different) estimate
    assert out4["history"][0]["test_loss"] > 0


def test_shared_feature_step_is_exact_rewrite():
    """With share_phase_dropout=True, the one-encoder-pass step
    (reuse_phase_features) must reproduce the two-forward step's trajectory:
    the features never depend on the DP param, so sharing the encoder
    computation and its vjp across phases is a pure rewrite."""
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    train, test = tiny_dataset(8), tiny_dataset(6, seed=1)

    def run(reuse):
        tc = TrainConfig(batch_size=4, learning_rate=1e-3, epochs=2,
                         share_phase_dropout=True, reuse_phase_features=reuse)
        tr = Trainer(fc, tc)
        return tr.fit(train, test, epsilon=1.0, echo=False)

    two_fwd = run(False)
    one_fwd = run(True)
    for a, b in zip(two_fwd["history"], one_fwd["history"]):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=1e-5)
        np.testing.assert_allclose(a["test_loss"], b["test_loss"], rtol=1e-5)
        np.testing.assert_allclose(a["test_acc"], b["test_acc"], rtol=1e-6)


def test_reuse_without_shared_dropout_refused():
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, epochs=1, share_phase_dropout=False,
                     reuse_phase_features=True)
    tr = Trainer(fc, tc)
    with pytest.raises(ValueError, match="share_phase_dropout"):
        tr.fit(tiny_dataset(8), tiny_dataset(6, seed=1), epsilon=1.0, echo=False)


def test_paired_phase_encode_is_exact_rewrite():
    """Batching the two phases' encoder forwards over their dropout keys
    (paired_phase_encode) must reproduce the sequential two-forward step:
    same params, same per-phase keys (threefry is vmap-invariant), fresh
    dropout per forward as in the reference."""
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    train, test = tiny_dataset(8), tiny_dataset(6, seed=1)

    def run(paired):
        tc = TrainConfig(batch_size=4, learning_rate=1e-3, epochs=2,
                         paired_phase_encode=paired)
        tr = Trainer(fc, tc)
        return tr.fit(train, test, epsilon=1.0, echo=False)

    sequential = run(False)
    paired = run(True)
    for a, b in zip(sequential["history"], paired["history"]):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"], rtol=1e-5)
        np.testing.assert_allclose(a["test_loss"], b["test_loss"], rtol=1e-5)
        np.testing.assert_allclose(a["test_acc"], b["test_acc"], rtol=1e-6)


def test_deferred_best_checkpoint_matches_best_epoch(tmp_path):
    """defer_best_checkpoint writes, at the END of fit, the params of the
    BEST epoch (not the last) — same artifact as the reference's
    per-improvement torch.save at a fraction of the tunnel traffic."""
    tr = make_trainer(epochs=3, lr=1e-2)
    train, test = tiny_dataset(10), tiny_dataset(6, seed=1)
    snaps = {}

    def hook(epoch):
        snaps[epoch] = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32).copy(), tr.params
        )

    model_path = str(tmp_path / "best_f1.pickle")
    out = tr.fit(train, test, epsilon=1.0, model_path=model_path,
                 echo=False, epoch_end_hook=hook)
    assert out["best"] is not None
    best_epoch = out["best"]["epoch"] - 1  # rows are 1-based
    loaded = ckpt.load_torch_checkpoint(model_path, tr.fusion_cfg)
    want = snaps[best_epoch]
    np.testing.assert_allclose(
        np.asarray(loaded["DP"], np.float32), want["DP"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(loaded["classifier"]["kernel"], np.float32),
        want["classifier"]["kernel"], rtol=1e-6,
    )


def test_pending_best_survives_sigterm(tmp_path):
    """A deferred best checkpoint pending in device memory is flushed to
    disk when the process is killed (SIGTERM handler in Trainer.fit), so
    deferral never loses the reference's per-improvement durability
    (base_train.py:251) to preemption."""
    import signal
    import subprocess
    import sys

    script = r"""
import dataclasses, os, signal, sys
sys.path.insert(0, %(tests_dir)r)
import conftest  # CPU backend + compile cache
from test_trainer import TINY_BERT, tiny_dataset
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer

fc = dataclasses.replace(
    fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
)
# f1_best_init=-1: epoch 1 always records a best; defer_flush_epochs=0:
# the periodic flush never runs, only the signal path can save it
tc = TrainConfig(batch_size=4, epochs=50, f1_best_init=-1.0,
                 defer_best_checkpoint=True, defer_flush_epochs=0)
tr = Trainer(fc, tc)

def hook(epoch):
    if epoch == 0:
        print("KILLING", flush=True)
        os.kill(os.getpid(), signal.SIGTERM)

tr.fit(tiny_dataset(8), tiny_dataset(6, seed=1), epsilon=1.0,
       model_path=%(model_path)r, echo=False, epoch_end_hook=hook)
print("UNREACHABLE", flush=True)
""" % {"tests_dir": os.path.dirname(os.path.abspath(__file__)),
       "model_path": str(tmp_path / "best_f1.pickle")}

    r = subprocess.run([sys.executable, "-c", script], capture_output=True,
                       text=True, timeout=600)
    assert "KILLING" in r.stdout, r.stdout + r.stderr
    assert "UNREACHABLE" not in r.stdout, "SIGTERM did not terminate fit"
    assert r.returncode == -signal.SIGTERM, (r.returncode, r.stderr[-2000:])
    # the pending best was flushed by the handler before death
    tr = make_trainer()
    loaded = ckpt.load_torch_checkpoint(
        str(tmp_path / "best_f1.pickle"), tr.fusion_cfg
    )
    assert "DP" in loaded


def test_eval_vmap_matches_scan():
    """eval_vmap_batches runs every test batch in one vmapped forward; under
    the vmap-invariant threefry PRNG it reproduces the sequential scan (same
    pre-split per-batch keys, no cross-batch dependence): integer preds and
    labels exactly, float reductions to ulp-level tolerance (batched matmuls
    may fuse differently than sequential ones)."""
    from eeg_multimodal_tpu.data.datasets import epoch_indices
    from eeg_multimodal_tpu.train.trainer import StepFunctions

    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    test = tiny_dataset(10, seed=1)
    key = jax.random.PRNGKey(7)
    params = fusion.init(key, fc)
    eidx, ew = epoch_indices(key, len(test), 4, shuffle=False)
    outs = []
    for vmapped in (False, True):
        tc = TrainConfig(batch_size=4, n_eval=2, eval_vmap_batches=vmapped)
        steps = StepFunctions(fc, tc)
        outs.append(steps.eval_epoch(
            params, test.device_put(), eidx, ew, 0.1, key
        ))
    for a, b in zip(*outs):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_cycle_matches_sequential_epochs():
    """StepFunctions.cycle (K epochs scanned on device, one dispatch) must
    reproduce the per-epoch train_epoch/eval_epoch call sequence exactly —
    it is the same program with the host round-trips removed."""
    from eeg_multimodal_tpu.data.datasets import epoch_indices
    from eeg_multimodal_tpu.train import metrics as M
    from eeg_multimodal_tpu.train.trainer import StepFunctions

    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    train, test = tiny_dataset(8), tiny_dataset(6, seed=1)
    tc = TrainConfig(batch_size=4)
    key = jax.random.PRNGKey(3)
    K = 3

    def epoch_inputs(e):
        ek = jax.random.fold_in(key, e)
        k1, k2 = jax.random.split(ek)
        idx, w = epoch_indices(k1, len(train), 4)
        return idx, w, k1, k2

    eidx, ew = epoch_indices(key, len(test), 4, shuffle=False)

    # sequential reference: fresh StepFunctions + state
    steps = StepFunctions(fc, tc)
    params = fusion.init(jax.random.PRNGKey(9), fc)
    params0 = jax.tree_util.tree_map(jnp.copy, params)
    dp_os, model_os = steps.init_opt_states(params)
    seq = []
    for e in range(K):
        idx, w, k1, k2 = epoch_inputs(e)
        params, dp_os, model_os, trl, tra = steps.train_epoch(
            params, dp_os, model_os, train.device_put(), idx, w, 0.1, k1
        )
        tel, tea, preds, labels, _, ws = steps.eval_epoch(
            params, test.device_put(), eidx, ew, 0.1, k2
        )
        f1 = M.f1_binary_jnp(
            jnp.asarray(labels).reshape(-1), jnp.asarray(preds).reshape(-1),
            jnp.asarray(ws).reshape(-1),
        )
        seq.append((float(trl), float(tra), float(tel), float(tea), float(f1)))
    params_seq = params

    # cycled: one call
    ins = [epoch_inputs(e) for e in range(K)]
    idx_all = jnp.stack([i[0] for i in ins])
    w_all = jnp.stack([i[1] for i in ins])
    tkeys = jnp.stack([i[2] for i in ins])
    ekeys = jnp.stack([i[3] for i in ins])
    steps2 = StepFunctions(fc, tc)
    dp_os2, model_os2 = steps2.init_opt_states(params0)
    params_cyc, _, _, outs = steps2.cycle(
        params0, dp_os2, model_os2, train.device_put(), test.device_put(),
        idx_all, w_all, tkeys, eidx, ew, ekeys, 0.1,
    )
    for e in range(K):
        got = tuple(float(np.asarray(o[e])) for o in outs)
        np.testing.assert_allclose(got, seq[e], rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(params_seq),
        jax.tree_util.tree_leaves(params_cyc),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        )
