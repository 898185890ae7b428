"""DP-SGD subsystem tests: accountant math, clipping, Poisson sampling,
trainable-subtree selection, and a tiny end-to-end DP-SGD fit."""
import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from eeg_multimodal_tpu.dp import accountant, dpsgd
from eeg_multimodal_tpu.models import bert as B
from eeg_multimodal_tpu.models import fusion


def test_accountant_monotone_in_sigma():
    q, steps, delta = 8 / 2402, 50 * 301, 1 / 301
    eps = [accountant.epsilon(q, s, steps, delta) for s in (0.6, 1.0, 2.0, 4.0)]
    assert all(a > b for a, b in zip(eps, eps[1:]))
    assert eps[-1] > 0


def test_accountant_gaussian_no_subsampling_anchor():
    """q=1: RDP = steps * a/(2 sigma^2); spot-check conversion is finite and
    decreasing in sigma."""
    e1 = accountant.epsilon(1.0, 2.0, 1, 1e-5)
    e2 = accountant.epsilon(1.0, 4.0, 1, 1e-5)
    assert 0 < e2 < e1 < 10


def test_get_noise_multiplier_round_trip():
    q, delta = 8 / 2402, 1 / 301
    steps = 50 * 301
    for target in (0.5, 2.0, 7.5):
        sigma = accountant.get_noise_multiplier(
            target_epsilon=target, target_delta=delta, sample_rate=q, steps=steps
        )
        achieved = accountant.epsilon(q, sigma, steps, delta)
        assert achieved <= target + 1e-6
        assert achieved > target * 0.8, (target, achieved, sigma)


def test_clip_per_example_norms():
    rng = np.random.RandomState(0)
    grads = {
        "a": jnp.asarray(rng.randn(4, 10).astype(np.float32) * 5),
        "b": jnp.asarray(rng.randn(4, 3, 3).astype(np.float32) * 5),
    }
    clipped = dpsgd.clip_per_example(grads, max_norm=0.1)
    for i in range(4):
        n = math.sqrt(
            float(jnp.sum(clipped["a"][i] ** 2) + jnp.sum(clipped["b"][i] ** 2))
        )
        assert n <= 0.1 + 1e-5


def test_poisson_batch_statistics():
    n, q = 2402, 8 / 2402
    counts = []
    for s in range(200):
        idx, w = dpsgd.poisson_batch_indices(jax.random.PRNGKey(s), n, q)
        counts.append(float(w.sum()))
        assert idx.shape == w.shape
    mean = np.mean(counts)
    assert abs(mean - n * q) < 0.75  # E = 8
    # selected indices must be distinct where weighted
    idx, w = dpsgd.poisson_batch_indices(jax.random.PRNGKey(0), n, q)
    sel = np.asarray(idx)[np.asarray(w) > 0]
    assert len(set(sel.tolist())) == len(sel)


def test_trainable_predicate_matches_reference_layer_set():
    # ref base_train.py:322: [bert.encoder.layer[-1], bert.pooler, fc_layers,
    # visual_encoder, classifier]
    assert dpsgd.trainable_predicate("bert/layers/11/attn/query/kernel")
    assert not dpsgd.trainable_predicate("bert/layers/10/attn/query/kernel")
    assert dpsgd.trainable_predicate("bert/pooler/kernel")
    assert not dpsgd.trainable_predicate("bert/embeddings/word")
    assert dpsgd.trainable_predicate("fc1/kernel")
    assert dpsgd.trainable_predicate("fc2/bias")
    assert dpsgd.trainable_predicate("classifier/kernel")
    assert dpsgd.trainable_predicate("visual_encoder/bias")
    assert not dpsgd.trainable_predicate("cross/layers/0/linear1/kernel")
    # 2-layer test config: last layer index shifts
    assert dpsgd.trainable_predicate("bert/layers/1/attn/query/kernel", bert_layers=2)


def test_dpsgd_trainer_end_to_end(tmp_path):
    from eeg_multimodal_tpu.train.dpsgd_trainer import DPSGDTrainer
    from test_trainer import TINY_BERT, tiny_dataset

    fc = dataclasses.replace(
        fusion.config_for("ti", "DPSGD"), bert_config=TINY_BERT
    )
    tr = DPSGDTrainer(
        fc,
        dpsgd.DPSGDConfig(
            target_epsilon=7.5, epochs=2, batch_size=4, learning_rate=1e-3
        ),
    )
    frozen_before = np.asarray(tr.params["bert"]["embeddings"]["word"]).copy()
    cls_before = np.asarray(tr.params["classifier"]["kernel"]).copy()
    out = tr.fit(tiny_dataset(12), tiny_dataset(6, seed=1),
                 log_path=str(tmp_path / "logs"), echo=False)
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train_loss"])
    assert out["sigma"] > 0
    # frozen params untouched; trainable params moved
    np.testing.assert_array_equal(
        np.asarray(tr.params["bert"]["embeddings"]["word"]), frozen_before
    )
    assert np.abs(np.asarray(tr.params["classifier"]["kernel"]) - cls_before).max() > 0
