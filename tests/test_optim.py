"""Tests for ops/optim.py — Adam with configurable moment storage dtypes."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from eeg_multimodal_tpu.ops import optim


def _params():
    k = jax.random.PRNGKey(0)
    return {
        "w": jax.random.normal(k, (16, 8), jnp.float32),
        "b": jnp.linspace(-1.0, 1.0, 8, dtype=jnp.float32),
    }


def _run(opt, params, n=25, lr_grad_scale=1.0):
    state = opt.init(params)
    k = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, state, key):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(key, p.shape, p.dtype) * lr_grad_scale
            + 0.1 * p,
            params,
        )
        upd, state = opt.update(g, state, params)
        return optax.apply_updates(params, upd), state

    for i in range(n):
        params, state = step(params, state, jax.random.fold_in(k, i))
    return params, state


def test_f32_path_is_stock_optax_adam_bitwise():
    params = _params()
    ours, _ = _run(optim.adam(1e-3), params)
    stock, _ = _run(optax.adam(1e-3), params)
    for a, b in zip(jax.tree_util.tree_leaves(ours),
                    jax.tree_util.tree_leaves(stock)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_custom_transform_matches_optax_in_f32():
    # the custom update path (exercised whenever nu_dtype=bf16) reproduces
    # optax.scale_by_adam to float tolerance when storage stays f32
    params = _params()
    custom = optax.chain(
        optim.scale_by_adam_moment_dtypes(), optax.scale(-1e-3)
    )
    ours, _ = _run(custom, params)
    stock, _ = _run(optax.adam(1e-3), params)
    for a, b in zip(jax.tree_util.tree_leaves(ours),
                    jax.tree_util.tree_leaves(stock)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_bf16_nu_storage_dtype_and_trajectory_tolerance():
    params = _params()
    ours, state = _run(
        optim.adam(1e-3, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16), params
    )
    stock, _ = _run(optax.adam(1e-3), params)
    # moments stored at the requested dtypes
    adam_state = state[0]
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(adam_state.mu))
    assert all(l.dtype == jnp.bfloat16
               for l in jax.tree_util.tree_leaves(adam_state.nu))
    # params stay f32 and track the f32-moment trajectory closely
    for a, b in zip(jax.tree_util.tree_leaves(ours),
                    jax.tree_util.tree_leaves(stock)):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3)


def test_stochastic_round_exact_and_unbiased():
    # values already representable in bf16 are returned exactly; for a
    # mid-interval value the mean over many keys converges to the value
    exact = jnp.asarray([1.0, -2.5, 0.0, 3.141592653589793], jnp.float32)
    exact_bf = exact.astype(jnp.bfloat16).astype(jnp.float32)
    out = optim.stochastic_round_to_bf16(exact_bf, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(out.astype(jnp.float32)), np.asarray(exact_bf)
    )

    # bf16 has 7 explicit mantissa bits -> ulp 2^-7 in [1, 2)
    x = jnp.full((20000,), 1.0 + 0.3 * 2.0**-7, jnp.float32)  # 30% into the ulp
    r = optim.stochastic_round_to_bf16(x, jax.random.PRNGKey(1))
    r32 = np.asarray(r.astype(jnp.float32))
    assert set(np.unique(r32)) <= {np.float32(1.0), np.float32(1.0 + 2.0**-7)}
    frac_up = float((r32 > 1.0).mean())
    assert abs(frac_up - 0.3) < 0.02, frac_up
    np.testing.assert_allclose(r32.mean(), float(x[0]), rtol=3e-4)


def test_bf16_nu_rtn_ratchets_sr_decays():
    # the ADVICE-flagged failure mode: with b2=0.999 the per-step EMA decay
    # is sub-ulp in bf16, so round-to-nearest storage can never decrease nu
    # (ratchet); stochastic rounding tracks the decay in expectation.
    import warnings

    params = {"w": jnp.zeros((4096,), jnp.float32)}
    zero_g = {"w": jnp.zeros((4096,), jnp.float32)}
    big_g = {"w": jnp.ones((4096,), jnp.float32)}

    def run(nu_sr, k_decay=400):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            opt = optim.scale_by_adam_moment_dtypes(
                nu_dtype=jnp.bfloat16, nu_stochastic_rounding=nu_sr
            )
        state = opt.init(params)
        upd = jax.jit(opt.update)
        # build nu up with unit grads, then feed zero grads
        for _ in range(50):
            _, state = upd(big_g, state)
        nu_peak = float(np.asarray(state.nu["w"].astype(jnp.float32)).mean())
        for _ in range(k_decay):
            _, state = upd(zero_g, state)
        nu_end = float(np.asarray(state.nu["w"].astype(jnp.float32)).mean())
        return nu_peak, nu_end

    peak_rtn, end_rtn = run(nu_sr=False)
    # RTN: decay rounds back every step -> nu is frozen at its peak
    assert end_rtn == peak_rtn, (peak_rtn, end_rtn)

    peak_sr, end_sr = run(nu_sr=True)
    expected = peak_sr * 0.999**400  # ~0.67x
    # SR: mean over 4096 elements tracks the true EMA closely
    np.testing.assert_allclose(end_sr, expected, rtol=0.05)


def test_bf16_nu_sr_deterministic_and_warns():
    import warnings

    params = _params()
    a1, s1 = _run(optim.adam(1e-3, nu_dtype=jnp.bfloat16), params)
    a2, s2 = _run(optim.adam(1e-3, nu_dtype=jnp.bfloat16), params)
    for x, y in zip(jax.tree_util.tree_leaves((a1, s1)),
                    jax.tree_util.tree_leaves((a2, s2))):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        optim.scale_by_adam_moment_dtypes(
            nu_dtype=jnp.bfloat16, nu_stochastic_rounding=False
        )
    assert any("ratchet" in str(x.message) for x in w)


def _epoch_result(fusion_cfg, tc, n=8):
    from eeg_multimodal_tpu.data.datasets import epoch_indices
    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.trainer import StepFunctions
    from test_trainer import tiny_dataset

    steps = StepFunctions(fusion_cfg, tc)
    params = fusion.init(jax.random.PRNGKey(0), fusion_cfg)
    dp_os, model_os = steps.init_opt_states(params)
    data = tiny_dataset(n).device_put()
    idx, w = epoch_indices(jax.random.PRNGKey(1), n, 4)
    return steps.train_epoch(
        params, dp_os, model_os, data, idx, w, 0.1, jax.random.PRNGKey(2)
    )


def test_precast_params_matches():
    # carrying the bf16 compute copy through the scan (precast_params) is the
    # same program as the cast-inside-the-step path; the only permitted
    # numeric difference is XLA excess precision at the cast boundary (the
    # default path may keep the cotangent in f32 through the in-graph
    # convert), worth at most one bf16 ulp on a tiny fraction of gradient
    # elements. Assert near-total bitwise equality plus a 1-ulp bound, in
    # both the alternating (lapacian_dropout) and single-optimizer (NDP)
    # regimes.
    import dataclasses

    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.trainer import TrainConfig
    from test_trainer import TINY_BERT

    for dp_mode in ("lapacian_dropout", "NDP"):
        cfg = dataclasses.replace(
            fusion.config_for("ti", dp_mode), bert_config=TINY_BERT
        )
        base = TrainConfig(batch_size=4, compute_dtype="bfloat16")
        ref = _epoch_result(cfg, base)
        pre = _epoch_result(
            cfg, dataclasses.replace(base, precast_params=True)
        )
        n_tot = n_eq = 0
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(pre)):
            a, b = np.asarray(a), np.asarray(b)
            assert a.dtype == b.dtype
            np.testing.assert_allclose(
                a.astype(np.float64), b.astype(np.float64),
                rtol=2.0 ** -8, atol=1e-7,
            )
            n_tot += a.size
            n_eq += int((a == b).sum())
        assert n_eq / n_tot > 0.999, f"{dp_mode}: {n_tot - n_eq}/{n_tot} differ"


def test_precast_refuses_fast_modes():
    import dataclasses

    import pytest

    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.trainer import StepFunctions, TrainConfig
    from test_trainer import TINY_BERT

    cfg = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, compute_dtype="bfloat16",
                     precast_params=True, share_phase_dropout=True)
    with pytest.raises(ValueError):
        StepFunctions(cfg, tc)


def test_fit_end_to_end_with_bench_configuration(tmp_path):
    # the exact bench.py configuration (bf16 compute + bf16 Adam moments +
    # precast param carry) through the full Trainer.fit path: records,
    # stochastic eval, best-F1 checkpoint
    import dataclasses
    import os

    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.trainer import Trainer, TrainConfig
    from test_trainer import TINY_BERT, tiny_dataset

    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, epochs=3, compute_dtype="bfloat16",
                     adam_mu_dtype="bfloat16", adam_nu_dtype="bfloat16",
                     precast_params=True)
    tr = Trainer(fc, tc)
    res = tr.fit(tiny_dataset(8), tiny_dataset(6, seed=1), epsilon=0.1,
                 log_path=str(tmp_path / "logs"),
                 model_path=str(tmp_path / "model"), echo=False)
    assert len(res["history"]) == 3
    assert all(np.isfinite(h["train_loss"]) for h in res["history"])
    assert os.path.exists(tmp_path / "logs" / "whole_record.txt")


def test_sweep_composes_with_precast():
    # the vmapped sweep engine maps over _train_epoch's member axis; the
    # precast carry (per-member bf16 copy) must compose with vmap
    import dataclasses

    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.sweep import SweepMember, SweepRunner
    from eeg_multimodal_tpu.train.trainer import TrainConfig
    from test_trainer import TINY_BERT, tiny_dataset

    cfg = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, epochs=2, compute_dtype="bfloat16",
                     adam_mu_dtype="bfloat16", adam_nu_dtype="bfloat16",
                     precast_params=True)
    members = [SweepMember(epsilon=0.1, seed=1), SweepMember(epsilon=1.0, seed=2)]
    runner = SweepRunner(cfg, tc, members)
    out = runner.run(tiny_dataset(8), tiny_dataset(8), echo=False)
    assert len(out) == 2
    for m in out:
        hist = m["history"]
        assert hist and all(np.isfinite(h["train_loss"]) for h in hist)


def test_trainer_accepts_nu_dtype():
    import dataclasses

    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.trainer import StepFunctions, TrainConfig
    from test_trainer import TINY_BERT, tiny_dataset
    from eeg_multimodal_tpu.data.datasets import epoch_indices

    cfg = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"), bert_config=TINY_BERT
    )
    tc = TrainConfig(batch_size=4, adam_nu_dtype="bfloat16",
                     adam_mu_dtype="bfloat16")
    steps = StepFunctions(cfg, tc)
    params = fusion.init(jax.random.PRNGKey(0), cfg)
    dp_os, model_os = steps.init_opt_states(params)
    data = tiny_dataset(8).device_put()
    idx, w = epoch_indices(jax.random.PRNGKey(1), 8, 4)
    params, dp_os, model_os, loss, acc = steps.train_epoch(
        params, dp_os, model_os, data, idx, w, 0.1, jax.random.PRNGKey(2)
    )
    assert np.isfinite(float(loss))
    nus = jax.tree_util.tree_leaves(model_os[0].nu)
    assert all(l.dtype == jnp.bfloat16 for l in nus)
