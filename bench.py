"""Headline benchmark: DP-MLD flagship train throughput on one TPU chip.

Replicates the reference's per-epoch cycle exactly — 2402 train samples +
601 eval samples at batch 8 through TICA_LapDropout (BERT-base, 512 tokens,
alternating two-optimizer scheme, stochastic eval) — and reports train
steps/sec over the full cycle.

Baseline: the reference's recorded 67.8 s/epoch on an NVIDIA GPU for the
same cycle (301 train steps) => 4.44 steps/s
(BASELINE.md: python/logs/compare_modal/ti/best_record.txt).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF = os.environ.get("REFERENCE_DIR", "/root/reference")
N_TRAIN, N_EVAL = 2402, 601  # reference dataset scale (SURVEY §6)
BATCH = 8
BASELINE_STEPS_PER_SEC = (N_TRAIN // BATCH + 1) / 67.8  # 301 / 67.8 = 4.44


def load_data():
    from eeg_multimodal_tpu.data import datasets as D

    if os.path.exists(f"{REF}/feature/EEG/test_bert.pickle"):
        tok = D.load_bert_pickle(f"{REF}/feature/EEG/test_bert.pickle")
        emb = D.load_embedding_pickle(f"{REF}/feature/action/test_clip_v2.pickle")
        _, labels = D.load_eeg_feature_csv(f"{REF}/feature/test_EEG.csv")
        reps = -(-N_TRAIN // len(labels))
        ids = np.tile(tok["input_ids"], (reps, 1))[:N_TRAIN]
        mask = np.tile(tok["attention_mask"], (reps, 1))[:N_TRAIN]
        embs = np.tile(emb, (reps, 1))[:N_TRAIN]
        labs = np.tile(labels, reps)[:N_TRAIN]
        train = D.build_pairing(
            "ti", labs, eeg_txt={"input_ids": ids, "attention_mask": mask},
            act_img=embs,
        )
        test = D.build_pairing(
            "ti", labels, eeg_txt=tok, act_img=emb
        )
        return train, test
    # synthetic fallback with identical shapes
    rng = np.random.RandomState(0)

    def synth(n):
        ids = rng.randint(0, 30000, (n, 512)).astype(np.int32)
        m = np.zeros((n, 512), np.int32)
        m[:, :64] = 1
        return D.build_pairing(
            "ti", rng.randint(0, 2, n).astype(np.int32),
            eeg_txt={"input_ids": ids, "attention_mask": m},
            act_img=rng.randn(n, 512).astype(np.float32),
        )

    return synth(N_TRAIN), synth(N_EVAL)


def _probe_device(timeout_s: int = 180) -> bool:
    """Device-attachment watchdog: on the remote (axon) attachment a dead
    tunnel makes jax.devices() hang FOREVER (connection retries), which
    would wedge any harness that invokes this benchmark. Probe in a
    subprocess with a hard timeout so a dead tunnel yields an error line
    instead of a hang."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # probe unless the caller EXPLICITLY pinned the CPU backend: the remote
    # TPU attachment can also be discovered via default backend selection
    # (JAX_PLATFORMS unset), and a dead tunnel hangs jax.devices() forever
    # either way. The subprocess probe is cheap.
    if os.environ.get("JAX_PLATFORMS", "") != "cpu" and not _probe_device():
        print(json.dumps({
            "metric": "dpmld_flagship_train_steps_per_sec", "value": 0.0,
            "unit": "steps/sec", "vs_baseline": 0.0,
            "error": "device attachment unavailable (tunnel down); "
                     "see README Performance for the last recorded number",
        }))
        return

    import jax

    # hardware-friendly PRNG for dropout mask generation (threefry spends
    # ~8 ms/step on mask bits at BERT-base scale; rbg is near-free).
    # Determinism-per-seed is preserved — only the stream changes.
    jax.config.update("jax_default_prng_impl", "rbg")

    # the persistent compile cache hangs under the axon remote-compile
    # tunnel; enable only off-tunnel
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_CACHE", "/tmp/jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from eeg_multimodal_tpu.models import fusion
    from eeg_multimodal_tpu.train.trainer import StepFunctions, TrainConfig
    from eeg_multimodal_tpu.data.datasets import epoch_indices
    from eeg_multimodal_tpu.utils.seeding import set_seed

    from eeg_multimodal_tpu.data.datasets import truncate_pair

    train, test = load_data()
    # exact padding removal (rows are <= 65 of 512 tokens; see
    # data.datasets.truncate_tokens) — the reference burns the same FLOPs on
    # padding, so this is the TPU-native data layout doing the work
    train, test = truncate_pair(train, test)
    fc = fusion.config_for("ti", "lapacian_dropout")
    if not os.environ.get("EEG_BENCH_NO_COMPACT"):
        # exact vocab compaction (data/compact_vocab.py): the numeric corpus
        # touches ~600 of 30522 ids; rows that never receive gradient have
        # identically-zero Adam updates, so dropping them preserves the
        # training trajectory while removing ~23M params of optimizer and
        # gradient HBM traffic per step.
        import dataclasses

        from eeg_multimodal_tpu.data.compact_vocab import (
            build_compact_vocab, remap_pairing,
        )
        from eeg_multimodal_tpu.models.bert import BertConfig

        cv = build_compact_vocab([train.eeg_input, test.eeg_input])
        train = remap_pairing(train, cv)
        test = remap_pairing(test, cv)
        fc = dataclasses.replace(fc, bert_config=BertConfig(vocab_size=cv.size))
    # bf16 Adam moments: the optimizer update is the step's largest HBM
    # consumer (tools/roofline_step.py measures it AT its bandwidth bound),
    # and both moments only feed the update through f32 math after a cast-up
    # (ops/optim.py), so bf16 storage halves their traffic. nu is stored
    # with stochastic rounding (ops/optim.py) so its EMA stays unbiased —
    # round-to-nearest would ratchet it upward. Flagship-accuracy
    # validation at the noisiest frontier cell lands within the measured
    # seed distribution (ACCURACY.md item 14); accuracy tables stay on f32
    # moments.
    # EEG_BENCH_MU_F32=1 / EEG_BENCH_NU_F32=1 restore f32 moments.
    mu = "float32" if os.environ.get("EEG_BENCH_MU_F32") else "bfloat16"
    nu = "float32" if os.environ.get("EEG_BENCH_NU_F32") else "bfloat16"
    # Carry the bf16 compute copy of the params through the epoch scan
    # instead of re-reading the f32 master for a cast every step (same
    # program up to <=1 bf16-ulp excess-precision rounding on a handful of
    # gradient elements — see TrainConfig.precast_params). EEG_BENCH_NO_
    # PRECAST=1 restores the in-step cast.
    precast = not os.environ.get("EEG_BENCH_NO_PRECAST")
    tc = TrainConfig(batch_size=BATCH, compute_dtype="bfloat16",
                     adam_mu_dtype=mu, adam_nu_dtype=nu,
                     precast_params=precast)
    steps = StepFunctions(fc, tc)

    import jax.numpy as jnp

    key = set_seed()
    params = fusion.init(key, fc)
    dp_os, model_os = steps.init_opt_states(params)
    train_dev = train.device_put()
    test_dev = test.device_put()
    n_steps = -(-len(train) // BATCH)

    # ---- attachment-immune timed window -----------------------------------
    # The timed unit is ONE dispatched program running K full train+eval
    # epochs on device (StepFunctions.cycle), closed by a VALUE fetch of the
    # per-epoch metrics. Per-epoch host round-trips over the remote (axon)
    # tunnel cost 100-300 ms each, which put a ±10% "tunnel weather" band on
    # the r02-r04 numbers (93-105 steps/s for the same program); amortizing
    # one dispatch + one fetch over K epochs bounds that term at <2% and the
    # number measures the chip, not the relay. (Value fetch, not
    # block_until_ready: the latter can return before device execution
    # completes on this attachment — see tools/roofline_step.py.)
    K = int(os.environ.get("EEG_BENCH_EPOCHS_PER_CALL", "8"))
    R = int(os.environ.get("EEG_BENCH_WINDOWS", "3"))
    eidx, ew = epoch_indices(
        jax.random.fold_in(key, 10**6), len(test), BATCH, shuffle=False
    )

    def cycle_inputs(e0):
        idxs, ws, tks, eks = [], [], [], []
        for e in range(e0, e0 + K):
            ek = jax.random.fold_in(key, e)
            k1, k2 = jax.random.split(ek)
            idx, w = epoch_indices(k1, len(train), BATCH)
            idxs.append(idx)
            ws.append(w)
            tks.append(k1)
            eks.append(k2)
        return (jnp.stack(idxs), jnp.stack(ws), jnp.stack(tks),
                jnp.stack(eks))

    def run_cycle(params, dp_os, model_os, e0):
        ia, wa, tk, ek2 = cycle_inputs(e0)
        return steps.cycle(
            params, dp_os, model_os, train_dev, test_dev,
            ia, wa, tk, eidx, ew, ek2, 0.1,
        )

    # warmup (compile + first K epochs)
    params, dp_os, model_os, outs = run_cycle(params, dp_os, model_os, 0)
    float(np.asarray(outs[0])[-1])

    times = []
    loss = None
    for r in range(R):
        t0 = time.time()
        params, dp_os, model_os, outs = run_cycle(
            params, dp_os, model_os, K * (r + 1)
        )
        loss = float(np.asarray(outs[0])[-1])  # value fetch closes the window
        times.append(time.time() - t0)
    assert np.isfinite(loss), loss

    epoch_time = float(np.median(times)) / K
    steps_per_sec = n_steps / epoch_time
    result = {
        "metric": "dpmld_flagship_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": (
            "steps/sec (301-step train + 76-batch eval epoch incl. device-"
            f"side F1, batch 8, bf16, 1 chip; {K}-epoch on-device windows)"
        ),
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }

    if os.environ.get("EEG_BENCH_BREAKDOWN"):
        # one-line decomposition: eval epoch (vmapped, all batches in one
        # forward) and the per-epoch dispatch tax the cycle removes
        def eval_once(p):
            # takes params explicitly: train_epoch donates its params input,
            # so a closure over main's `params` would read a donated buffer
            # inside legacy_epoch (TPU InvalidArgument)
            return steps.eval_epoch(p, test_dev, eidx, ew, 0.1, key)[0]

        np.asarray(eval_once(params))
        ev = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(eval_once(params))
            ev.append(time.time() - t0)
        t_eval_call = float(np.median(ev))  # includes one dispatch+fetch

        def legacy_epoch(params, dp_os, model_os, e):
            ek = jax.random.fold_in(key, e)
            k1, k2 = jax.random.split(ek)
            idx, w = epoch_indices(k1, len(train), BATCH)
            params, dp_os, model_os, trl, _ = steps.train_epoch(
                params, dp_os, model_os, train_dev, idx, w, 0.1, k1
            )
            float(np.asarray(trl))
            float(np.asarray(eval_once(params)))
            return params, dp_os, model_os

        base = K * (R + 1)
        params, dp_os, model_os = legacy_epoch(params, dp_os, model_os, base)
        lt = []
        for e in range(3):
            t0 = time.time()
            params, dp_os, model_os = legacy_epoch(
                params, dp_os, model_os, base + 1 + e
            )
            lt.append(time.time() - t0)
        legacy_epoch_time = float(np.median(lt))
        result["breakdown"] = {
            "train_step_ms": round(
                (epoch_time - t_eval_call) / n_steps * 1e3, 3
            ),
            "eval_epoch_ms": round(t_eval_call * 1e3, 1),
            "dispatch_ms_per_epoch": round(
                (legacy_epoch_time - epoch_time) * 1e3, 1
            ),
            "legacy_per_epoch_steps_per_sec": round(
                n_steps / legacy_epoch_time, 1
            ),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
