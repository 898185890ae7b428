"""Minimal repro: fused-DP Pallas kernel NaNs when TWO instances are embedded
in one scanned train step (VERDICT r2 item 5; models/fusion.py:60-75).

Observed on v5e via the axon remote-compile tunnel (2026-08): the flagship
trainer embeds the fused kernel once per alternating phase — two
`pallas_call` instances inside the `lax.scan` body — and params go NaN
within ~50 steps, while the identical math runs clean un-scanned or with a
single instance. This script strips the trainer to the smallest program
with the same structure:

  per step:  phase 1  g_DP    = grad of loss(fused_lap_dropout(f, DP, s1))
             phase 2  g_model = grad of loss(fused_lap_dropout(f, DP, s2))
             two Adam updates, all inside one lax.scan over steps.

Variants (run: python tools/repro_fused_dp_scan_nan.py [variant ...]):
  dual-scan        the failing shape: two kernel instances, scanned
  single-scan      one kernel instance, scanned          (expected finite)
  dual-python      two instances, python loop (no scan)  (expected finite)
  dual-scan-barrier  dual-scan + lax.optimization_barrier between phases
  dual-scan-jaxnoise two instances, scanned, but noise from jax.random
                     (the ops/dp.py path) instead of the in-kernel PRNG —
                     isolates the kernel/PRNG from the scan structure

Exit code 0 and a PASS/FAIL table; FAIL = non-finite params. On CPU the
kernel runs in interpret mode and every variant passes (the miscompile is
toolchain-specific), so the interesting run is on the TPU.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eeg_multimodal_tpu.ops import dp_pallas
from eeg_multimodal_tpu.ops import dp as dp_ops

B, F = 8, 2304
STEPS = int(os.environ.get("REPRO_STEPS", "120"))
LR = float(os.environ.get("REPRO_LR", "1e-2"))
EPS = 0.1


def make_step(n_instances: int, barrier: bool, jax_noise: bool):
    opt = optax.adam(LR)

    def dp_block(feature_raw, DP, seed_or_key):
        if jax_noise:
            # the production un-fused path (ops/dp.py): same math, noise
            # from the threefry PRNG outside any Pallas kernel
            feature = dp_ops.minmax_normalize(feature_raw)
            return dp_ops.lap_dropout_fast(
                feature, DP, EPS, seed_or_key, hard=True
            )
        return dp_pallas.fused_lap_dropout(
            feature_raw, DP, jnp.asarray(EPS, jnp.float32), seed_or_key
        )

    def phase_loss(params, base, seed_or_key):
        f = base * params["scale"]  # (B, F) raw features, grad flows to scale
        out = dp_block(f, params["DP"], seed_or_key)
        return jnp.mean(jnp.square(out))

    def seeds_from(key):
        if jax_noise:
            return jax.random.split(key)
        k1, k2 = jax.random.split(key)
        return (
            jax.random.randint(k1, (1,), 0, 2**31 - 1, jnp.int32),
            jax.random.randint(k2, (1,), 0, 2**31 - 1, jnp.int32),
        )

    def step(carry, key):
        params, opt_state, base = carry
        s1, s2 = seeds_from(key)
        # phase 1: grad wrt DP only (trainer masks the rest via dead-code)
        g1 = jax.grad(lambda dp: phase_loss({**params, "DP": dp}, base, s1))(
            params["DP"]
        )
        if barrier:
            (g1, params, base) = jax.lax.optimization_barrier((g1, params, base))
        if n_instances == 2:
            # phase 2: grad wrt the model param through a second instance
            g2 = jax.grad(
                lambda sc: phase_loss({**params, "scale": sc}, base, s2)
            )(params["scale"])
        else:
            g2 = jnp.zeros_like(params["scale"])
        grads = {"DP": g1, "scale": g2}
        upd, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return (params, opt_state, base), jnp.mean(params["DP"])

    return opt, step


def run(variant: str) -> bool:
    n_inst = 1 if variant == "single-scan" else 2
    barrier = "barrier" in variant
    jax_noise = "jaxnoise" in variant
    scanned = "python" not in variant

    opt, step = make_step(n_inst, barrier, jax_noise)
    params = {
        "DP": jnp.zeros((1, F), jnp.float32),
        "scale": jnp.asarray(1.0, jnp.float32),
    }
    base = jnp.asarray(np.random.RandomState(0).randn(B, F), jnp.float32)
    opt_state = opt.init(params)
    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)

    if scanned:
        @jax.jit
        def go(params, opt_state, base, keys):
            (params, _, _), trace = jax.lax.scan(
                step, (params, opt_state, base), keys
            )
            return params, trace

        params, trace = go(params, opt_state, base, keys)
    else:
        step_j = jax.jit(step)
        carry = (params, opt_state, base)
        trace = []
        for k in keys:
            carry, t = step_j(carry, k)
            trace.append(t)
        params, trace = carry[0], jnp.stack(trace)

    finite = all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(params)
    )
    first_bad = (
        int(jnp.argmax(~jnp.isfinite(trace)))
        if not bool(jnp.all(jnp.isfinite(trace)))
        else -1
    )
    print(
        f"{variant:22s} {'PASS' if finite else 'FAIL':4s} "
        f"dp_mean_trace[-1]={float(trace[-1]):+.5f}"
        + (f" first_nonfinite_step={first_bad}" if first_bad >= 0 else "")
    )
    return finite


if __name__ == "__main__":
    variants = sys.argv[1:] or [
        "dual-scan", "single-scan", "dual-python",
        "dual-scan-barrier", "dual-scan-jaxnoise",
    ]
    print(f"backend={jax.default_backend()} steps={STEPS} shape=({B},{F})")
    results = {v: run(v) for v in variants}
    # informational, never a hard exit: the point is the printed table
    sys.exit(0)
