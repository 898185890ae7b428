"""Deterministic repro for the fused-DP kernel NaN (VERDICT r2 item 5) —
RESOLVED in round 3: a PRNG edge case, NOT a scan/dual-instance miscompile.

Root cause: the in-kernel Laplace inverse CDF mapped a 24-bit draw of
exactly 0 to u = -0.5, where f32 rounds -1 + 1e-12 back to -1 and
log1p(-1) = -inf. Per (8, 2304) kernel instance that fires with
p ~ 1.1e-3/step — reliably within a few hundred train steps, almost never
in short tests. Round 2's runs were short enough that "single instance /
un-scanned" appeared clean, producing the miscompile misdiagnosis. With
STEPS=1200 this script pinned dual-scan AND single-scan failing at the
SAME step (363 — same noise stream), killing the structural theory.

A first fix (+0.5 half-ulp on 24-bit draws) moved the inf to the other
end: k + 0.5 is not representable in f32 for k >= 2^23, so the top draw
rounds to u01 = 1.0 and log1p(-1) returns at u = +0.5 (observed: failure
moved to step 451). The landed fix draws 23 bits, where k + 0.5 is always
exact: see ops/dp_pallas.py::_laplace_from_bits.

Post-fix, ALL variants PASS at REPRO_STEPS=2400 on the chip, and the
kernel survives full 50-epoch flagship trainings
(examples/train_demo.py --fused_dp).

Variants (run: python tools/repro_fused_dp_scan_nan.py [variant ...];
env: REPRO_STEPS=1200 REPRO_LR=1e-2):
  dual-scan          two kernel instances per step, scanned (the trainer's
                     alternating-phase shape)
  single-scan        one instance, scanned
  dual-python        two instances, python loop (no scan)
  dual-scan-barrier  dual-scan + lax.optimization_barrier between phases
  dual-scan-jaxnoise noise from jax.random (ops/dp.py path) instead of the
                     in-kernel PRNG — isolates the kernel PRNG

Prints a PASS/FAIL table; FAIL = non-finite params, with the first
non-finite step (deterministic per stream). On CPU the kernel runs in
interpret mode via jax.random (the TPU PRNG has no CPU lowering), so the
interesting run is on the chip.
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
