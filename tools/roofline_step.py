"""Roofline decomposition of the flagship train step (VERDICT r2 item 6).

Methodology: **scan-length differencing**. The axon TPU attachment adds
~30-150 ms of host<->device round-trip per dispatched program, so timing an
isolated jitted call measures the tunnel, not the chip (v1 of this tool
"measured" an encoder forward at 35.9 ms whose in-scan cost is ~2 ms, and a
0.57 ms "train step" that would imply 770 TFLOP/s on a 197 TFLOP/s part).
Instead, every component here is embedded in a ``lax.scan`` with a
per-iteration data dependence (varying PRNG key, or the evolving optimizer
state) so XLA can neither hoist nor DCE it, and the reported time is the
MARGINAL per-iteration cost between a short and a long scan:

    t(component) = (T(scan_long) - T(scan_short)) / (long - short)

Dispatch overhead, argument transfer, and any constant setup cancel in the
difference. Each component is compared against its speed-of-light bound:

  FLOP bound  = component FLOPs / 197 TFLOP/s   (v5e bf16 peak)
  HBM bound   = component bytes / 819 GB/s      (v5e HBM bandwidth)
  light(c)    = max(FLOP bound, HBM bound)

If the measured marginal step ~= sum of the HBM-bound parts, the step is
bandwidth-bound and the ceiling is set by parameter/optimizer traffic, not
by any fusable compute.

Run on the TPU: python tools/roofline_step.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from eeg_multimodal_tpu.data.compact_vocab import build_compact_vocab, remap_pairing
from eeg_multimodal_tpu.data import datasets as D
from eeg_multimodal_tpu.data.datasets import epoch_indices, truncate_pair
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.models.bert import BertConfig
from eeg_multimodal_tpu.models import bert as bert_mod
from eeg_multimodal_tpu.train.trainer import StepFunctions, TrainConfig
from eeg_multimodal_tpu.utils.seeding import set_seed
from eeg_multimodal_tpu.utils.trees import tree_cast

PEAK_TF = 197e12  # v5e bf16
PEAK_BW = 819e9  # v5e HBM bytes/s
B = 8
N_SHORT = int(os.environ.get("ROOFLINE_N_SHORT", 10))
N_LONG = int(os.environ.get("ROOFLINE_N_LONG", 110))

REF = os.environ.get("REFERENCE_DIR", "/root/reference")


def median_time(fn, n=7):
    """Median wall time of fn() forcing a VALUE fetch of its (scalar) result.

    np.asarray, not block_until_ready: on the axon remote attachment,
    block_until_ready can return without awaiting device execution for
    donated-input programs (roofline v3 "measured" a 110-step train epoch at
    7.6 ms this way — less than one real step). Fetching the scalar's value
    round-trips through the device and cannot lie."""
    np.asarray(fn())  # compile + warm
    np.asarray(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def marginal(make_scan_fn, name=""):
    """Marginal per-iteration seconds between N_SHORT and N_LONG scans.

    Prints the raw short/long medians: a marginal is only trustworthy when
    T(long) >> T(short); if the two are close the measurement is dominated
    by per-call overhead and the marginal is noise."""
    t_s = median_time(make_scan_fn(N_SHORT))
    t_l = median_time(make_scan_fn(N_LONG))
    print(f"    [{name}] raw T({N_SHORT})={t_s*1e3:.3f} ms  "
          f"T({N_LONG})={t_l*1e3:.3f} ms")
    return (t_l - t_s) / (N_LONG - N_SHORT)


def tree_bytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def tree_count(tree):
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def main():
    tok = D.load_bert_pickle(f"{REF}/feature/EEG/test_bert.pickle")
    emb = D.load_embedding_pickle(f"{REF}/feature/action/test_clip_v2.pickle")
    _, labels = D.load_eeg_feature_csv(f"{REF}/feature/test_EEG.csv")
    train = D.build_pairing("ti", labels, eeg_txt=tok, act_img=emb)
    train, _ = truncate_pair(train, train)
    cv = build_compact_vocab([train.eeg_input])
    train = remap_pairing(train, cv)
    S = train.eeg_input.shape[1]

    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"),
        bert_config=BertConfig(vocab_size=cv.size),
    )
    tc = TrainConfig(batch_size=B, compute_dtype="bfloat16",
                     adam_mu_dtype="bfloat16")
    steps = StepFunctions(fc, tc)
    key = set_seed()
    params = fusion.init(key, fc)
    dp_os, model_os = steps.init_opt_states(params)
    train_dev = train.device_put()

    bert_cfg = fc.bert_cfg()
    H, L, I = bert_cfg.hidden_size, bert_cfg.num_layers, bert_cfg.intermediate_size
    T = B * S
    p_layer = 4 * H * H + 2 * H * I  # qkvo + ffn weights per layer
    p_encoder = L * p_layer
    # encoder matmul FLOPs per forward: 2 FLOP/param/token + attention einsums
    f_fwd = 2 * p_encoder * T + L * (2 * 2 * B * S * S * H)
    n_params = tree_count(params)
    by_params = tree_bytes(params)  # f32 master copy

    print(f"flagship shape: B={B} S={S} vocab={cv.size} params={n_params/1e6:.1f}M "
          f"(f32 {by_params/1e6:.0f} MB)  encoder fwd FLOPs={f_fwd/1e9:.1f}G  "
          f"marginal over {N_SHORT}->{N_LONG}-step scans")
    rows = []

    def row(name, t, flops, bytes_):
        t_flop, t_hbm = flops / PEAK_TF, bytes_ / PEAK_BW
        light = max(t_flop, t_hbm)
        bound = "flop" if t_flop > t_hbm else "hbm"
        rows.append((name, t, light, bound))
        print(f"{name:36s} {t*1e3:8.3f} ms   light {light*1e3:7.3f} ms "
              f"({bound}-bound, {100*light/max(t,1e-12):5.1f}% of light)")
        return t

    # ---- the faithful train step: marginal over real train_epoch scans ----
    # train_epoch donates params/opt state, so thread fresh copies per call
    # via a stateful closure (the compile is cached across lengths? no —
    # different idx lengths are different programs; each compiles once).
    n_data = train.eeg_input.shape[0]

    def make_epoch(n):
        idx, w = epoch_indices(key, n * B, B)
        idx = idx % n_data  # wrap synthetic epochs onto the real 601 rows

        def run(state=[None]):
            if state[0] is None:
                # fresh copies: train_epoch donates its inputs, and the
                # originals are reused by the component scans below
                state[0] = jax.tree_util.tree_map(
                    jnp.copy, (params, dp_os, model_os)
                )
            p, d_os, m_os = state[0]
            p, d_os, m_os, tl, _ = steps.train_epoch(
                p, d_os, m_os, train_dev, idx, w, 0.1, key
            )
            state[0] = (p, d_os, m_os)
            return tl

        return run

    t_step = marginal(make_epoch, "train epoch")
    # faithful step: 2 encoder fwd + 1 encoder bwd (phase1 bwd is DP-only);
    # bytes: params f32 read+bf16 write per phase cast (CSE'd to ~1x),
    # bwd re-reads bf16 params, grads f32, adam r/w p,v f32 + m bf16
    f_step = 2 * f_fwd + 2 * f_fwd  # bwd ~ 2x fwd
    by_adam = n_params * (4 + 2 + 4 + 4 + 2 + 4 + 4)  # r p,m,v,g + w p,m,v
    by_step = int(1.5 * by_params) + by_params // 2 + by_adam
    row("faithful train step (marginal)", t_step, f_step, by_step)

    # ---- eval step (1 forward, no grads/opt) -------------------------------
    def make_eval(n):
        eidx, ew = epoch_indices(key, n * B, B, shuffle=False)
        eidx = eidx % n_data

        def run():
            return steps.eval_epoch(params, train_dev, eidx, ew, 0.1, key)[0]

        return run

    t_eval = row("eval step (marginal)", marginal(make_eval, "eval epoch"),
                 f_fwd, by_params // 2)

    # ---- encoder forward, per-iteration fresh dropout key ------------------
    bp16 = tree_cast(params["bert"], jnp.bfloat16)
    ids = train_dev["eeg_input"][:B]
    am = train_dev["eeg_mask"][:B]

    def make_enc(n):
        keys = jax.random.split(key, n)

        @jax.jit
        def scan(p):
            def it(acc, k):
                seq, pooled = bert_mod.apply(p, ids, am, bert_cfg, dropout_key=k)
                return acc + pooled.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(it, jnp.float32(0), keys)
            return acc

        return lambda: scan(bp16)

    t_enc = row("encoder fwd (bf16 + dropout)", marginal(make_enc, "enc fwd"),
                f_fwd, tree_bytes(bp16))

    # ---- encoder fwd+bwd ----------------------------------------------------
    def make_encg(n):
        keys = jax.random.split(key, n)

        @jax.jit
        def scan(p):
            def loss(p_, k):
                seq, pooled = bert_mod.apply(p_, ids, am, bert_cfg, dropout_key=k)
                return pooled.astype(jnp.float32).sum()

            def it(acc, k):
                g = jax.grad(loss)(p, k)
                leaves = jax.tree_util.tree_leaves(g)
                return acc + sum(l.astype(jnp.float32).sum() for l in leaves), None

            acc, _ = jax.lax.scan(it, jnp.float32(0), keys)
            return acc

        return lambda: scan(bp16)

    t_encg = row("encoder fwd+bwd", marginal(make_encg, "enc fwd+bwd"),
                 3 * f_fwd, 3 * tree_bytes(bp16))

    # ---- adam on the full tree (state evolves through the scan) ------------
    import optax

    opt = optax.adam(1e-6, mu_dtype=jnp.bfloat16)

    def make_adam(n):
        g0 = jax.tree_util.tree_map(lambda x: jnp.full_like(x, 1e-4), params)

        @jax.jit
        def scan(p, os_):
            def it(carry, _):
                p_, o_ = carry
                upd, o2 = opt.update(g0, o_, p_)
                return (optax.apply_updates(p_, upd), o2), None

            (p, os_), _ = jax.lax.scan(it, (p, os_), None, length=n)
            # consume EVERY leaf: adam chains are independent per leaf, so
            # returning one leaf lets XLA DCE the rest of the tree entirely
            return sum(
                l.astype(jnp.float32).sum()
                for l in jax.tree_util.tree_leaves(p)
            )

        os0 = opt.init(params)
        return lambda: scan(params, os0)

    t_adam = row("adam update (full tree, bf16 mu)", marginal(make_adam, "adam"),
                 0, n_params * (4 + 2 + 4 + 4 + 4 + 2 + 4))

    # ---- summary ------------------------------------------------------------
    print()
    comp = 2 * t_enc + (t_encg - t_enc) + t_adam
    print(f"marginal faithful step  : {t_step*1e3:8.3f} ms "
          f"({1/t_step:.1f} train steps/s)")
    print(f"sum of component costs  : {comp*1e3:8.3f} ms "
          f"(2 enc fwd {2*t_enc*1e3:.3f} + bwd {(t_encg-t_enc)*1e3:.3f} "
          f"+ adam {t_adam*1e3:.3f})")
    print(f"unexplained             : {(t_step-comp)*1e3:8.3f} ms "
          f"(cross-attn, head, DP block, gather, metrics, casts)")
    light_step = max(f_step / PEAK_TF, by_step / PEAK_BW)
    print(f"speed of light (step)   : {light_step*1e3:8.3f} ms "
          f"-> {1/light_step:.0f} steps/s ceiling at current traffic")
    # ---- ACHIEVABLE light: naive FLOP light assumes 100% MXU efficiency,
    # but --encoder_breakdown measures the practical matmul ceiling at the
    # flagship shapes (640x768 rows): an FFN-only stack of pure bf16 matmuls
    # — no attention, no layernorm, no dropout — reaches only 53.4% of its
    # naive light (measured 2026-08-19 on the v5e; ramp-dominated, each
    # matmul ~5-9 us ~ its own prologue). Rescaling the step's FLOP term by
    # that ceiling gives the ceiling any re-expression of THIS program can
    # reach at batch 8; the HBM term (optimizer/param traffic) is already
    # measured at its bound and does not rescale.
    mxu_ceil = float(os.environ.get("ROOFLINE_MXU_CEIL", "0.534"))
    # the step's flop phase (encoder matmuls) and hbm phase (the optimizer's
    # pure-traffic update) are data-dependent, non-overlapping kernels, so
    # the achievable floor is their SUM, not max
    ach_step = f_step / PEAK_TF / mxu_ceil + by_adam / PEAK_BW
    print(f"achievable light (step) : {ach_step*1e3:8.3f} ms "
          f"(FLOP term / {mxu_ceil:.3f} measured MXU ceiling + optimizer "
          f"HBM term) -> {1/ach_step:.0f} steps/s")
    print(f"eval step               : {t_eval*1e3:8.3f} ms")
    # the bench cycle: 301 train + 76 eval steps
    cyc = 301 * t_step + 76 * t_eval
    print(f"implied bench figure    : {301/cyc:8.1f} steps/s "
          f"(301 train + 76 eval per cycle)")
    ach_cyc = 301 * ach_step + 76 * max(
        f_fwd / PEAK_TF / mxu_ceil, (by_params // 2) / PEAK_BW
    )
    print(f"achievable bench ceiling: {301/ach_cyc:8.1f} steps/s "
          f"(same cycle at achievable light)")


def encoder_breakdown():
    """Where the encoder's other half goes (VERDICT r4 item 7).

    Decomposes the encoder-forward's gap to its FLOP light into (a) the
    dropout tax (hidden vs attention vs none — same dependence structure,
    keys still consumed) and (b) the shape ceiling: an FFN-only stack of
    pure bf16 matmuls at the exact flagship shapes (T=640 rows), which has
    no attention, no layernorm, no dropout — whatever fraction of light IT
    reaches is the practical MXU ceiling for these shapes, not a property
    of our program. Measured on the v5e chip (2026-08-19, marginal over
    10->110-step scans):

        full dropout        : 1.259 ms   light 0.561 -> 44.6% of light
        hidden-dropout only : 1.142 ms             -> 49.2%
        attn-dropout only   : 1.225 ms             -> 45.8%
        no dropout          : 1.126 ms             -> 49.8%
        ffn-only matmul stack: 0.690 ms  light 0.368 -> 53.4%

    Reading: dropout costs ~0.13 ms/forward (mask generation + elementwise,
    pure HBM traffic XLA cannot fuse into the matmuls' epilogue because the
    rbg bits are a separate kernel); removing ALL non-matmul ops still caps
    at ~53% because at (640 x 768) @ (768 x 768/3072) the MXU pipeline is
    ramp-dominated — each matmul runs ~5-9 us, comparable to its own
    prologue. The 44.6% -> 53.4% span is therefore ~0.13 ms dropout +
    ~0.3 ms attention/layernorm/residual traffic, and the remaining 47% gap
    to "light" is the small-shape ceiling itself: reaching >60% of naive
    light needs larger per-call shapes (batch >> 8), which the faithful
    configuration pins at 8. Conclusion: irreducible at the flagship shape.
    """
    tok = D.load_bert_pickle(f"{REF}/feature/EEG/test_bert.pickle")
    _, labels = D.load_eeg_feature_csv(f"{REF}/feature/test_EEG.csv")
    emb = D.load_embedding_pickle(f"{REF}/feature/action/test_clip_v2.pickle")
    train = D.build_pairing("ti", labels, eeg_txt=tok, act_img=emb)
    train, _ = truncate_pair(train, train)
    cv = build_compact_vocab([train.eeg_input])
    train = remap_pairing(train, cv)
    S = train.eeg_input.shape[1]
    fc = dataclasses.replace(
        fusion.config_for("ti", "lapacian_dropout"),
        bert_config=BertConfig(vocab_size=cv.size),
    )
    bert_cfg = fc.bert_cfg()
    key = set_seed()
    params = fusion.init(key, fc)
    bp16 = tree_cast(params["bert"], jnp.bfloat16)
    train_dev = train.device_put()
    ids, am = train_dev["eeg_input"][:B], train_dev["eeg_mask"][:B]
    H, L, I = bert_cfg.hidden_size, bert_cfg.num_layers, bert_cfg.intermediate_size
    T = B * S
    p_enc = L * (4 * H * H + 2 * H * I)
    f_fwd = 2 * p_enc * T + L * (2 * 2 * B * S * S * H)
    f_ffn = 2 * L * (2 * H * I) * T

    def enc_variant(cfg):
        def make(n):
            keys = jax.random.split(key, n)

            @jax.jit
            def scan(p):
                def it(acc, k):
                    _, pooled = bert_mod.apply(p, ids, am, cfg, dropout_key=k)
                    return acc + pooled.astype(jnp.float32).sum(), None

                acc, _ = jax.lax.scan(it, jnp.float32(0), keys)
                return acc

            return lambda: scan(bp16)

        return make

    variants = [
        ("full dropout", bert_cfg),
        ("hidden only", dataclasses.replace(bert_cfg, attention_dropout=0.0)),
        ("attn only", dataclasses.replace(bert_cfg, hidden_dropout=0.0)),
        ("no dropout (dep-kept)",
         dataclasses.replace(bert_cfg, hidden_dropout=0.0,
                             attention_dropout=0.0)),
    ]
    print(f"encoder-forward breakdown (B={B} S={S}, bf16, FLOP light "
          f"{f_fwd/PEAK_TF*1e3:.3f} ms):")
    for name, cfg in variants:
        t = marginal(enc_variant(cfg), name)
        lt = f_fwd / PEAK_TF
        print(f"  {name:20s}: {t*1e3:.3f} ms  light {lt*1e3:.3f} "
              f"-> {100*lt/t:.1f}%")

    # FFN-only matmul stack: the practical MXU ceiling at these shapes
    w1 = [jax.random.normal(jax.random.fold_in(key, i), (H, I), jnp.bfloat16)
          * 0.02 for i in range(L)]
    w2 = [jax.random.normal(jax.random.fold_in(key, 100 + i), (I, H),
                            jnp.bfloat16) * 0.02 for i in range(L)]
    x0 = jax.random.normal(jax.random.fold_in(key, 999), (T, H), jnp.bfloat16)

    def make_ffn(n):
        @jax.jit
        def scan(ws1, ws2, x):
            def it(acc, k):
                h = x * (1.0 + k * 1e-9).astype(jnp.bfloat16)  # dep per iter
                for a, b in zip(ws1, ws2):
                    h = jax.nn.gelu(h @ a) @ b
                return acc + h.astype(jnp.float32).sum(), None

            acc, _ = jax.lax.scan(
                it, jnp.float32(0),
                jnp.arange(n, dtype=jnp.float32))
            return acc

        return lambda: scan(w1, w2, x0)

    t = marginal(make_ffn, "ffn-only stack")
    lt = f_ffn / PEAK_TF
    print(f"  {'ffn-only stack':20s}: {t*1e3:.3f} ms  light {lt*1e3:.3f} "
          f"-> {100*lt/t:.1f}%  <- practical matmul ceiling at these shapes")


if __name__ == "__main__":
    if "--encoder_breakdown" in sys.argv[1:]:
        encoder_breakdown()
    else:
        main()
