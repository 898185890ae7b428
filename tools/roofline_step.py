"""Roofline decomposition of the flagship train step (VERDICT r2 item 6).

Times each component of the faithful alternating-optimizer step in isolation
at the flagship shape (batch 8, S=80, BERT-base, compact vocab, bf16) and
compares the measured step against per-component speed-of-light bounds:

  FLOP bound  = component FLOPs / 197 TFLOP/s   (v5e bf16 peak)
  HBM bound   = component bytes / 819 GB/s      (v5e HBM bandwidth)
  light(c)    = max(FLOP bound, HBM bound)

If sum(light(c)) ~= measured step time, the step is at the hardware bound
and no kernel can win; the gap, if any, names the component to attack.

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

REF = os.environ.get("REFERENCE_DIR", "/root/reference")


def timeit(fn, *args, n=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


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
          f"(f32 {by_params/1e6:.0f} MB)  encoder fwd FLOPs={f_fwd/1e9:.1f}G")
    rows = []

    def row(name, t, flops, bytes_):
        light = max(flops / PEAK_TF, bytes_ / PEAK_BW)
        bound = "flop" if flops / PEAK_TF > bytes_ / PEAK_BW else "hbm"
        rows.append((name, t, flops, bytes_, light, bound))
        print(f"{name:34s} {t*1e3:8.3f} ms   light {light*1e3:7.3f} ms "
              f"({bound}-bound, {100*light/max(t,1e-12):5.1f}% of light)")

    # -- full faithful train step: a 10-step scanned epoch, state threaded
    # through repeated calls (train_epoch donates its inputs)
    idx10, w10 = epoch_indices(key, 10 * B, B)

    def epoch10(params, dp_os, model_os):
        return steps.train_epoch(params, dp_os, model_os, train_dev, idx10,
                                 w10, 0.1, key)

    params, dp_os, model_os, tl, _ = epoch10(params, dp_os, model_os)  # compile
    jax.block_until_ready(tl)
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        params, dp_os, model_os, tl, _ = epoch10(params, dp_os, model_os)
        jax.block_until_ready(tl)
        ts.append(time.perf_counter() - t0)
    t_step = float(np.median(ts)) / 10
    # faithful step: 2 encoder fwd + 1 encoder bwd (phase1 bwd is DP-only);
    # bytes: params read f32+cast per fwd (2x), bwd reads, grads f32, adam
    # p+m(bf16)+v r/w on model params, small head/cross extra
    f_step = 3 * f_fwd + 2 * f_fwd  # bwd ~ 2x fwd
    by_adam = n_params * (4 + 2 + 4 + 4 + 2 + 4 + 4)  # r p,m,v + w p,m,v + grad read
    by_step = 3 * by_params + by_adam
    row("faithful train step (measured)", t_step, f_step, by_step)

    # -- encoder forward -----------------------------------------------------
    bp16 = tree_cast(params["bert"], jnp.bfloat16)
    ids = train_dev["eeg_input"][:B]
    am = train_dev["eeg_mask"][:B]

    enc = jax.jit(lambda p: bert_mod.apply(p, ids, am, bert_cfg,
                                           dropout_key=None))
    t_enc = timeit(enc, bp16)
    row("encoder fwd (bf16, no dropout)", t_enc, f_fwd, tree_bytes(bp16))

    enc_d = jax.jit(lambda p, k: bert_mod.apply(p, ids, am, bert_cfg,
                                                dropout_key=k))
    t_enc_d = timeit(enc_d, bp16, key)
    row("encoder fwd (+dropout masks)", t_enc_d, f_fwd, tree_bytes(bp16))

    # -- encoder fwd + bwd ---------------------------------------------------
    def loss(p, k):
        seq, pooled = bert_mod.apply(p, ids, am, bert_cfg, dropout_key=k)
        return jnp.sum(pooled.astype(jnp.float32) ** 2)

    gr = jax.jit(jax.grad(loss))
    t_gr = timeit(gr, bp16, key)
    row("encoder fwd+bwd", t_gr, 3 * f_fwd, 3 * tree_bytes(bp16))

    # -- cast f32->bf16 of the param tree (per-phase in the real step) ------
    cast = jax.jit(lambda p: tree_cast(p, jnp.bfloat16))
    t_cast = timeit(cast, params["bert"])
    row("param tree cast f32->bf16", t_cast, 0, by_params * 1.5)

    # -- adam update on the full tree ---------------------------------------
    import optax

    g_like = jax.tree_util.tree_map(jnp.zeros_like, params)
    opt = optax.adam(1e-6, mu_dtype=jnp.bfloat16)
    os_ = opt.init(params)

    @jax.jit
    def adam_step(params, os_, g):
        upd, os2 = opt.update(g, os_, params)
        return optax.apply_updates(params, upd), os2

    t_adam = timeit(adam_step, params, os_, g_like)
    row("adam update (full tree)", t_adam, 0, by_adam)

    # -- summary -------------------------------------------------------------
    print()
    light_parts = {
        "2 enc fwd + 1 enc fwd+bwd": 2 * t_enc_d + t_gr,
        "adam": t_adam,
    }
    comp = sum(light_parts.values())
    print(f"measured faithful step : {t_step*1e3:8.3f} ms "
          f"({1/t_step:.1f} steps/s)")
    print(f"sum of measured parts  : {comp*1e3:8.3f} ms "
          f"(enc 2f+fb {1e3*(2*t_enc_d+t_gr):.3f} + adam {t_adam*1e3:.3f})")
    print(f"unexplained            : {(t_step-comp)*1e3:8.3f} ms "
          f"(cross-attn, head, DP, metrics, gather, cast)")
    light_step = max(f_step / PEAK_TF, by_step / PEAK_BW)
    print(f"speed of light (step)  : {light_step*1e3:8.3f} ms "
          f"-> {1/light_step:.0f} steps/s ceiling")


if __name__ == "__main__":
    main()
