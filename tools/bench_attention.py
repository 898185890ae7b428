"""Measure the fused-attention Pallas kernel vs XLA einsum on TPU.

Produces the dispatch table behind ops.attention.attention_available:
for each S in {128, 256, 512}, times the full 12-layer BERT-base forward
and forward+backward on batch 8 under both paths.

Usage: python tools/bench_attention.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import jax.numpy as jnp
import numpy as np

from eeg_multimodal_tpu.models import bert as bert_mod

B = 8


def run(S, fused, dtype, with_bwd, dropout):
    from eeg_multimodal_tpu.ops import attention as A

    bert_mod.USE_FUSED_ATTENTION = fused
    # bypass the measured dispatch gate: this script IS the measurement
    A.attention_available = (lambda S_, D_: True) if fused else (lambda S_, D_: False)
    cfg = bert_mod.BertConfig()
    params = bert_mod.init(jax.random.PRNGKey(0), cfg, jnp.dtype(dtype))
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(0, 30522, (B, S)), jnp.int32)
    mask = jnp.asarray((np.arange(S)[None, :] < rng.randint(S // 2, S, (B, 1))).astype(np.int32))
    key = jax.random.PRNGKey(1) if dropout else None

    if with_bwd:
        def loss(p):
            seq, pooled = bert_mod.apply(p, ids, mask, cfg, dropout_key=key)
            return jnp.sum(pooled.astype(jnp.float32) ** 2)

        fn = jax.jit(jax.grad(loss))
    else:
        fn = jax.jit(lambda p: bert_mod.apply(p, ids, mask, cfg, dropout_key=key)[1])

    out = fn(params)  # compile
    jax.block_until_ready(out)
    times = []
    for _ in range(5):
        t0 = time.time()
        jax.block_until_ready(fn(params))
        times.append(time.time() - t0)
    return float(np.median(times)) * 1e3


def main():
    print(f"BERT-base batch {B}, bf16, 5-run median (ms)")
    print(f"{'S':>5} {'pass':>8} | {'einsum':>8} {'kernel':>8} {'kernel/einsum':>13}")
    for S in (128, 256, 512):
        for with_bwd, name in ((False, "fwd"), (True, "fwd+bwd")):
            # train semantics: attention-prob dropout active
            t_e = run(S, False, "bfloat16", with_bwd, dropout=True)
            t_k = run(S, True, "bfloat16", with_bwd, dropout=True)
            print(f"{S:>5} {name:>8} | {t_e:8.2f} {t_k:8.2f} {t_k / t_e:13.2f}")


if __name__ == "__main__":
    main()
