"""Drive the flagship DP-MLD path end-to-end on real reference data.

Loads the reference's committed test-split artifacts (tokenized EEG rows via
the recovered vocab + real CLIP act embeddings + labels), splits them into a
small train/eval set, and trains TICA_LapDropout for a few epochs.
Usage: python examples/train_demo.py [--epochs N] [--n N] [--dtype bfloat16]
"""
import argparse, csv, os, pickle, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from eeg_multimodal_tpu.data import datasets as D
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer

REF = os.environ.get("REFERENCE_DIR", "/root/reference")

p = argparse.ArgumentParser()
p.add_argument("--epochs", type=int, default=2)
p.add_argument("--n", type=int, default=256, help="train subset size")
p.add_argument("--dtype", default="bfloat16")
p.add_argument("--epsilon", type=float, default=0.1)
p.add_argument("--log", default="/tmp/dpmld_demo")
p.add_argument("--precast", action="store_true",
               help="carry the bf16 param copy through the epoch scan "
                    "(TrainConfig.precast_params)")
p.add_argument("--fused_dp", action="store_true",
               help="route the DP block through the fused Pallas kernel")
args = p.parse_args()

import jax
# NOTE: jax_compilation_cache_dir hangs under the axon remote-compile tunnel
# (PALLAS_AXON_REMOTE_COMPILE=1); only enable it off-tunnel.
if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
    jax.config.update("jax_compilation_cache_dir", os.environ.get("JAX_CACHE", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("devices:", jax.devices())

tok = D.load_bert_pickle(f"{REF}/feature/EEG/test_bert.pickle")
emb = D.load_embedding_pickle(f"{REF}/feature/action/test_clip_v2.pickle")
_, labels = D.load_eeg_feature_csv(f"{REF}/feature/test_EEG.csv")
print("data:", tok["input_ids"].shape, emb.shape, labels.shape, "pos frac", labels.mean())

n = args.n
tr = D.build_pairing("ti", labels[:n], eeg_txt={k: v[:n] for k, v in tok.items()}, act_img=emb[:n])
n2 = min(len(labels), n + 128)
te = D.build_pairing("ti", labels[n:n2], eeg_txt={k: v[n:n2] for k, v in tok.items()}, act_img=emb[n:n2])

tr, te = D.truncate_pair(tr, te)  # exact padding removal (512 -> 128 tokens)
fc = fusion.config_for("ti", "lapacian_dropout")
if args.fused_dp:
    import dataclasses
    fc = dataclasses.replace(fc, fused_dp_kernel=True)
tc = TrainConfig(epochs=args.epochs, compute_dtype=args.dtype,
                 precast_params=args.precast)
trainer = Trainer(fc, tc)
t0 = time.time()
out = trainer.fit(tr, te, epsilon=args.epsilon, log_path=args.log)
print("total %.1fs" % (time.time() - t0))
print("best:", out["best"])
