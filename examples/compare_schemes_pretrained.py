"""Drive the DP-scheme comparison grid with the MLM-pretrained encoder.

Reference numbers (BASELINE.md, python/logs/compare_private_scheme/*/
best_record.txt): LapDropout 0.956 / DPSGD 0.688 / EqualWeight 0.993 /
NonPrivate 0.993 at eps=0.1, all resting on pretrained HF BERT. Here the
pretrained init is the domain-MLM encoder (examples/pretrain_finetune.py);
its compact-vocab word table is scattered back to full-vocab rows so the
stock driver path (recovered HF ids) runs unchanged.

Usage:
  python examples/compare_schemes_pretrained.py --run_dir /tmp/acc_run2 \
      --data_root /tmp/user_tree --out /tmp/schemes
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np

from eeg_multimodal_tpu.data.compact_vocab import CompactVocab
from eeg_multimodal_tpu.experiments.drivers import ComparePrivateScheme
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/acc_run2",
               help="pretrain_finetune.py output dir (bert_mlm.pickle + compact_vocab.npz)")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/schemes")
p.add_argument("--epochs", type=int, default=50)
args = p.parse_args()

bert = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))
emb = dict(bert["embeddings"])
emb["word"] = vocab.expand_embeddings(np.asarray(emb["word"]))
bert = {**bert, "embeddings": emb}
print(f"[schemes] expanded word table to {emb['word'].shape}", flush=True)

job = TrainAndTest(epochs=args.epochs, data_root=args.data_root,
                   artifacts_root=args.out, bert_params=bert)
ComparePrivateScheme(python_job=job).run()
