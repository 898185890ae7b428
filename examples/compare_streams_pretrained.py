"""Drive the cross-modal stream-type grid with the MLM encoder.

Reference (BASELINE.md row: double 0.956 / single 0.979 at eps=0.1,
python/logs/compare_corss_model_type/*/best_record.txt). Runs both streams
of the reference's driver (compare_cross_modal_type.py:50-63) from the
domain-MLM encoder.

Usage:
  python examples/compare_streams_pretrained.py --run_dir /tmp/acc_run2 \
      --data_root /tmp/user_tree --out /tmp/streams
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
from eeg_multimodal_tpu.experiments.drivers import CompareCrossModalType
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/acc_run2")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/streams")
p.add_argument("--epochs", type=int, default=50)
args = p.parse_args()

bert = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))
emb = dict(bert["embeddings"])
emb["word"] = vocab.expand_embeddings(np.asarray(emb["word"]))
bert = {**bert, "embeddings": emb}

job = TrainAndTest(epochs=args.epochs, data_root=args.data_root,
                   artifacts_root=args.out, bert_params=bert)
CompareCrossModalType(python_job=job).run()
