"""Drive the modality-ablation grid (ti/tt/it/ii) with the MLM encoder.

Reference numbers (BASELINE.md row 5, python/logs/compare_modal/*/
best_record.txt): ti 0.977 / tt 0.987 / it 0.946 / ii 0.827 at eps=0.1,
resting on pretrained HF BERT + CLIP. Full 50-epoch runs of the same grid
(compare_modal.py:41-108) from the domain-MLM encoder; the compact-vocab
word table scatters back to full rows so the stock driver path runs
unchanged (ii uses no BERT at all).

Usage:
  python examples/compare_modal_pretrained.py --run_dir /tmp/acc_run2 \
      --data_root /tmp/user_tree --out /tmp/modal
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
from eeg_multimodal_tpu.experiments.drivers import CompareModal
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/acc_run2")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/modal")
p.add_argument("--epochs", type=int, default=50)
args = p.parse_args()

bert = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))
emb = dict(bert["embeddings"])
emb["word"] = vocab.expand_embeddings(np.asarray(emb["word"]))
bert = {**bert, "embeddings": emb}

job = TrainAndTest(epochs=args.epochs, data_root=args.data_root,
                   artifacts_root=args.out, bert_params=bert)
CompareModal(python_job=job).run()
