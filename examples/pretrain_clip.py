"""Weights-free image-feature parity: contrastive tower pretraining.

The reference's image embeddings come from pretrained OpenAI CLIP
(get_embedding.py:62-71); zero-egress substitute: CLIP-style cross-modal
contrastive pretraining of our ViT tower on the train split's paired
EEG/act renderings (train/contrastive.py), then rebuild the img embedding
tree with the pretrained tower and re-run the image-bearing pairings.

Usage:
  python examples/pretrain_clip.py --data_root /tmp/user_tree \
      --out /tmp/clip_run [--steps 1500] [--skip_train]
"""
import argparse
import os
import pickle
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np

from eeg_multimodal_tpu.data.datasets import load_feature_csv
from eeg_multimodal_tpu.data.embedding import GetEmbedding
from eeg_multimodal_tpu.models.vit import ViTConfig
from eeg_multimodal_tpu.train import contrastive as C

p = argparse.ArgumentParser()
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/clip_run")
p.add_argument("--steps", type=int, default=1500)
p.add_argument("--batch", type=int, default=128)
p.add_argument("--skip_train", action="store_true",
               help="reuse <out>/vit_clip.pickle")
args = p.parse_args()

os.makedirs(args.out, exist_ok=True)
tower_path = os.path.join(args.out, "vit_clip.pickle")

# 1. contrastive pretraining on the train split's paired renderings
if not args.skip_train:
    eeg = load_feature_csv(os.path.join(args.data_root, "data/processed/train_EEG.csv"))
    act = load_feature_csv(os.path.join(args.data_root, "data/processed/train_act.csv"))
    cfg = C.ContrastiveConfig(batch_size=args.batch, total_steps=args.steps)
    pre = C.ContrastivePretrainer(ViTConfig(), cfg,
                                  eeg_dim=eeg.shape[1], act_dim=act.shape[1])
    vit_params, hist = pre.fit(eeg, act)
    with open(tower_path, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, vit_params), f)
    print(f"[clip] tower saved to {tower_path} (final loss "
          f"{hist[-1]['loss']:.4f})", flush=True)

# 2. rebuild the embedding tree: copy processed CSVs + txt pickles, then
#    regenerate every img embedding with the pretrained tower
tree = os.path.join(args.out, "tree")
for sub in ("data/processed", "data/embedding/EEG/txt", "data/embedding/act/txt"):
    src = os.path.join(args.data_root, sub)
    dst = os.path.join(tree, sub)
    if os.path.isdir(src) and not os.path.isdir(dst):
        shutil.copytree(src, dst)
job = GetEmbedding(["act", "EEG"], ["train", "test"], data_root=tree,
                   clip_weights=tower_path)
job.get_img_encode([["clip", "ViT-B/32"]])
print("[clip] img embedding tree rebuilt", flush=True)
