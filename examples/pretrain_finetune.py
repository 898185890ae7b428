"""Weights-free accuracy parity: domain MLM pretraining -> DP-MLD fine-tune.

Thin wrapper over train.mlm.pretrain_finetune_mlm (the same pipeline that
backs `cli pretrain`): the reference's headline (acc 0.956 / F1 0.967 at
eps=0.1, python/logs/demo/DPMLD/best_record.txt) starts from pretrained HF
BERT (models.py:40); here the encoder is manufactured by masked-language
modelling on the serialized sensor-row corpus. Measured with the defaults
below: best acc 0.964 / F1 0.974 at epoch 95 (ACCURACY.md item 5).

Usage:
  python examples/pretrain_finetune.py --data_root /tmp/user_tree \
      --out /tmp/mlm_run --mlm_steps 8000 --epochs 120 --epsilon 0.1
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")

from eeg_multimodal_tpu.train.mlm import pretrain_finetune_mlm

p = argparse.ArgumentParser()
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/mlm_run")
p.add_argument("--mlm_steps", type=int, default=3000)
p.add_argument("--mlm_batch", type=int, default=128)
p.add_argument("--mlm_lr", type=float, default=1e-4)
p.add_argument("--epsilon", type=float, default=0.1)
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--learning_rate", type=float, default=1e-6)
p.add_argument("--batch_size", type=int, default=8)
p.add_argument("--bert_ckpt", default=None,
               help="skip MLM, load pretrained bert params from this pickle")
p.add_argument("--path_suffix", default="DPMLD/")
p.add_argument("--compute_dtype", default="bfloat16")
p.add_argument("--row_reg_weight", type=float, default=0.0,
               help="joint row-value-regression pretext weight (0 = MLM only)")
args = p.parse_args()

result = pretrain_finetune_mlm(
    args.data_root, args.out, mlm_steps=args.mlm_steps,
    mlm_batch=args.mlm_batch, mlm_lr=args.mlm_lr, epsilon=args.epsilon,
    epochs=args.epochs, batch_size=args.batch_size,
    learning_rate=args.learning_rate, compute_dtype=args.compute_dtype,
    path_suffix=args.path_suffix, bert_ckpt=args.bert_ckpt,
    row_reg_weight=args.row_reg_weight,
)
best = result["best"]
print(
    f"[finetune] BEST epoch {best['epoch'] if best else '-'}: "
    f"acc {best['test_acc'] if best else 0:.3f} f1 {result['f1_best']:.3f}",
    flush=True,
)
