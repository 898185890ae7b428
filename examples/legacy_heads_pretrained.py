"""Drive the BASELINE.json legacy fusion heads to committed accuracy.

The reference's legacy (root-script) generation has recorded numbers for
every named head (all on pretrained HF BERT + CLIP embeddings):

  ConcatModel                 0.939 / F1 0.956 @ep17  model_dict/ConcatModel/record.txt
  PriConcat  pretrain         0.990 / F1 0.993 @ep48  model_dict/PriConcat/pretrain/best_record.txt
  PriGumbel  pretrain         0.993 / F1 0.995 @ep35  model_dict/PriGumbel/pretrain/best_record.txt
  newfrac_1.0eps              0.987           @ep48  model_dict/newfrac_1.0eps/best_record.txt
  newfrac_1.0eps_newinit_k1   0.988 / F1 0.992 @ep49  model_dict/newfrac_1.0eps_newinit_k1/best_record.txt
  newfrac_1.0eps_feawei       0.987 / F1 0.990 @ep45  model_dict/newfrac_1.0eps_feawei/best_record.txt
  new_{0.1,1,3,5,10}eps       0.987/0.987/0.980/0.939/0.806 (pre-fix eps_hat)
  newfrac_{0.1,1,5,8,10}eps   0.956/0.987/0.987/0.985/0.987

This driver reproduces the whole family from the weights-free MLM encoder
(examples/pretrain_finetune.py run dir), writing records in the reference's
model_dict/<config>/ layout:

  python examples/legacy_heads_pretrained.py --run_dir /tmp/r3_reg1 \
      --data_root /tmp/user_tree --out /tmp/model_dict

Head provenance (all ti pairing, batch 8, lr 1e-6, 50 epochs, seed 980616):
  ConcatModel  — plain concat trunk, no DP (model.py:34-63, DP path commented)
  PriConcat    — plain pretrain -> per-sample-Laplace finetune (main_0425.py)
  PriGumbel    — privacy-regularized loss + learned-w Gumbel head (train_val.py)
  newfrac_*    — past_acc.py main2: alternating optimizers at eps=1.0 with the
                 DP-init grid (zeros / modality constants / feawei k=1,3,5;
                 past_acc.py:94-103, past_acc_feawei.py)
  new_*eps     — zeros-init head over the eps grid with the PRE-fix noise
                 scale log((e^eps-w)/(1-w)) (model.py:57; noise grows with
                 eps — the recorded accs fall monotonically);
  newfrac_*eps — the same grid with the '# fix' reciprocal form
                 (past_acc.py:132). Each grid runs as ONE vmapped sweep
                 instead of five sequential trainings
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_default_prng_impl", "rbg")
import numpy as np

from eeg_multimodal_tpu.data.compact_vocab import CompactVocab
from eeg_multimodal_tpu.data.datasets import truncate_pair
from eeg_multimodal_tpu.experiments.legacy_drivers import extract_feawei
from eeg_multimodal_tpu.models import fusion
from eeg_multimodal_tpu.ops import dp_inits
from eeg_multimodal_tpu.train.api import TrainAndTest
from eeg_multimodal_tpu.train.checkpoint import load_pytree
from eeg_multimodal_tpu.train.legacy import PriGumbelConfig, PriGumbelPretrainer
from eeg_multimodal_tpu.train.pipeline import PipelineConfig, pretrain_finetune
from eeg_multimodal_tpu.train.sweep import SweepMember, SweepRunner
from eeg_multimodal_tpu.train.trainer import TrainConfig, Trainer
from eeg_multimodal_tpu.utils.seeding import key_chain, set_seed

p = argparse.ArgumentParser()
p.add_argument("--run_dir", default="/tmp/acc_run2",
               help="pretrain_finetune.py output dir (bert_mlm.pickle + compact_vocab.npz)")
p.add_argument("--data_root", default="/tmp/user_tree")
p.add_argument("--out", default="/tmp/model_dict")
p.add_argument("--epochs", type=int, default=50)
p.add_argument("--dtype", default="bfloat16")
p.add_argument("--which", default="all",
               help="comma list: concat,priconcat,prigumbel,newfrac,eps_grid")
args = p.parse_args()
which = set(args.which.split(",")) if args.which != "all" else {
    "concat", "priconcat", "prigumbel", "newfrac", "eps_grid"
}

bert = load_pytree(os.path.join(args.run_dir, "bert_mlm.pickle"))
vocab = CompactVocab.load(os.path.join(args.run_dir, "compact_vocab.npz"))
emb = dict(bert["embeddings"])
emb["word"] = vocab.expand_embeddings(np.asarray(emb["word"]))
bert = {**bert, "embeddings": emb}
print(f"[legacy] expanded word table to {emb['word'].shape}", flush=True)

job = TrainAndTest(data_root=args.data_root)
train = job._load_split("train", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
test = job._load_split("test", "ti", "bert", "bert-base-uncased", "clip", "ViT-B/32")
train, test = truncate_pair(train, test)
print(f"[legacy] ti pairing: train {len(train)} test {len(test)}", flush=True)


def run_head(name, fusion_cfg, epsilon, dp_init=None, epochs=None):
    out = os.path.join(args.out, name)
    tc = TrainConfig(epochs=epochs or args.epochs, compute_dtype=args.dtype)
    trainer = Trainer(fusion_cfg, tc, bert_params=bert)
    if dp_init is not None:
        trainer.params["DP"] = dp_init
        trainer.dp_os, trainer.model_os = trainer.steps.init_opt_states(
            trainer.params
        )
    res = trainer.fit(
        train, test, epsilon,
        log_path=out, model_path=os.path.join(out, "best_f1.pickle"),
        echo=False,
    )
    b = res["best"] or {"epoch": -1, "test_acc": 0.0}
    print(f"[legacy] {name}: best acc {b['test_acc']:.3f} "
          f"f1 {res['f1_best']:.3f} @ep{b['epoch']}", flush=True)
    return trainer, res


if "concat" in which:
    # ConcatModel: the plain-concat baseline (model.py:34-63; DP commented out)
    run_head("ConcatModel", fusion.config_for("ti", "NDP"), epsilon=0.0)

if "priconcat" in which:
    # PriConcat: plain pretrain -> per-sample-Laplace finetune (main_0425.py;
    # records under pretrain/ + the reference's 'fineturn/' spelling)
    res = pretrain_finetune(
        train, test, os.path.join(args.out, "PriConcat"),
        PipelineConfig(
            epsilon=0.1, pretrain_epochs=args.epochs,
            finetune_epochs=args.epochs, compute_dtype=args.dtype,
        ),
        bert_params=bert, echo=False,
    )
    for stage in ("pretrain", "finetune"):
        r = res[stage]
        b = (r or {}).get("best") or {"epoch": -1, "test_acc": 0.0}
        print(f"[legacy] PriConcat/{stage}: best acc {b['test_acc']:.3f} "
              f"@ep{b['epoch']}", flush=True)

if "prigumbel" in which:
    # PriGumbel: privacy-regularized pretrain (train_val.py pretrain())
    pg = PriGumbelPretrainer(
        fusion.config_for("ti", "NDP", dtype="float32"),
        PriGumbelConfig(epochs=args.epochs),
        bert_params=bert,
    )
    res = pg.pretrain(
        train, test, os.path.join(args.out, "PriGumbel", "pretrain"),
        echo=False,
    )
    accs = res["curves"]["val_acc"]
    print(f"[legacy] PriGumbel/pretrain: best acc {max(accs):.3f} "
          f"f1_best {res['f1_best']:.3f} @ep{int(np.argmax(accs)) + 1}",
          flush=True)

if "newfrac" in which:
    # the past_acc.py DP-init grid at eps=1.0: extract feawei features from
    # the freshly-initialized trunk (past_acc_feawei.py runs the untrained
    # ConcatModel over the train split), then the five init variants
    lap = fusion.config_for("ti", "lapacian_dropout")
    init_params = fusion.init(key_chain(set_seed(), "init"), lap, bert)
    feats = extract_feawei(
        init_params, lap, train,
        out_path=os.path.join(args.out, "feawei.pkl"),
    )
    print(f"[legacy] feawei features {feats.shape}", flush=True)
    grid = {
        "newfrac_1.0eps": dp_inits.zeros(),
        "newfrac_1.0eps_newinit": dp_inits.modality_constants(),
        "newfrac_1.0eps_newinit_k1": dp_inits.feawei(feats, k=1.0),
        "newfrac_1.0eps_newinit_k3": dp_inits.feawei(feats, k=3.0),
        # the reference leaves the 'feawei' dir's k undocumented; k=5 is the
        # variant prototyped in past_acc_feawei.py's analysis block
        "newfrac_1.0eps_feawei": dp_inits.feawei(feats, k=5.0),
    }
    for name, dp0 in grid.items():
        run_head(name, lap, epsilon=1.0, dp_init=dp0)

if "eps_grid" in which:
    # Two legacy eps-grid generations, each as ONE vmapped sweep:
    #   new_{0.1,1,3,5,10}eps    — PRE-fix noise scale log((e^eps-w)/(1-w))
    #                              (model.py:57): noise grows with eps, the
    #                              recorded accs FALL 0.987 -> 0.806;
    #   newfrac_{0.1,1,5,8,10}eps — the '# fix' reciprocal (past_acc.py:132):
    #                              accs saturate 0.956 -> ~0.987.
    grids = [
        ("new", dict(prefix_eps_hat=True), (0.1, 1.0, 3.0, 5.0, 10.0)),
        ("newfrac", {}, (0.1, 1.0, 5.0, 8.0, 10.0)),
    ]
    for prefix, overrides, eps_list in grids:
        cfg = dataclasses.replace(
            fusion.config_for("ti", "lapacian_dropout"), **overrides
        )
        members = [
            SweepMember(e, label=f"{prefix}_{e}eps") for e in eps_list
        ]
        runner = SweepRunner(
            cfg, TrainConfig(epochs=args.epochs, compute_dtype=args.dtype),
            members, bert_params=bert,
        )
        out = runner.run(train, test, log_root=args.out, echo=False)
        for r in out:
            b = r["best"] or {"epoch": -1, "test_acc": 0.0}
            print(f"[legacy] {r['member']['label']}: best acc "
                  f"{b['test_acc']:.3f} f1 {r['f1_best']:.3f} @ep{b['epoch']}",
                  flush=True)

print("[legacy] done", flush=True)
