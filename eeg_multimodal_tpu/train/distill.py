"""CLIP-embedding distillation from the committed real CLIP outputs.

The only pretrained-model knowledge available in this zero-egress tree is
the committed ``(601, 512) float32`` array of REAL OpenAI CLIP ViT-B/32
image embeddings of the test split's act rows
(``feature/action/test_clip_v2.pickle``, produced by the reference's
``get_embedding.py:62-71`` over ``TransferToImage`` renders). The act
render is a *deterministic* function of the 27 raw sensor values
(``get_embedding.py:26-31``: reshape(3,3,3) -> Upsample(74) -> ZeroPad2d),
so CLIP's embedding of the render is itself a deterministic function of
the row — a function a small MLP can learn from the 601 committed pairs
and evaluate on the 2402 train rows, synthesizing the train-side
``train_clip_v2.pickle`` the reference's tree lost
(``.MISSING_LARGE_BLOBS:2``). No labels are involved anywhere: the pairs
are (sensor row, CLIP(render(row))).

Training is full-batch Adam on standardized inputs/targets with small
Gaussian input jitter as the only regularizer; quality is reported as
held-out cosine similarity on a validation split of the 601 pairs before
the deployed distiller is refit on all of them.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    hidden: int = 1024
    depth: int = 3  # hidden layers
    steps: int = 4000
    learning_rate: float = 1e-3
    warmup: int = 100
    jitter: float = 0.05  # stddev of input noise in standardized space
    cosine_weight: float = 1.0  # weight of (1 - cos) next to the MSE term
    val_frac: float = 0.1
    seed: int = 0
    # Leakage-sensitivity control (ACCURACY.md item 15 caveat): fit the
    # DEPLOYED distiller on only this random fraction of the committed test
    # pairs — the held-out remainder is never seen by any stage. If the
    # downstream accuracy is insensitive to halving the fit set, the
    # transductive use of test-split *inputs* is not what the numbers rest
    # on. 1.0 = reference behavior (fit on all pairs).
    fit_fraction: float = 1.0


def _init_mlp(key, d_in: int, d_out: int, cfg: DistillConfig):
    dims = [d_in] + [cfg.hidden] * cfg.depth + [d_out]
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for k, (a, b) in zip(keys, zip(dims[:-1], dims[1:])):
        w = jax.random.normal(k, (a, b), jnp.float32) * (2.0 / a) ** 0.5
        layers.append({"w": w, "b": jnp.zeros((b,), jnp.float32)})
    return layers


def _mlp_apply(layers, x):
    for i, l in enumerate(layers):
        x = x @ l["w"] + l["b"]
        if i < len(layers) - 1:
            x = jax.nn.gelu(x)
    return x


class CLIPDistiller:
    """row (d_in,) -> CLIP embedding (512,) regressor.

    ``params`` is a self-contained pytree: the MLP plus the input/target
    standardization moments, so :meth:`predict` needs nothing else.
    """

    def __init__(self, cfg: DistillConfig = DistillConfig()):
        self.cfg = cfg

    # -- core fitting over a fixed (rows, targets) set ----------------------
    def _fit_arrays(self, rows, targets, x_mean, x_std, key, steps):
        cfg = self.cfg
        y_mean = targets.mean(0)
        y_std = targets.std(0) + 1e-6
        x = jnp.asarray((rows - x_mean) / x_std, jnp.float32)
        y = jnp.asarray((targets - y_mean) / y_std, jnp.float32)
        y_raw = jnp.asarray(targets, jnp.float32)

        params = _init_mlp(key, x.shape[1], y.shape[1], cfg)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup, steps
        )
        opt = optax.adam(sched)
        opt_state = opt.init(params)
        y_mean_j = jnp.asarray(y_mean, jnp.float32)
        y_std_j = jnp.asarray(y_std, jnp.float32)

        def loss_fn(p, k):
            xj = x + cfg.jitter * jax.random.normal(k, x.shape, jnp.float32)
            pred = _mlp_apply(p, xj)
            mse = jnp.mean(jnp.square(pred - y))
            pred_raw = pred * y_std_j + y_mean_j
            cos = jnp.sum(pred_raw * y_raw, -1) / (
                jnp.linalg.norm(pred_raw, axis=-1)
                * jnp.linalg.norm(y_raw, axis=-1)
                + 1e-8
            )
            return mse + cfg.cosine_weight * jnp.mean(1.0 - cos)

        @jax.jit
        def train(params, opt_state, key):
            def body(carry, k):
                p, s = carry
                l, g = jax.value_and_grad(loss_fn)(p, k)
                upd, s = opt.update(g, s)
                return (optax.apply_updates(p, upd), s), l

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jax.random.split(key, steps)
            )
            return params, opt_state, losses

        params, opt_state, losses = train(params, opt_state, key)
        return {
            "mlp": params,
            "x_mean": jnp.asarray(x_mean, jnp.float32),
            "x_std": jnp.asarray(x_std, jnp.float32),
            "y_mean": y_mean_j,
            "y_std": y_std_j,
        }, float(losses[-1])

    def predict(self, params, rows):
        x = (jnp.asarray(rows, jnp.float32) - params["x_mean"]) / params["x_std"]
        pred = _mlp_apply(params["mlp"], x)
        return pred * params["y_std"] + params["y_mean"]

    @staticmethod
    def cosine(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        return num / den

    def fit(self, rows, targets, extra_rows: Optional[np.ndarray] = None):
        """Fit on (rows, targets); returns (params, metrics).

        A ``val_frac`` split is held out first to measure generalization
        (cosine similarity + relative MSE on unseen rows); the deployed
        params are then refit on ALL pairs with the same step budget.
        ``extra_rows`` (e.g. the train split's rows) only contribute to the
        input standardization moments, so the deployed normalizer covers
        the domain the distiller will be evaluated on.
        """
        rows = np.asarray(rows, np.float32)
        targets = np.asarray(targets, np.float32)
        all_rows = (
            np.concatenate([rows, np.asarray(extra_rows, np.float32)])
            if extra_rows is not None
            else rows
        )
        x_mean = all_rows.mean(0)
        x_std = all_rows.std(0) + 1e-6

        rng = np.random.RandomState(self.cfg.seed)
        perm = rng.permutation(len(rows))
        n_val = max(1, int(len(rows) * self.cfg.val_frac))
        val_idx, tr_idx = perm[:n_val], perm[n_val:]

        key = jax.random.PRNGKey(self.cfg.seed)
        k_holdout, k_final = jax.random.split(key)
        p_holdout, _ = self._fit_arrays(
            rows[tr_idx], targets[tr_idx], x_mean, x_std, k_holdout,
            self.cfg.steps,
        )
        val_pred = np.asarray(self.predict(p_holdout, rows[val_idx]))
        val_cos = self.cosine(val_pred, targets[val_idx])
        val_rel_mse = float(
            np.mean(np.square(val_pred - targets[val_idx]))
            / np.mean(np.square(targets[val_idx] - targets[val_idx].mean(0)))
        )

        params, final_loss = self._fit_arrays(
            rows, targets, x_mean, x_std, k_final, self.cfg.steps
        )
        metrics = {
            "val_cosine_mean": float(val_cos.mean()),
            "val_cosine_min": float(val_cos.min()),
            "val_rel_mse": val_rel_mse,
            "n_val": int(n_val),
            "final_train_loss": final_loss,
        }
        return params, metrics


def build_distilled_act_tree(
    data_root: str,
    out_tree: str,
    real_test_pickle: str,
    cfg: DistillConfig = DistillConfig(),
    echo: bool = True,
):
    """Synthesize the reference's missing ``train_clip_v2`` act embeddings.

    Writes ``data/embedding/act/img/clip_ViT_B_32/{train,test}.pickle``
    under ``out_tree``: test = the committed REAL CLIP array verbatim,
    train = the distiller's predictions on the train split's act rows.
    Remaining tree content (processed CSVs, txt pickles) is copied from
    ``data_root`` so the result is a complete drop-in data root.
    Returns the distiller metrics dict.
    """
    import os
    import pickle
    import shutil

    from ..data.datasets import load_feature_csv

    test_rows = load_feature_csv(
        os.path.join(data_root, "data", "processed", "test_act.csv")
    )
    train_rows = load_feature_csv(
        os.path.join(data_root, "data", "processed", "train_act.csv")
    )
    with open(real_test_pickle, "rb") as f:
        test_clip = np.asarray(pickle.load(f), np.float32)
    assert test_clip.ndim == 2 and test_clip.shape[0] == len(test_rows), (
        test_clip.shape,
        len(test_rows),
    )

    distiller = CLIPDistiller(cfg)
    fit_rows, fit_clip = test_rows, test_clip
    if cfg.fit_fraction < 1.0:
        rng = np.random.RandomState(cfg.seed + 1)
        n_fit = max(2, int(len(test_rows) * cfg.fit_fraction))
        sel = rng.permutation(len(test_rows))[:n_fit]
        fit_rows, fit_clip = test_rows[sel], test_clip[sel]
        if echo:
            print(
                f"[distill] fit_fraction={cfg.fit_fraction}: fitting on "
                f"{n_fit}/{len(test_rows)} test pairs (control run)",
                flush=True,
            )
    params, metrics = distiller.fit(fit_rows, fit_clip, extra_rows=train_rows)
    metrics["fit_fraction"] = float(cfg.fit_fraction)
    train_clip = np.asarray(distiller.predict(params, train_rows), np.float32)
    if echo:
        print(
            f"[distill] held-out cosine {metrics['val_cosine_mean']:.4f} "
            f"(min {metrics['val_cosine_min']:.4f}) rel-MSE "
            f"{metrics['val_rel_mse']:.4f} over {metrics['n_val']} rows",
            flush=True,
        )

    for sub in (
        "data/processed",
        "data/embedding/EEG/txt",
        "data/embedding/act/txt",
        "data/embedding/EEG/img",
    ):
        src = os.path.join(data_root, sub)
        dst = os.path.join(out_tree, sub)
        if os.path.isdir(src):
            # dirs_exist_ok: re-running into a stale --out tree must refresh
            # the copied CSVs/pickles too, or the tree mixes old processed
            # data with new act img pickles with no warning
            shutil.copytree(src, dst, dirs_exist_ok=True)
    save_dir = os.path.join(out_tree, "data", "embedding", "act", "img", "clip_ViT_B_32")
    os.makedirs(save_dir, exist_ok=True)
    with open(os.path.join(save_dir, "train.pickle"), "wb") as f:
        pickle.dump(train_clip, f)
    with open(os.path.join(save_dir, "test.pickle"), "wb") as f:
        pickle.dump(test_clip, f)
    return metrics
