"""Alternative DP-parameter initializations (ref: past_acc.py:94-103).

The reference explores three inits for the learnable DP logits:
  - zeros (the default, models.py:53 / past_acc.py:94);
  - per-modality constants cat(0.4 | 0.5 | 0.3) over the three 768-d segments
    (past_acc.py:95, the 'newinit' runs);
  - 'feawei': feature-magnitude-derived — standardize the per-feature mean of
    the extracted fused features, w_init = 1 - sigmoid(k * standardized),
    DP = modality_constants + w_init - 0.5 (past_acc.py:98-103, results in
    newfrac_1.0eps_newinit_k1 / newfrac_1.0eps_feawei).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

D = 768


def zeros(width: int = 3 * D):
    return jnp.zeros((1, width), jnp.float32)


def modality_constants(values=(0.4, 0.5, 0.3), seg: int = D):
    """cat(full(v0) | full(v1) | full(v2)) (past_acc.py:95)."""
    return jnp.concatenate(
        [jnp.full((1, seg), v, jnp.float32) for v in values], axis=1
    )


def feawei(feature_matrix: np.ndarray, k: float = 1.0,
           base_values=(0.4, 0.5, 0.3)):
    """Feature-magnitude-derived init (past_acc.py:98-103).

    feature_matrix: (N, 2304) extracted fused features (feawei.pkl format,
    past_acc_feawei.py:131-148).
    """
    mean_values = np.mean(np.asarray(feature_matrix), axis=0)
    mean_values = (mean_values - np.mean(mean_values)) / np.std(mean_values)
    w_init = 1.0 - 1.0 / (1.0 + np.exp(-k * mean_values))  # 1 - sigmoid(k x)
    base = np.asarray(modality_constants(base_values, seg=len(mean_values) // 3))
    return jnp.asarray(base + w_init[None, :] - 0.5, jnp.float32)
