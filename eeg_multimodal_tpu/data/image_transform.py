"""Sensor-row -> 3x224x224 image transforms (ref: get_embedding.py:18-48).

act rows (25 values): append last value twice -> (27,) -> reshape(3,3,3) ->
permute(2,0,1) -> nearest-neighbor upsample x74 -> (3,222,222) -> zero-pad 1
-> (3,224,224)                       (ref TransferToImage, get_embedding.py:26-31)

EEG rows (30 values): min-max normalize -> linear interpolation to 224*224
points -> reshape(224,224) -> stack x3 (ref get_embedding.py:32-44)

Both are pure jnp functions, vmapped over the whole split at once — the
reference's per-row Python loop becomes one XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

IMG_SIZE = 224
UPSAMPLE = 74  # ref: get_embedding.py:22 nn.Upsample(scale_factor=74)


def act_row_to_image(row: jnp.ndarray) -> jnp.ndarray:
    """(25,) -> (3, 224, 224) (ref get_embedding.py:26-31)."""
    row = jnp.concatenate([row, row[-1:], row[-1:]])  # + last value x2
    t = row.reshape(3, 3, 3).transpose(2, 0, 1)  # permute(2,0,1)
    # nearest-neighbor upsample x74: repeat each cell 74x74
    t = jnp.repeat(jnp.repeat(t, UPSAMPLE, axis=1), UPSAMPLE, axis=2)
    return jnp.pad(t, ((0, 0), (1, 1), (1, 1)))  # ZeroPad2d(1)


def eeg_row_to_image(row: jnp.ndarray) -> jnp.ndarray:
    """(C,) -> (3, 224, 224) (ref get_embedding.py:32-44)."""
    r = (row - row.min()) / (row.max() - row.min())
    n = row.shape[0]
    x_orig = jnp.linspace(0.0, 1.0, n)
    x_new = jnp.linspace(0.0, 1.0, IMG_SIZE * IMG_SIZE)
    interp = jnp.interp(x_new, x_orig, r)
    img = interp.reshape(IMG_SIZE, IMG_SIZE)
    return jnp.stack([img, img, img], axis=0)


@jax.jit
def act_to_images(rows: jnp.ndarray) -> jnp.ndarray:
    """(N, 25) -> (N, 3, 224, 224)."""
    return jax.vmap(act_row_to_image)(rows.astype(jnp.float32))


@jax.jit
def eeg_to_images(rows: jnp.ndarray) -> jnp.ndarray:
    """(N, C) -> (N, 3, 224, 224)."""
    return jax.vmap(eeg_row_to_image)(rows.astype(jnp.float32))
