"""ResNet-34 feature extractor in pure JAX (ref: get_embedding.py:72-84).

The reference loads torchvision resnet34 weights, sets ``fc = Identity`` and
uses the 512-d pooled features. Same here: standard BasicBlock ResNet-34
(layers [3, 4, 6, 3]), inference-mode BatchNorm (running stats), global
average pool. Weight import from a torchvision state dict.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .layers import MATMUL_PRECISION

LAYERS = (3, 4, 6, 3)  # resnet34
CHANNELS = (64, 128, 256, 512)


def _conv_init(key, out_c, in_c, k, dtype):
    fan = in_c * k * k
    std = math.sqrt(2.0 / fan)
    return std * jax.random.normal(key, (out_c, in_c, k, k), dtype)


def _bn_init(c, dtype):
    return {
        "scale": jnp.ones((c,), dtype),
        "bias": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def init(key, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 256))
    params = {
        "conv1": _conv_init(next(ks), 64, 3, 7, dtype),
        "bn1": _bn_init(64, dtype),
        "layers": [],
    }
    in_c = 64
    for li, (n_blocks, c) in enumerate(zip(LAYERS, CHANNELS)):
        blocks = []
        for b in range(n_blocks):
            stride = 2 if (li > 0 and b == 0) else 1
            block = {
                "conv1": _conv_init(next(ks), c, in_c, 3, dtype),
                "bn1": _bn_init(c, dtype),
                "conv2": _conv_init(next(ks), c, c, 3, dtype),
                "bn2": _bn_init(c, dtype),
            }
            if stride != 1 or in_c != c:
                block["downsample"] = {
                    "conv": _conv_init(next(ks), c, in_c, 1, dtype),
                    "bn": _bn_init(c, dtype),
                }
            blocks.append(block)
            in_c = c
        params["layers"].append(blocks)
    return params


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=MATMUL_PRECISION,
    )


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"][None, :, None, None]) * (p["scale"] * inv)[None, :, None, None] + p["bias"][None, :, None, None]


def _basic_block(p, x, stride):
    identity = x
    out = jax.nn.relu(_bn(p["bn1"], _conv(x, p["conv1"], stride, 1)))
    out = _bn(p["bn2"], _conv(out, p["conv2"], 1, 1))
    if "downsample" in p:
        identity = _bn(p["downsample"]["bn"], _conv(x, p["downsample"]["conv"], stride, 0))
    return jax.nn.relu(out + identity)


def features(params, images):
    """(B, 3, 224, 224) -> (B, 512): resnet34 with fc=Identity
    (ref get_embedding.py:77)."""
    x = jax.nn.relu(_bn(params["bn1"], _conv(images, params["conv1"], 2, 3)))
    # maxpool 3x3 stride 2 pad 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    for li, blocks in enumerate(params["layers"]):
        for b, block in enumerate(blocks):
            stride = 2 if (li > 0 and b == 0) else 1
            x = _basic_block(block, x, stride)
    return x.mean(axis=(2, 3))  # adaptive avg pool to 1x1


def from_torchvision_state_dict(sd):
    import numpy as np

    def get(name):
        v = sd[name]
        return jnp.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        )

    def bn(name):
        return {
            "scale": get(name + ".weight"),
            "bias": get(name + ".bias"),
            "mean": get(name + ".running_mean"),
            "var": get(name + ".running_var"),
        }

    params = {"conv1": get("conv1.weight"), "bn1": bn("bn1"), "layers": []}
    for li, n_blocks in enumerate(LAYERS):
        blocks = []
        for b in range(n_blocks):
            base = f"layer{li + 1}.{b}."
            block = {
                "conv1": get(base + "conv1.weight"),
                "bn1": bn(base + "bn1"),
                "conv2": get(base + "conv2.weight"),
                "bn2": bn(base + "bn2"),
            }
            if base + "downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": get(base + "downsample.0.weight"),
                    "bn": bn(base + "downsample.1"),
                }
            blocks.append(block)
        params["layers"].append(blocks)
    return params
