"""CLIP visual transformer (ViT-B/32, ViT-B/16) in pure JAX.

The reference encodes sensor-images with ``clip.load(coef).encode_image``
(ref: get_embedding.py:62-71) — only the visual tower is used, fed raw
TransferToImage tensors (no CLIP preprocessing). This reimplements exactly
that tower: stride-P conv patch embed, class token + learned positional
embedding, pre-LN transformer with QuickGELU MLPs, ln_post on the class
token, and the 512-d projection. Weight import from an OpenAI CLIP torch
state dict via :func:`from_clip_state_dict` (offline; no network).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .layers import MATMUL_PRECISION, linear


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 32  # 16 for ViT-B/16
    width: int = 768
    layers: int = 12
    heads: int = 12
    image_size: int = 224
    output_dim: int = 512

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1

    @staticmethod
    def for_coef(coef: str) -> "ViTConfig":
        return ViTConfig(patch_size=16 if "16" in coef else 32)


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init(key, cfg: ViTConfig = ViTConfig(), dtype=jnp.float32):
    W = cfg.width
    ks = iter(jax.random.split(key, 4 + cfg.layers * 4))
    scale = W ** -0.5
    params = {
        "conv": scale * jax.random.normal(
            next(ks), (W, 3, cfg.patch_size, cfg.patch_size), dtype
        ),
        "class_embedding": scale * jax.random.normal(next(ks), (W,), dtype),
        "positional_embedding": scale * jax.random.normal(
            next(ks), (cfg.seq_len, W), dtype
        ),
        "ln_pre": _ln_init(W, dtype),
        "ln_post": _ln_init(W, dtype),
        "proj": scale * jax.random.normal(next(ks), (W, cfg.output_dim), dtype),
        "blocks": [],
    }
    for _ in range(cfg.layers):
        params["blocks"].append(
            {
                "ln_1": _ln_init(W, dtype),
                "attn": {
                    "in_proj_kernel": scale * jax.random.normal(next(ks), (W, 3 * W), dtype),
                    "in_proj_bias": jnp.zeros((3 * W,), dtype),
                    "out_proj": {
                        "kernel": scale * jax.random.normal(next(ks), (W, W), dtype),
                        "bias": jnp.zeros((W,), dtype),
                    },
                },
                "ln_2": _ln_init(W, dtype),
                "mlp": {
                    "c_fc": {
                        "kernel": scale * jax.random.normal(next(ks), (W, 4 * W), dtype),
                        "bias": jnp.zeros((4 * W,), dtype),
                    },
                    "c_proj": {
                        "kernel": scale * jax.random.normal(next(ks), (4 * W, W), dtype),
                        "bias": jnp.zeros((W,), dtype),
                    },
                },
            }
        )
    return params


def _ln(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    m = x32.mean(-1, keepdims=True)
    v = jnp.square(x32 - m).mean(-1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def quick_gelu(x):
    """CLIP's QuickGELU: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def _attn(p, x, heads):
    B, S, W = x.shape
    D = W // heads
    qkv = jnp.dot(x, p["in_proj_kernel"], precision=MATMUL_PRECISION) + p["in_proj_bias"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, heads, D).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=MATMUL_PRECISION) / math.sqrt(D)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v, precision=MATMUL_PRECISION)
    o = o.transpose(0, 2, 1, 3).reshape(B, S, W)
    return linear(p["out_proj"], o)


def encode_image(params, images, cfg: ViTConfig = ViTConfig()):
    """(B, 3, H, W) -> (B, output_dim), CLIP ``encode_image`` semantics."""
    B = images.shape[0]
    P, W = cfg.patch_size, cfg.width
    # stride-P conv == per-patch flatten + matmul (MXU-friendly)
    g = cfg.grid
    x = images.reshape(B, 3, g, P, g, P).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(B, g * g, 3 * P * P)
    kernel = params["conv"].reshape(W, 3 * P * P).T
    x = jnp.dot(x, kernel, precision=MATMUL_PRECISION)  # (B, g*g, W)
    cls = jnp.broadcast_to(params["class_embedding"], (B, 1, W))
    x = jnp.concatenate([cls, x], axis=1) + params["positional_embedding"]
    x = _ln(params["ln_pre"], x)
    for blk in params["blocks"]:
        x = x + _attn(blk["attn"], _ln(blk["ln_1"], x), cfg.heads)
        h = quick_gelu(linear(blk["mlp"]["c_fc"], _ln(blk["ln_2"], x)))
        x = x + linear(blk["mlp"]["c_proj"], h)
    pooled = _ln(params["ln_post"], x[:, 0])
    return jnp.dot(pooled, params["proj"], precision=MATMUL_PRECISION)


def from_clip_state_dict(sd, cfg: Optional[ViTConfig] = None):
    """OpenAI CLIP state dict (full model or visual-only) -> params.

    Keys: visual.conv1.weight, visual.class_embedding,
    visual.positional_embedding, visual.ln_pre/post.{weight,bias},
    visual.transformer.resblocks.N.{ln_1,attn,ln_2,mlp.c_fc,mlp.c_proj}.*,
    visual.proj.
    """
    import numpy as np

    def get(name):
        for k in (f"visual.{name}", name):
            if k in sd:
                v = sd[k]
                return jnp.asarray(
                    v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v)
                )
        raise KeyError(name)

    conv = get("conv1.weight")
    if cfg is None:
        cfg = ViTConfig(patch_size=int(conv.shape[-1]), width=int(conv.shape[0]))

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    def dense(name):
        return {"kernel": get(name + ".weight").T, "bias": get(name + ".bias")}

    params = {
        "conv": conv,
        "class_embedding": get("class_embedding"),
        "positional_embedding": get("positional_embedding"),
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "proj": get("proj"),
        "blocks": [],
    }
    for i in range(cfg.layers):
        base = f"transformer.resblocks.{i}."
        params["blocks"].append(
            {
                "ln_1": ln(base + "ln_1"),
                "attn": {
                    "in_proj_kernel": get(base + "attn.in_proj_weight").T,
                    "in_proj_bias": get(base + "attn.in_proj_bias"),
                    "out_proj": dense(base + "attn.out_proj"),
                },
                "ln_2": ln(base + "ln_2"),
                "mlp": {
                    "c_fc": dense(base + "mlp.c_fc"),
                    "c_proj": dense(base + "mlp.c_proj"),
                },
            }
        )
    return params, cfg
