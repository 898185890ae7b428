"""BERT-base encoder in pure JAX, semantics-compatible with HF ``BertModel``.

The reference encodes the serialized sensor rows with HF
``BertModel.from_pretrained(bert_coef)`` and consumes
``(sequence_output, pooled_output)`` (ref: models.py:40,59-61;
get_embedding.py:111-116 for the tokenizer side). This module reproduces that
model exactly — embeddings (word + absolute position + token type, LayerNorm
eps 1e-12), 12 post-LN layers with GELU FFN 3072, additive attention mask, and
the tanh pooler — as a pure pytree + apply function.

Pretrained weights import via :func:`from_torch_state_dict` (works with any
torch/HF checkpoint on disk; no network access required). Without pretrained
weights the model initializes with HF's truncated-normal(0.02) scheme.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .layers import MATMUL_PRECISION, dropout, linear


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    initializer_range: float = 0.02

    # bert-base-uncased and bert-base-cased differ only in vocab size
    @staticmethod
    def for_coef(coef: str) -> "BertConfig":
        if "cased" in coef and "uncased" not in coef:
            return BertConfig(vocab_size=28996)
        return BertConfig()


def _trunc_normal(key, shape, std, dtype):
    # HF BERT init: normal_(0, 0.02) (not truncated in HF torch impl)
    return std * jax.random.normal(key, shape, dtype)


def _dense_init(key, fan_in, fan_out, std, dtype):
    return {
        "kernel": _trunc_normal(key, (fan_in, fan_out), std, dtype),
        "bias": jnp.zeros((fan_out,), dtype),
    }


def _ln_init(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init(key, config: BertConfig = BertConfig(), dtype=jnp.float32):
    H, I = config.hidden_size, config.intermediate_size
    std = config.initializer_range
    n_keys = 4 + config.num_layers * 6 + 1
    ks = iter(jax.random.split(key, n_keys))
    params = {
        "embeddings": {
            "word": _trunc_normal(next(ks), (config.vocab_size, H), std, dtype),
            "position": _trunc_normal(
                next(ks), (config.max_position_embeddings, H), std, dtype
            ),
            "token_type": _trunc_normal(next(ks), (config.type_vocab_size, H), std, dtype),
            "ln": _ln_init(H, dtype),
        },
        "layers": [],
        "pooler": _dense_init(next(ks), H, H, std, dtype),
    }
    for _ in range(config.num_layers):
        params["layers"].append(
            {
                "attn": {
                    "query": _dense_init(next(ks), H, H, std, dtype),
                    "key": _dense_init(next(ks), H, H, std, dtype),
                    "value": _dense_init(next(ks), H, H, std, dtype),
                    "output": _dense_init(next(ks), H, H, std, dtype),
                    "ln": _ln_init(H, dtype),
                },
                "ffn": {
                    "intermediate": _dense_init(next(ks), H, I, std, dtype),
                    "output": _dense_init(next(ks), I, H, std, dtype),
                    "ln": _ln_init(H, dtype),
                },
            }
        )
    return params


def _layer_norm(params, x, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


# Use the fused Pallas attention kernel (ops/attention.py) when shapes allow.
# Set False to force the einsum reference path.
USE_FUSED_ATTENTION = True

# Compute Q, K, V with ONE (H, 3H) matmul over concatenated projection
# weights instead of three (H, H) matmuls. At the flagship's shapes
# (B=8, S=80 -> 640 tokens) each projection matmul is ~4 us of MXU work, so
# the encoder is op-count/latency-bound, not FLOP-bound (roofline: fwd at
# 43% of its FLOP light); packing cuts 2 matmul dispatches per layer per
# pass at the cost of one weight concat (~3.5 MB bf16/layer, fused into the
# matmul read). Bitwise: the packed matmul computes identical dot products
# per output column block, so q/k/v match the unpacked path exactly on TPU
# (same K-dim reduction per column). The param tree keeps the torch-shaped
# separate q/k/v entries (state-dict round trip untouched).
PACKED_QKV = True


def _self_attention(p, x, attn_bias, num_heads, attn_drop, key):
    B, S, H = x.shape
    D = H // num_heads
    if PACKED_QKV:
        w = jnp.concatenate(
            [p["query"]["kernel"], p["key"]["kernel"], p["value"]["kernel"]],
            axis=1,
        )
        b = jnp.concatenate(
            [p["query"]["bias"], p["key"]["bias"], p["value"]["bias"]]
        )
        qkv = (
            jnp.dot(x, w, preferred_element_type=jnp.float32,
                    precision=MATMUL_PRECISION)
            + b
        ).astype(x.dtype)
        q, k, v = (
            qkv[..., i * H : (i + 1) * H]
            .reshape(B, S, num_heads, D)
            .transpose(0, 2, 1, 3)
            for i in range(3)
        )
    else:
        q = linear(p["query"], x).reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
        k = linear(p["key"], x).reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
        v = linear(p["value"], x).reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)

    from ..ops import attention as fused

    if USE_FUSED_ATTENTION and fused.attention_available(S, D):
        bias3 = attn_bias[:, 0, 0, :][:, None, :]  # (B, 1, S)
        if key is not None and attn_drop > 0.0:
            seed = jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)
            ctx = fused.fused_attention(q, k, v, bias3, seed, attn_drop)
        else:
            ctx = fused.fused_attention(
                q, k, v, bias3, jnp.zeros((1,), jnp.int32), 0.0
            )
    else:
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION
        ) / math.sqrt(D)
        scores = scores + attn_bias  # additive mask, HF-style
        probs = jax.nn.softmax(scores, axis=-1)
        probs = dropout(probs, attn_drop, key)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, H).astype(x.dtype)
    return linear(p["output"], ctx)


def apply(
    params,
    input_ids,  # (B, S) int32
    attention_mask,  # (B, S) {0,1}
    config: BertConfig = BertConfig(),
    dropout_key: Optional[jax.Array] = None,
    token_type_ids=None,
):
    """Forward pass; returns ``(sequence_output, pooled_output)`` matching
    torch ``BertModel(..., return_dict=False)`` (ref: models.py:59-61)."""
    B, S = input_ids.shape
    emb = params["embeddings"]
    x = emb["word"][input_ids]
    x = x + emb["position"][jnp.arange(S)][None, :, :]
    if token_type_ids is None:
        x = x + emb["token_type"][0][None, None, :]
    else:
        x = x + emb["token_type"][token_type_ids]
    x = _layer_norm(emb["ln"], x, config.layer_norm_eps)

    n = config.num_layers
    if dropout_key is not None:
        keys = jax.random.split(dropout_key, 3 * n + 1)
        x = dropout(x, config.hidden_dropout, keys[-1])
    else:
        keys = [None] * (3 * n + 1)

    # HF extended attention mask: (1 - m) * dtype_min added to logits
    neg = jnp.finfo(jnp.float32).min
    attn_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg

    for i, layer in enumerate(params["layers"]):
        attn_out = _self_attention(
            layer["attn"], x, attn_bias, config.num_heads,
            config.attention_dropout, keys[3 * i],
        )
        attn_out = dropout(attn_out, config.hidden_dropout, keys[3 * i + 1])
        x = _layer_norm(layer["attn"]["ln"], x + attn_out, config.layer_norm_eps)
        h = jax.nn.gelu(linear(layer["ffn"]["intermediate"], x), approximate=False)
        h = linear(layer["ffn"]["output"], h)
        h = dropout(h, config.hidden_dropout, keys[3 * i + 2])
        x = _layer_norm(layer["ffn"]["ln"], x + h, config.layer_norm_eps)

    pooled = jnp.tanh(linear(params["pooler"], x[:, 0]))
    return x, pooled


# ---------------------------------------------------------------------------
# HF/torch state-dict round trip
# ---------------------------------------------------------------------------

def from_torch_state_dict(state_dict, config: BertConfig = BertConfig(), prefix: str = ""):
    """Build a params pytree from an HF ``BertModel`` state dict.

    ``state_dict`` values may be torch tensors or numpy arrays. ``prefix``
    handles nesting, e.g. ``"bert."`` for the reference's fusion models whose
    checkpoints store keys like ``bert.encoder.layer.0...``
    (ref checkpoint format: base_train.py:251 torch.save(model.state_dict())).
    """
    import numpy as np

    def get(name, transpose=False):
        v = state_dict[prefix + name]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        return jnp.asarray(v.T if transpose else v)

    def dense(name):
        return {"kernel": get(name + ".weight", transpose=True), "bias": get(name + ".bias")}

    def ln(name):
        return {"scale": get(name + ".weight"), "bias": get(name + ".bias")}

    params = {
        "embeddings": {
            "word": get("embeddings.word_embeddings.weight"),
            "position": get("embeddings.position_embeddings.weight"),
            "token_type": get("embeddings.token_type_embeddings.weight"),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": [],
        "pooler": dense("pooler.dense"),
    }
    for i in range(config.num_layers):
        base = f"encoder.layer.{i}."
        params["layers"].append(
            {
                "attn": {
                    "query": dense(base + "attention.self.query"),
                    "key": dense(base + "attention.self.key"),
                    "value": dense(base + "attention.self.value"),
                    "output": dense(base + "attention.output.dense"),
                    "ln": ln(base + "attention.output.LayerNorm"),
                },
                "ffn": {
                    "intermediate": dense(base + "intermediate.dense"),
                    "output": dense(base + "output.dense"),
                    "ln": ln(base + "output.LayerNorm"),
                },
            }
        )
    return params


def to_torch_state_dict(params, prefix: str = ""):
    """Inverse of :func:`from_torch_state_dict` (numpy arrays, torch layout)."""
    import numpy as np

    out = {}

    def put(name, v, transpose=False):
        a = np.asarray(v)
        out[prefix + name] = a.T if transpose else a

    def dense(name, p):
        put(name + ".weight", p["kernel"], transpose=True)
        put(name + ".bias", p["bias"])

    def ln(name, p):
        put(name + ".weight", p["scale"])
        put(name + ".bias", p["bias"])

    emb = params["embeddings"]
    put("embeddings.word_embeddings.weight", emb["word"])
    put("embeddings.position_embeddings.weight", emb["position"])
    put("embeddings.token_type_embeddings.weight", emb["token_type"])
    ln("embeddings.LayerNorm", emb["ln"])
    for i, layer in enumerate(params["layers"]):
        base = f"encoder.layer.{i}."
        dense(base + "attention.self.query", layer["attn"]["query"])
        dense(base + "attention.self.key", layer["attn"]["key"])
        dense(base + "attention.self.value", layer["attn"]["value"])
        dense(base + "attention.output.dense", layer["attn"]["output"])
        ln(base + "attention.output.LayerNorm", layer["attn"]["ln"])
        dense(base + "intermediate.dense", layer["ffn"]["intermediate"])
        dense(base + "output.dense", layer["ffn"]["output"])
        ln(base + "output.LayerNorm", layer["ffn"]["ln"])
    dense("pooler.dense", params["pooler"])
    return out
