"""Torch-semantics transformer primitives as pure JAX functions.

The reference model zoo is built from ``nn.Linear``, ``nn.LayerNorm``,
``nn.MultiheadAttention``, ``nn.TransformerDecoderLayer`` /
``nn.TransformerEncoderLayer`` (post-LN, ReLU FFN of width 2048, dropout 0.1)
— ref: python/src/custom_models/models.py:44-45,235-236. These functions
reproduce those exact forward semantics (including key-padding masks and
train-time dropout placement) so that golden-value tests against torch CPU
pass to float tolerance, while staying jit/vmap/pjit-friendly:

- params are plain nested dicts of jnp arrays (easy state-dict round-trip),
- all layouts are batch-first ``(B, S, E)`` (the torch code permutes to
  seq-first purely for torch's API; semantics are identical),
- randomness (dropout) is explicit key-threading, inactive when key is None,
- matmuls carry ``preferred_element_type`` so XLA keeps f32 accumulation on
  the MXU even under bf16 params.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# Matmul precision for float32 inputs. JAX's default lets the backend use
# fast low-precision passes (bf16 on TPU MXU *and* on CPU oneDNN), which is
# wrong for f32 parity paths — observed 1e-1-level error on CPU. HIGHEST
# forces true f32 accumulation. bf16 runs are unaffected (bf16 inputs are
# exact at bf16); the TPU hot path gets its speed from bf16 params, not from
# degraded f32 matmuls.
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Initializers (matching torch defaults in distribution)
# ---------------------------------------------------------------------------

def linear_init(key, in_features: int, out_features: int, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_features)
    return {
        "kernel": jax.random.uniform(
            kw, (in_features, out_features), dtype, -bound, bound
        ),
        "bias": jax.random.uniform(kb, (out_features,), dtype, -bound, bound),
    }


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def mha_init(key, embed_dim: int, dtype=jnp.float32):
    """torch nn.MultiheadAttention init: xavier_uniform in_proj, zero biases
    except out_proj bias (also zero)."""
    k1, k2 = jax.random.split(key)
    return {
        # stored as (E, 3E): y = x @ in_proj  (torch in_proj_weight is (3E, E))
        "in_proj_kernel": xavier_uniform(k1, (embed_dim, 3 * embed_dim), dtype),
        "in_proj_bias": jnp.zeros((3 * embed_dim,), dtype),
        "out_proj": {
            "kernel": xavier_uniform(k2, (embed_dim, embed_dim), dtype),
            "bias": jnp.zeros((embed_dim,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# Forward primitives
# ---------------------------------------------------------------------------

def linear(params, x):
    kernel = params["kernel"]
    y = jnp.dot(x, kernel, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION)
    return (y + params["bias"]).astype(x.dtype)


def layer_norm(params, x, eps: float = 1e-5):
    # torch LayerNorm: biased variance over the last dim.
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(x.dtype)


def dropout(x, rate: float, key: Optional[jax.Array]):
    """Inverted dropout (torch semantics). Identity when key is None."""
    if key is None or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def multi_head_attention(
    params,
    query,  # (B, Sq, E)
    key_value,  # (B, Sk, E)
    num_heads: int,
    key_padding_mask=None,  # (B, Sk) bool: True = ignore this key position
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
):
    """torch nn.MultiheadAttention forward (batch-first, need_weights=False).

    ref usage: models.py:44-45 via TransformerDecoderLayer; masks are
    ``mask == 0`` converted to key_padding_mask (models.py:66-67).
    """
    B, Sq, E = query.shape
    Sk = key_value.shape[1]
    H = num_heads
    D = E // H

    in_kernel = params["in_proj_kernel"]
    in_bias = params["in_proj_bias"]
    q = jnp.dot(query, in_kernel[:, :E], preferred_element_type=jnp.float32, precision=MATMUL_PRECISION) + in_bias[:E]
    k = jnp.dot(key_value, in_kernel[:, E : 2 * E], preferred_element_type=jnp.float32, precision=MATMUL_PRECISION) + in_bias[E : 2 * E]
    v = jnp.dot(key_value, in_kernel[:, 2 * E :], preferred_element_type=jnp.float32, precision=MATMUL_PRECISION) + in_bias[2 * E :]

    q = q.reshape(B, Sq, H, D).transpose(0, 2, 1, 3)  # (B,H,Sq,D)
    k = k.reshape(B, Sk, H, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, Sk, H, D).transpose(0, 2, 1, 3)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION
    ) / math.sqrt(D)
    if key_padding_mask is not None:
        neg = jnp.asarray(-jnp.inf, scores.dtype)
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = dropout(attn, dropout_rate, dropout_key)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32, precision=MATMUL_PRECISION)
    out = out.transpose(0, 2, 1, 3).reshape(B, Sq, E).astype(query.dtype)
    return linear(params["out_proj"], out)


# ---------------------------------------------------------------------------
# TransformerDecoderLayer / TransformerEncoderLayer (torch post-LN defaults)
# ---------------------------------------------------------------------------

FFN_DIM = 2048  # torch TransformerDecoderLayer default dim_feedforward
P_DROP = 0.1  # torch default dropout


def decoder_layer_init(key, d_model: int, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "self_attn": mha_init(ks[0], d_model, dtype),
        "cross_attn": mha_init(ks[1], d_model, dtype),
        "linear1": linear_init(ks[2], d_model, FFN_DIM, dtype),
        "linear2": linear_init(ks[3], FFN_DIM, d_model, dtype),
        "norm1": layer_norm_init(d_model, dtype),
        "norm2": layer_norm_init(d_model, dtype),
        "norm3": layer_norm_init(d_model, dtype),
    }


def decoder_layer(
    params,
    tgt,  # (B, St, E)
    memory,  # (B, Sm, E)
    num_heads: int,
    tgt_key_padding_mask=None,
    memory_key_padding_mask=None,
    dropout_key: Optional[jax.Array] = None,
    dropout_rate: float = P_DROP,
):
    """torch nn.TransformerDecoderLayer (norm_first=False, relu)."""
    keys = (
        jax.random.split(dropout_key, 6) if dropout_key is not None else [None] * 6
    )
    x = tgt
    sa = multi_head_attention(
        params["self_attn"], x, x, num_heads,
        key_padding_mask=tgt_key_padding_mask,
        dropout_rate=dropout_rate, dropout_key=keys[0],
    )
    x = layer_norm(params["norm1"], x + dropout(sa, dropout_rate, keys[1]))
    ca = multi_head_attention(
        params["cross_attn"], x, memory, num_heads,
        key_padding_mask=memory_key_padding_mask,
        dropout_rate=dropout_rate, dropout_key=keys[2],
    )
    x = layer_norm(params["norm2"], x + dropout(ca, dropout_rate, keys[3]))
    h = jax.nn.relu(linear(params["linear1"], x))
    h = dropout(h, dropout_rate, keys[4])
    h = linear(params["linear2"], h)
    x = layer_norm(params["norm3"], x + dropout(h, dropout_rate, keys[5]))
    return x


def decoder_init(key, d_model: int, num_layers: int, dtype=jnp.float32):
    """torch nn.TransformerDecoder(decoder_layer, num_layers): layers are
    deep copies of one module, i.e. *identically initialized* — reproduced
    here by reusing one init (ref: models.py:45)."""
    layer = decoder_layer_init(key, d_model, dtype)
    # distinct buffers per layer (donation/sharding need non-aliased leaves)
    return {"layers": [jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), layer)
                       for _ in range(num_layers)]}


def decoder(
    params, tgt, memory, num_heads: int,
    tgt_key_padding_mask=None, memory_key_padding_mask=None,
    dropout_key: Optional[jax.Array] = None, dropout_rate: float = P_DROP,
):
    x = tgt
    n = len(params["layers"])
    keys = jax.random.split(dropout_key, n) if dropout_key is not None else [None] * n
    for layer_params, k in zip(params["layers"], keys):
        x = decoder_layer(
            layer_params, x, memory, num_heads,
            tgt_key_padding_mask=tgt_key_padding_mask,
            memory_key_padding_mask=memory_key_padding_mask,
            dropout_key=k, dropout_rate=dropout_rate,
        )
    return x


def encoder_layer_init(key, d_model: int, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks[0], d_model, dtype),
        "linear1": linear_init(ks[1], d_model, FFN_DIM, dtype),
        "linear2": linear_init(ks[2], FFN_DIM, d_model, dtype),
        "norm1": layer_norm_init(d_model, dtype),
        "norm2": layer_norm_init(d_model, dtype),
    }


def encoder_layer(
    params, src, num_heads: int,
    src_key_padding_mask=None,
    dropout_key: Optional[jax.Array] = None, dropout_rate: float = P_DROP,
):
    """torch nn.TransformerEncoderLayer (norm_first=False, relu).
    ref: models.py:235-236 (TISC single-stream model)."""
    keys = (
        jax.random.split(dropout_key, 4) if dropout_key is not None else [None] * 4
    )
    x = src
    sa = multi_head_attention(
        params["self_attn"], x, x, num_heads,
        key_padding_mask=src_key_padding_mask,
        dropout_rate=dropout_rate, dropout_key=keys[0],
    )
    x = layer_norm(params["norm1"], x + dropout(sa, dropout_rate, keys[1]))
    h = jax.nn.relu(linear(params["linear1"], x))
    h = dropout(h, dropout_rate, keys[2])
    h = linear(params["linear2"], h)
    x = layer_norm(params["norm2"], x + dropout(h, dropout_rate, keys[3]))
    return x


def encoder_init(key, d_model: int, num_layers: int, dtype=jnp.float32):
    layer = encoder_layer_init(key, d_model, dtype)
    return {"layers": [jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), layer)
                       for _ in range(num_layers)]}


def encoder(
    params, src, num_heads: int, src_key_padding_mask=None,
    dropout_key: Optional[jax.Array] = None, dropout_rate: float = P_DROP,
):
    x = src
    n = len(params["layers"])
    keys = jax.random.split(dropout_key, n) if dropout_key is not None else [None] * n
    for layer_params, k in zip(params["layers"], keys):
        x = encoder_layer(
            layer_params, x, num_heads,
            src_key_padding_mask=src_key_padding_mask,
            dropout_key=k, dropout_rate=dropout_rate,
        )
    return x
