"""Checkpointing: pytree save/load + torch state-dict round-trip adapter.

The reference checkpoints ``torch.save(model.state_dict(), ...best_f1.pickle)``
on F1 improvement (base_train.py:250-255) and resumes with
``load_state_dict(..., strict=False)`` (main_0425.py:271). BASELINE.json
requires round-trip fidelity to that format, so this module maps our fusion
pytrees to/from the exact torch key naming of the reference's nn.Modules:

  bert.embeddings.word_embeddings.weight, bert.encoder.layer.N...,
  visual_encoder.weight/.bias,
  multi_head_decoderlayer.* (the prototype submodule) and
  multi_head_decoder.layers.N.{self_attn,multihead_attn,linear1,linear2,
  norm1,norm2,norm3}.*  (models.py:44-45),
  fc_layers.{0,2}.weight/.bias (models.py:46-51),
  classifier.weight/.bias, DP (models.py:52-53).

Opacus-wrapped checkpoints carry '_module.'-prefixed keys
(model_dict/PriConcat/fineturn); :func:`normalize_torch_keys` strips them,
mirroring the reference's strict=False tolerance.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import bert as bert_mod
from ..models.fusion import FusionConfig


# ---------------------------------------------------------------------------
# Plain pytree checkpoints
# ---------------------------------------------------------------------------

def save_pytree(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, treedef = jax.tree_util.tree_flatten(tree)
    with open(path, "wb") as f:
        pickle.dump(
            {"leaves": [np.asarray(x) for x in flat], "treedef": treedef}, f
        )


def load_pytree(path: str):
    with open(path, "rb") as f:
        d = pickle.load(f)
    return jax.tree_util.tree_unflatten(
        d["treedef"], [jnp.asarray(x) for x in d["leaves"]]
    )


# Optional orbax backend: async-capable, step-indexed checkpoints for long
# runs (SURVEY §5's 'orbax-style checkpoint every N steps' plan). The pickle
# backend above stays the default (no extra deps, torch-interop friendly).

def save_pytree_orbax(path: str, tree) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_pytree_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(path, like)
        return ckptr.restore(path)


# ---------------------------------------------------------------------------
# torch state-dict round trip for fusion models
# ---------------------------------------------------------------------------

def normalize_torch_keys(sd: Dict) -> Dict:
    """Strip Opacus/DataParallel wrappers: '_module.' / 'module.' prefixes."""
    out = {}
    for k, v in sd.items():
        for pre in ("_module.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _mha_from_sd(sd, base):
    return {
        "in_proj_kernel": jnp.asarray(_np(sd[base + "in_proj_weight"]).T),
        "in_proj_bias": jnp.asarray(_np(sd[base + "in_proj_bias"])),
        "out_proj": {
            "kernel": jnp.asarray(_np(sd[base + "out_proj.weight"]).T),
            "bias": jnp.asarray(_np(sd[base + "out_proj.bias"])),
        },
    }


def _linear_from_sd(sd, base):
    return {
        "kernel": jnp.asarray(_np(sd[base + ".weight"]).T),
        "bias": jnp.asarray(_np(sd[base + ".bias"])),
    }


def _ln_from_sd(sd, base):
    return {
        "scale": jnp.asarray(_np(sd[base + ".weight"])),
        "bias": jnp.asarray(_np(sd[base + ".bias"])),
    }


def _decoder_layer_from_sd(sd, base):
    return {
        "self_attn": _mha_from_sd(sd, base + "self_attn."),
        "cross_attn": _mha_from_sd(sd, base + "multihead_attn."),
        "linear1": _linear_from_sd(sd, base + "linear1"),
        "linear2": _linear_from_sd(sd, base + "linear2"),
        "norm1": _ln_from_sd(sd, base + "norm1"),
        "norm2": _ln_from_sd(sd, base + "norm2"),
        "norm3": _ln_from_sd(sd, base + "norm3"),
    }


def _encoder_layer_from_sd(sd, base):
    return {
        "self_attn": _mha_from_sd(sd, base + "self_attn."),
        "linear1": _linear_from_sd(sd, base + "linear1"),
        "linear2": _linear_from_sd(sd, base + "linear2"),
        "norm1": _ln_from_sd(sd, base + "norm1"),
        "norm2": _ln_from_sd(sd, base + "norm2"),
    }


def fusion_from_torch_state_dict(sd: Dict, config: FusionConfig):
    """Reference checkpoint (state_dict) -> our fusion params pytree."""
    sd = normalize_torch_keys(sd)
    params = {}
    if config.uses_bert:
        params["bert"] = bert_mod.from_torch_state_dict(
            sd, config.bert_cfg(), prefix="bert."
        )
    if config.uses_visual:
        params["visual_encoder"] = _linear_from_sd(sd, "visual_encoder")
    if config.with_cross_attention:
        if config.cross_atn_type == "single_stream":
            stack, n = "multi_head_encoder.layers.", 3
            params["cross"] = {
                "layers": [_encoder_layer_from_sd(sd, f"{stack}{i}.") for i in range(n)]
            }
        else:
            stack, n = "multi_head_decoder.layers.", 3
            params["cross"] = {
                "layers": [_decoder_layer_from_sd(sd, f"{stack}{i}.") for i in range(n)]
            }
    params["fc1"] = _linear_from_sd(sd, "fc_layers.0")
    params["fc2"] = _linear_from_sd(sd, "fc_layers.2")
    params["classifier"] = _linear_from_sd(sd, "classifier")
    if "DP" in sd:
        params["DP"] = jnp.asarray(_np(sd["DP"]))
    if "w" in sd:
        params["w"] = jnp.asarray(_np(sd["w"]))
    return params


def _mha_to_sd(out, base, p):
    out[base + "in_proj_weight"] = np.asarray(p["in_proj_kernel"]).T
    out[base + "in_proj_bias"] = np.asarray(p["in_proj_bias"])
    out[base + "out_proj.weight"] = np.asarray(p["out_proj"]["kernel"]).T
    out[base + "out_proj.bias"] = np.asarray(p["out_proj"]["bias"])


def _linear_to_sd(out, base, p):
    out[base + ".weight"] = np.asarray(p["kernel"]).T
    out[base + ".bias"] = np.asarray(p["bias"])


def _ln_to_sd(out, base, p):
    out[base + ".weight"] = np.asarray(p["scale"])
    out[base + ".bias"] = np.asarray(p["bias"])


def _decoder_layer_to_sd(out, base, p):
    _mha_to_sd(out, base + "self_attn.", p["self_attn"])
    _mha_to_sd(out, base + "multihead_attn.", p["cross_attn"])
    _linear_to_sd(out, base + "linear1", p["linear1"])
    _linear_to_sd(out, base + "linear2", p["linear2"])
    for n in ("norm1", "norm2", "norm3"):
        _ln_to_sd(out, base + n, p[n])


def _encoder_layer_to_sd(out, base, p):
    _mha_to_sd(out, base + "self_attn.", p["self_attn"])
    _linear_to_sd(out, base + "linear1", p["linear1"])
    _linear_to_sd(out, base + "linear2", p["linear2"])
    for n in ("norm1", "norm2"):
        _ln_to_sd(out, base + n, p[n])


def fusion_to_torch_state_dict(params, config: FusionConfig) -> Dict:
    """Our fusion params -> reference torch state-dict key naming. The
    prototype layer submodule (multi_head_decoderlayer.*) is emitted as a
    copy of layer 0, exactly as torch registers it (models.py:44-45)."""
    out: Dict[str, np.ndarray] = {}
    if "DP" in params:
        out["DP"] = np.asarray(params["DP"])
    if "w" in params:
        out["w"] = np.asarray(params["w"])
    if config.uses_bert:
        for k, v in bert_mod.to_torch_state_dict(params["bert"], prefix="bert.").items():
            out[k] = v
    if config.uses_visual:
        _linear_to_sd(out, "visual_encoder", params["visual_encoder"])
    if config.with_cross_attention:
        layers = params["cross"]["layers"]
        if config.cross_atn_type == "single_stream":
            _encoder_layer_to_sd(out, "multi_head_encoderlayer.", layers[0])
            for i, lp in enumerate(layers):
                _encoder_layer_to_sd(out, f"multi_head_encoder.layers.{i}.", lp)
        else:
            _decoder_layer_to_sd(out, "multi_head_decoderlayer.", layers[0])
            for i, lp in enumerate(layers):
                _decoder_layer_to_sd(out, f"multi_head_decoder.layers.{i}.", lp)
    _linear_to_sd(out, "fc_layers.0", params["fc1"])
    _linear_to_sd(out, "fc_layers.2", params["fc2"])
    _linear_to_sd(out, "classifier", params["classifier"])
    return out


def save_torch_checkpoint(path: str, params, config: FusionConfig) -> None:
    """Write a best_f1.pickle loadable by torch.load (plain pickle of numpy
    arrays — torch.load(weights_only=False) accepts it; also loadable without
    torch installed)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(fusion_to_torch_state_dict(params, config), f)


def load_torch_checkpoint(path: str, config: FusionConfig):
    """Read a reference best_f1.pickle (torch-saved) or our pickle format."""
    try:
        with open(path, "rb") as f:
            sd = pickle.load(f)
    except Exception:
        import torch

        sd = torch.load(path, map_location="cpu")
    return fusion_from_torch_state_dict(sd, config)
