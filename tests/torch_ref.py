"""Helpers to build torch reference modules and copy their weights into our
pytrees, for golden-value parity tests (torch CPU is the oracle for the
reference's semantics; we never import code from /root/reference)."""
import numpy as np
import jax.numpy as jnp


def j2t(x):
    import torch

    return torch.from_numpy(np.asarray(x).copy())


def t2j(x):
    return jnp.asarray(x.detach().cpu().numpy())


def linear_params_from_torch(mod):
    return {"kernel": t2j(mod.weight).T, "bias": t2j(mod.bias)}


def ln_params_from_torch(mod):
    return {"scale": t2j(mod.weight), "bias": t2j(mod.bias)}


def mha_params_from_torch(mod):
    return {
        "in_proj_kernel": t2j(mod.in_proj_weight).T,
        "in_proj_bias": t2j(mod.in_proj_bias),
        "out_proj": {
            "kernel": t2j(mod.out_proj.weight).T,
            "bias": t2j(mod.out_proj.bias),
        },
    }


def decoder_layer_params_from_torch(mod):
    return {
        "self_attn": mha_params_from_torch(mod.self_attn),
        "cross_attn": mha_params_from_torch(mod.multihead_attn),
        "linear1": linear_params_from_torch(mod.linear1),
        "linear2": linear_params_from_torch(mod.linear2),
        "norm1": ln_params_from_torch(mod.norm1),
        "norm2": ln_params_from_torch(mod.norm2),
        "norm3": ln_params_from_torch(mod.norm3),
    }


def decoder_params_from_torch(mod):
    return {"layers": [decoder_layer_params_from_torch(l) for l in mod.layers]}


def encoder_layer_params_from_torch(mod):
    return {
        "self_attn": mha_params_from_torch(mod.self_attn),
        "linear1": linear_params_from_torch(mod.linear1),
        "linear2": linear_params_from_torch(mod.linear2),
        "norm1": ln_params_from_torch(mod.norm1),
        "norm2": ln_params_from_torch(mod.norm2),
    }


def encoder_params_from_torch(mod):
    return {"layers": [encoder_layer_params_from_torch(l) for l in mod.layers]}
