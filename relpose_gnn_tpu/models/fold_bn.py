"""Inference-time BatchNorm folding for the ResNet trunk.

Serving optimization: at eval, BN with running statistics is an affine map
per channel, so it folds into the preceding conv —

    W' = W * scale / sqrt(var + eps)      (per output channel)
    b' = bias_bn - scale * mean / sqrt(var + eps)

removing every BN elementwise pass from the serving graph.  The folded
trunk is `ResNet(..., folded=True)` (convs carry biases, no BN modules);
outputs match the unfolded eval path to float32 round-off (tested).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_EPS = 1e-5

_BN_FOR_CONV = {"conv1": "bn1", "conv2": "bn2",
                "downsample_conv": "downsample_bn"}


def _fold_one(conv_params: dict, bn_params: dict, bn_stats: dict) -> dict:
    scale = jnp.asarray(bn_params["scale"], jnp.float32)
    bias = jnp.asarray(bn_params["bias"], jnp.float32)
    mean = jnp.asarray(bn_stats["mean"], jnp.float32)
    var = jnp.asarray(bn_stats["var"], jnp.float32)
    g = scale / jnp.sqrt(var + _EPS)
    kernel = jnp.asarray(conv_params["kernel"], jnp.float32) * g
    new_bias = bias - mean * g
    if "bias" in conv_params:
        new_bias = new_bias + jnp.asarray(conv_params["bias"]) * g
    return {"kernel": kernel, "bias": new_bias}


def fold_resnet_bn(params: dict, batch_stats: dict) -> dict:
    """(params, batch_stats) of an unfolded ResNet -> params for
    ResNet(folded=True).  Non-conv entries (fc) pass through."""
    out: dict = {}
    for name, p in params.items():
        if name == "conv1":
            out[name] = _fold_one(p, params["bn1"], batch_stats["bn1"])
        elif name.startswith("bn"):
            continue
        elif name.startswith("layer"):
            block_out = {}
            for sub, sp in p.items():
                if sub.startswith("bn") or sub == "downsample_bn":
                    continue
                bn_name = _BN_FOR_CONV.get(sub)
                if bn_name and bn_name in p:
                    block_out[sub] = _fold_one(sp, p[bn_name],
                                               batch_stats[name][bn_name])
                else:
                    block_out[sub] = sp
            out[name] = block_out
        else:
            out[name] = p
    return out


def fold_relpose_backbone(model_cfg, variables: dict):
    """Fold the RelPoseGNN backbone's BN for serving.

    Returns (folded_cfg, folded_variables): same model with
    `backbone`'s ResNet in folded form; GNN/head params unchanged.
    Only ResNet backbones fold (ViT has no BN).
    """
    import dataclasses

    from relpose_gnn_tpu.models.posenet import RelPoseGNNConfig

    assert isinstance(model_cfg, RelPoseGNNConfig)
    assert model_cfg.backbone in ("resnet34", "resnet18"), model_cfg.backbone
    params = dict(variables["params"])
    stats = variables.get("batch_stats", {})
    params["encoder"] = fold_resnet_bn(
        dict(params["encoder"]), dict(stats.get("encoder", {})))
    folded_cfg = dataclasses.replace(model_cfg, bn_folded=True)
    return folded_cfg, {"params": params, "batch_stats": {}}


def count_bn_layers(params: dict) -> int:
    """Diagnostic: number of BN parameter groups in a ResNet tree."""
    n = 0
    for name, p in params.items():
        if name.startswith("bn"):
            n += 1
        elif isinstance(p, dict):
            n += sum(1 for k in p if "bn" in k)
    return n
