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


def space_to_depth_conv1(conv1: dict) -> dict:
    """Transform a 7x7/s2 stem conv into its space-to-depth form.

    Checkpoint-equivalent weight transform (no retraining): zero-pad the
    kernel 7->8 on the leading spatial taps (output pixel o samples input
    rows 2o-3..2o+3; the 8-tap window 2o-4..2o+3 starts on an even pixel,
    with tap 0 always multiplied by zero), then regroup each 2x2 pixel
    block into channels:

        K_s2d[ki, kj, dy*2*C + dx*C + c, o] = K8[2*ki + dy, 2*kj + dx, c, o]

    The matching input packing + asymmetric (2,1) padding live in
    ResNet.__call__ (s2d_stem=True).  Bias (if present) is unchanged.
    Exactness is asserted by tests/test_fold_bn.py (f32, both parities of
    the input extent).

    Measured (TPU v5e, bf16, 256x341, salted chained-accumulator
    protocol — benchmarks/bench_s2d.py):

      standalone folded-ResNet34 forward:
        batch  64:  9.37 ms (7x7)  vs  9.77 ms (s2d)  -> 0.96x
        batch 128: 14.15 ms        vs 13.83 ms        -> 1.02x
        batch 256: 32.38 ms        vs 28.30 ms        -> 1.14x
      composed serving step (bench.py end-to-end):
        batch 256: 6926 q/s (7x7)  vs  6620 q/s (s2d)  -> 0.96x
        batch 512: 7094 q/s (7x7)  vs  6692 q/s (s2d)  -> 0.94x

    The standalone win does NOT survive composition with the GNN stage —
    XLA schedules the fused program differently around the packing
    transpose — so serving defaults to the plain stem and this transform
    stays available as an A/B knob (bench.py --s2d,
    RelocalizationService(s2d_stem=True))."""
    k = np.asarray(conv1["kernel"], np.float32)
    assert k.shape[:2] == (7, 7), k.shape
    c_in, c_out = k.shape[2], k.shape[3]
    k8 = np.zeros((8, 8, c_in, c_out), np.float32)
    k8[1:, 1:] = k
    ks = k8.reshape(4, 2, 4, 2, c_in, c_out).transpose(0, 2, 1, 3, 4, 5)
    ks = ks.reshape(4, 4, 4 * c_in, c_out)
    out = dict(conv1)
    out["kernel"] = jnp.asarray(ks)
    return out


def fold_relpose_backbone(model_cfg, variables: dict,
                          s2d_stem: bool = False):
    """Fold the RelPoseGNN backbone's BN for serving.

    Returns (folded_cfg, folded_variables): same model with
    `backbone`'s ResNet in folded form; GNN/head params unchanged.
    Only ResNet backbones fold (ViT has no BN).  With `s2d_stem`, conv1
    is additionally rewritten into its space-to-depth form (see
    space_to_depth_conv1) — the serving stem that keeps the MXU
    contraction dim at 12 instead of 3.
    """
    import dataclasses

    from relpose_gnn_tpu.models.posenet import RelPoseGNNConfig

    assert isinstance(model_cfg, RelPoseGNNConfig)
    assert model_cfg.backbone in ("resnet34", "resnet18"), model_cfg.backbone
    params = dict(variables["params"])
    stats = variables.get("batch_stats", {})
    enc = fold_resnet_bn(
        dict(params["encoder"]), dict(stats.get("encoder", {})))
    if s2d_stem:
        enc["conv1"] = space_to_depth_conv1(enc["conv1"])
    params["encoder"] = enc
    folded_cfg = dataclasses.replace(model_cfg, bn_folded=True,
                                     s2d_stem=s2d_stem)
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
