"""PyTorch checkpoint -> Flax parameter conversion.

Converts the reference's released checkpoints into our parameter trees:
  * full model checkpoints `epoch_NNN.pth.tar` with a `model_state_dict`
    saved by utils/utils.py:22-31 (PoseNetX_R2/R3 + ResNet34 backbone);
  * torchvision `resnet34` state dicts (backbone warm start);
  * the NetVLAD retrieval checkpoint `netvlad_vgg16.tar`
    (vlad_encoder.py:31-33 layout: `encoder.N.*` + `pool.*`).

Layout rules:
  conv   torch [O, I, kH, kW]  ->  flax kernel [kH, kW, I, O]
  linear torch [O, I]          ->  flax kernel [I, O]
  batchnorm weight/bias        ->  scale/bias (params);
            running_mean/var   ->  mean/var (batch_stats)

Works on plain dicts of numpy arrays, so torch is only required when reading
an actual `.pth.tar` file.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_kernel(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    return _np(w).T


def load_torch_state_dict(path: str) -> dict:
    """Read a .pth/.pth.tar file into {name: np.ndarray}; unwraps the
    `model_state_dict` / `state_dict` containers the reference uses."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model_state_dict", "state_dict"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    return {k: _np(v) for k, v in obj.items()}


# ---------------------------------------------------------------------------
# ResNet backbone
# ---------------------------------------------------------------------------

def _bn(sd: Mapping, prefix: str):
    params = {"scale": _np(sd[f"{prefix}.weight"]),
              "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def convert_resnet(sd: Mapping, stage_sizes=(3, 4, 6, 3),
                   prefix: str = "") -> tuple[dict, dict]:
    """torchvision resnet state dict -> (params, batch_stats) for
    models.resnet.ResNet.  `prefix` strips e.g. 'feature_extractor.'."""
    def g(name):
        return sd[prefix + name]

    params: dict = {"conv1": {"kernel": conv_kernel(g("conv1.weight"))}}
    stats: dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, prefix + "bn1")

    for stage, num_blocks in enumerate(stage_sizes):
        for block in range(num_blocks):
            t = f"layer{stage + 1}.{block}"
            f = f"layer{stage + 1}_{block}"
            p: dict = {
                "conv1": {"kernel": conv_kernel(g(f"{t}.conv1.weight"))},
                "conv2": {"kernel": conv_kernel(g(f"{t}.conv2.weight"))},
            }
            s: dict = {}
            p["bn1"], s["bn1"] = _bn(sd, prefix + f"{t}.bn1")
            p["bn2"], s["bn2"] = _bn(sd, prefix + f"{t}.bn2")
            if prefix + f"{t}.downsample.0.weight" in sd:
                p["downsample_conv"] = {
                    "kernel": conv_kernel(g(f"{t}.downsample.0.weight"))}
                p["downsample_bn"], s["downsample_bn"] = _bn(
                    sd, prefix + f"{t}.downsample.1")
            params[f] = p
            stats[f] = s

    if prefix + "fc.weight" in sd:
        params["fc"] = {"kernel": linear_kernel(g("fc.weight")),
                        "bias": _np(g("fc.bias"))}
    return params, stats


# ---------------------------------------------------------------------------
# Full RelPoseGNN model checkpoints
# ---------------------------------------------------------------------------

def _linear(sd: Mapping, name: str) -> dict:
    return {"kernel": linear_kernel(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def _mlp2(sd: Mapping, name: str) -> dict:
    """torch Seq(Linear, ReLU, Linear) -> MLP2 {fc1, fc2}
    (my_gnn_layer.py:280-286 naming: `.0` and `.2`)."""
    return {"fc1": _linear(sd, f"{name}.0"), "fc2": _linear(sd, f"{name}.2")}


def _attention(sd: Mapping, name: str) -> dict:
    return {k: _linear(sd, f"{name}.{k}") for k in ("g", "theta", "phi", "W")}


def _gnn_layer(sd: Mapping, name: str) -> dict:
    out = {"edge_mlp": _mlp2(sd, f"{name}.edge_model.edge_mlp"),
           "msg_mlp": _mlp2(sd, f"{name}.mlp"),
           "upd_mlp": _mlp2(sd, f"{name}.mlp_updating")}
    if f"{name}.att.g.weight" in sd:
        out["att"] = _attention(sd, f"{name}.att")
    return out


def convert_relpose_gnn(sd: Mapping, stage_sizes=(3, 4, 6, 3)
                        ) -> tuple[dict, dict]:
    """PoseNetX_R2/R3/LIGHT_KNN state dict -> (params, batch_stats)."""
    enc_params, enc_stats = convert_resnet(sd, stage_sizes,
                                           prefix="feature_extractor.")
    params = {"encoder": enc_params,
              "proj_edge": _linear(sd, "proj_edge")}
    for i in (1, 2, 3, 4):
        if f"gnn{i}.mlp.0.weight" in sd:
            params[f"gnn{i}"] = _gnn_layer(sd, f"gnn{i}")
    for head in ("fc_xyz", "fc_wpqr", "fc_xyz_R", "fc_wpqr_R"):
        if f"{head}.weight" in sd:
            params[head] = _linear(sd, head)
    if "att.g.weight" in sd:
        params["att"] = _attention(sd, "att")
    return params, {"encoder": enc_stats}


def convert_criterion(sd: Mapping) -> dict:
    """criterion_state_dict {sax, saq} (utils/utils.py:27-30)."""
    return {"sax": float(_np(sd["sax"]).reshape(())),
            "saq": float(_np(sd["saq"]).reshape(()))}


# ---------------------------------------------------------------------------
# NetVLAD (VGG16 + pool) checkpoints
# ---------------------------------------------------------------------------

# torchvision vgg16.features conv layer indices (cfg D)
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_netvlad(sd: Mapping) -> dict:
    """netvlad_vgg16.tar layout -> NetVLADEncoder params."""
    encoder = {}
    for j, torch_idx in enumerate(_VGG16_CONV_IDX):
        encoder[f"conv{j}"] = {
            "kernel": conv_kernel(sd[f"encoder.{torch_idx}.weight"]),
            "bias": _np(sd[f"encoder.{torch_idx}.bias"])}
    pool = {"centroids": _np(sd["pool.centroids"]),
            "assign_conv": {
                "kernel": conv_kernel(sd["pool.conv.weight"])}}
    if "pool.conv.bias" in sd:
        pool["assign_conv"]["bias"] = _np(sd["pool.conv.bias"])
    return {"encoder": encoder, "pool": pool}
