"""Model registry: every model family of the reference, by name.

Mirrors the model-name dispatch in training/train.py:173-189 ('R1'/'R2'/
'R3'/'light_knn') and extends it with the baseline families from the
reference model zoo (SURVEY.md §2.1 C5, C7) plus the stretch ViT backbone
(BASELINE.json configs[4]).
"""

from __future__ import annotations

from typing import Any

from relpose_gnn_tpu.models.atloc import (AtLoc, AtLocPlus, MapNet,
                                           PoseNet, PoseNetNoLog)
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig


def build_model(name: str, num_nodes: int = 8, knn: int = 4,
                droprate: float = 0.5, gnn_recursion: int = 2,
                dtype: Any = None, **overrides):
    """Instantiate a model by reference-compatible name.

    Graph models ('R1'|'light_knn', 'R2', 'R3', 'R3-vit', 'R3-32') take
    [B, N, H, W, 3] graph batches; baselines ('posenet', 'atloc') take
    [B, H, W, 3]; sequence baselines ('mapnet', 'atloc+') take
    [B, T, H, W, 3].
    """
    name = name.lower()
    if name in ("r1", "light_knn"):
        cfg = RelPoseGNNConfig.preset("R1", num_nodes=num_nodes, knn=knn,
                                      droprate=droprate,
                                      gnn_recursion=gnn_recursion,
                                      dtype=dtype, **overrides)
        return RelPoseGNN(cfg)
    if name == "r2":
        cfg = RelPoseGNNConfig.preset("R2", num_nodes=num_nodes, knn=knn,
                                      droprate=droprate,
                                      gnn_recursion=gnn_recursion,
                                      dtype=dtype, **overrides)
        return RelPoseGNN(cfg)
    if name == "r3":
        cfg = RelPoseGNNConfig.preset("R3", num_nodes=num_nodes, knn=knn,
                                      droprate=droprate,
                                      gnn_recursion=gnn_recursion,
                                      dtype=dtype, **overrides)
        return RelPoseGNN(cfg)
    if name == "r3-vit":
        # stretch: ViT-B/16 node encoder
        cfg = RelPoseGNNConfig.preset("R3", num_nodes=num_nodes, knn=knn,
                                      droprate=droprate,
                                      gnn_recursion=gnn_recursion,
                                      backbone="vit", dtype=dtype,
                                      **overrides)
        return RelPoseGNN(cfg)
    if name == "r3-32":
        # stretch: 32-node graphs (dense [32, 32] attention still trivial)
        cfg = RelPoseGNNConfig.preset("R3", num_nodes=32, knn=knn,
                                      droprate=droprate,
                                      gnn_recursion=gnn_recursion,
                                      dtype=dtype, **overrides)
        return RelPoseGNN(cfg)
    if name in ("posenetx", "x"):
        from relpose_gnn_tpu.models.legacy import PoseNetX
        return PoseNetX(droprate=droprate, dtype=dtype, use_gnn=True,
                        **overrides)
    if name in ("posenetx2", "x2"):
        from relpose_gnn_tpu.models.legacy import PoseNetX2
        return PoseNetX2(droprate=droprate, dtype=dtype, use_gnn=True,
                         **overrides)
    if name in ("posenetx-light", "light"):
        from relpose_gnn_tpu.models.legacy import PoseNetXLight
        return PoseNetXLight(droprate=droprate, dtype=dtype, use_gnn=True,
                             **overrides)
    if name in ("posenetxox", "xox"):
        from relpose_gnn_tpu.models.legacy import PoseNetXOX
        return PoseNetXOX(droprate=droprate, dtype=dtype, use_gnn=True,
                          **overrides)
    if name in ("posenetx-r4", "r4"):
        from relpose_gnn_tpu.models.legacy import PoseNetXR4
        return PoseNetXR4(droprate=droprate, dtype=dtype, use_gnn=True,
                          **overrides)
    if name in ("posenetx3", "x3"):
        from relpose_gnn_tpu.models.pair_encoder import RelPoseGNNPairEncoder
        return RelPoseGNNPairEncoder(droprate=droprate, dtype=dtype,
                                     **overrides)
    if name == "posenet":
        return PoseNet(droprate=droprate, dtype=dtype, **overrides)
    if name in ("posenet-nolog", "posenet_nolog"):
        return PoseNetNoLog(droprate=droprate, dtype=dtype, **overrides)
    if name == "mapnet":
        return MapNet(droprate=droprate, dtype=dtype, **overrides)
    if name == "atloc":
        return AtLoc(droprate=droprate, dtype=dtype, **overrides)
    if name == "atloc-lstm":
        return AtLoc(droprate=droprate, lstm=True, dtype=dtype, **overrides)
    if name in ("atloc+", "atlocplus"):
        return AtLocPlus(droprate=droprate, dtype=dtype, **overrides)
    raise ValueError(f"unknown model {name!r}")


MODEL_NAMES = ("R1", "light_knn", "R2", "R3", "R3-vit", "R3-32",
               "posenetx", "posenetx2", "posenetx3", "posenetx-light",
               "posenetxox", "posenetx-r4",
               "posenet", "posenet-nolog",
               "mapnet", "atloc", "atloc-lstm", "atloc+")
