"""Flax model zoo: backbones, GNN layers, relocalization heads."""

from relpose_gnn_tpu.models.attention import AttentionBlock  # noqa: F401
from relpose_gnn_tpu.models.gnn import DenseEdgeGNN  # noqa: F401
from relpose_gnn_tpu.models.posenet import RelPoseGNN  # noqa: F401
from relpose_gnn_tpu.models.resnet import ResNet34  # noqa: F401
