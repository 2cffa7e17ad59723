"""Core numerical ops: pose/quaternion algebra, dense graph ops, kernels."""

from relpose_gnn_tpu.ops import graph, pose  # noqa: F401
