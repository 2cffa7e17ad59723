"""Relocalization evaluation and serving."""

from relpose_gnn_tpu.evaluation.evaluator import (  # noqa: F401
    PoseErrors, compute_pose_errors, evaluate_dataset, save_poses)
from relpose_gnn_tpu.evaluation import serving, service  # noqa: F401
