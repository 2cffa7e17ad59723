"""Relocalization evaluation."""

from relpose_gnn_tpu.evaluation.evaluator import (  # noqa: F401
    PoseErrors, compute_pose_errors, evaluate_dataset, save_poses)
