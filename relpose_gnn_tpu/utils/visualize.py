"""Trajectory visualization (matplotlib, Agg backend).

Equivalent of the reference's `visulize` helper
(datasets/seven_scenes.py:177-202): scatter predicted vs target camera
positions (3D for 7-Scenes, 2D for Cambridge) with connecting segments;
saves to a file instead of blocking on a window.
"""

from __future__ import annotations

import numpy as np


def plot_trajectories(pred_poses: np.ndarray, targ_poses: np.ndarray,
                      out_path: str, three_d: bool = True,
                      freq: int = 1000) -> str:
    """pred/targ [L, >=3] pose arrays (translations in the first 3 dims)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    stride = max(1, len(pred_poses) // freq)
    p = np.asarray(pred_poses)[::stride, :3]
    t = np.asarray(targ_poses)[::stride, :3]

    fig = plt.figure(figsize=(8, 8))
    if three_d:
        ax = fig.add_subplot(111, projection="3d")
        for a, b in zip(p, t):
            ax.plot([a[0], b[0]], [a[1], b[1]], zs=[a[2], b[2]], c="b",
                    linewidth=0.5)
        ax.scatter(p[:, 0], p[:, 1], zs=p[:, 2], c="r", s=4,
                   label="predicted")
        ax.scatter(t[:, 0], t[:, 1], zs=t[:, 2], c="g", s=4, label="target")
        ax.view_init(azim=119, elev=13)
    else:
        ax = fig.add_subplot(111)
        ax.scatter(p[:, 0], p[:, 1], c="r", s=4, label="predicted")
        ax.scatter(t[:, 0], t[:, 1], c="g", s=4, label="target")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
