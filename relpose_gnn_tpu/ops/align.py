"""Point-set and camera-trajectory alignment (Horn / Umeyama).

JAX re-implementation of the alignment utilities in
`utils/pose_utils.py:877-1146`: similarity alignment of 3-D point sets
(`align_3d_pts`), the no-scale variant, 2-D alignment, and full camera-pose
trajectory alignment.  All closed-form via SVD, batched and jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops import pose as pose_ops


def _center(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    mu = jnp.mean(x, axis=-2, keepdims=True)
    return x - mu, mu


def align_pts(x: jax.Array, y: jax.Array, with_scale: bool = True
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Least-squares similarity transform: find (s, R, t) minimizing
    ||s R x + t - y||^2 over point sets [..., N, D].

    Returns (s [...], R [..., D, D], t [..., D]) — the Horn/Umeyama
    closed-form used by align_3d_pts (pose_utils.py:877-935) with the
    proper-rotation (det = +1) correction.
    """
    xc, mx = _center(x)
    yc, my = _center(y)
    cov = jnp.einsum("...ni,...nj->...ij", yc, xc) / x.shape[-2]
    u, s_vals, vt = jnp.linalg.svd(cov)
    d = x.shape[-1]
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    sign = jnp.concatenate(
        [jnp.ones(x.shape[:-2] + (d - 1,)), det[..., None]], axis=-1)
    R = jnp.einsum("...ik,...k,...kj->...ij", u, sign, vt)
    var_x = jnp.mean(jnp.sum(xc * xc, axis=-1), axis=-1)
    if with_scale:
        s = jnp.sum(s_vals * sign, axis=-1) / jnp.maximum(var_x, 1e-12)
    else:
        s = jnp.ones(x.shape[:-2])
    t = my[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R,
                                                  mx[..., 0, :])
    return s, R, t


def align_3d_pts(x: jax.Array, y: jax.Array):
    """3-D similarity alignment (pose_utils.py:877-935 semantics)."""
    return align_pts(x, y, with_scale=True)


def align_3d_pts_noscale(x: jax.Array, y: jax.Array):
    """Rigid (no-scale) variant (pose_utils.py:938-...)."""
    return align_pts(x, y, with_scale=False)


def align_2d_pts(x: jax.Array, y: jax.Array):
    """2-D similarity alignment (pose_utils.py:1010-...)."""
    return align_pts(x, y, with_scale=True)


def apply_similarity(s, R, t, x: jax.Array) -> jax.Array:
    """y = s R x + t, batched over points."""
    return (s[..., None, None]
            * jnp.einsum("...ij,...nj->...ni", R, x) + t[..., None, :])


def align_camera_poses(t_pred: jax.Array, q_pred: jax.Array,
                       t_gt: jax.Array, q_gt: jax.Array,
                       with_scale: bool = True):
    """Align a predicted camera trajectory to ground truth
    (pose_utils.py:1080-1146): similarity transform fit on the camera
    centers, applied to both positions and orientations.

    Inputs: t [N, 3], q [N, 4] (w, x, y, z).
    Returns (t_aligned, q_aligned, (s, R, t_align)).
    """
    s, R, t_align = align_pts(t_pred, t_gt, with_scale=with_scale)
    t_new = apply_similarity(s, R, t_align, t_pred)
    q_align = pose_ops.mat2quat(R)
    q_new = pose_ops.qmult(jnp.broadcast_to(q_align, q_pred.shape), q_pred)
    return t_new, q_new, (s, R, t_align)
