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


def _proper_rotation(w: jax.Array, d: int, batch_shape) -> jax.Array:
    """SVD of the correlation matrix -> nearest proper rotation
    (det = +1 via the reference's S[2,2] = -1 correction)."""
    u, _, vt = jnp.linalg.svd(w)
    det = jnp.linalg.det(u) * jnp.linalg.det(vt)
    sign = jnp.concatenate(
        [jnp.ones(batch_shape + (d - 1,)), det[..., None]], axis=-1)
    return jnp.einsum("...ik,...k,...kj->...ij", u, sign, vt)


def _horn_scale(xc: jax.Array, yc: jax.Array) -> jax.Array:
    """Horn's symmetric scale s = sqrt(sum||yc||^2 / sum||xc||^2) —
    EXACTLY the reference's `np.sqrt(r2 / r1)` (pose_utils.py:905-910),
    which differs from Umeyama's sum(sigma)/var_x on noisy data (~4%
    at sigma=0.5 measured); parity requires Horn's form."""
    r1 = jnp.sum(xc * xc, axis=(-1, -2))
    r2 = jnp.sum(yc * yc, axis=(-1, -2))
    return jnp.sqrt(r2 / jnp.maximum(r1, 1e-12))


def align_pts(x: jax.Array, y: jax.Array, with_scale: bool = True
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Least-squares similarity transform: find (s, R, t) with
    y ~= s R x + t over point sets [..., N, D].

    Returns (s [...], R [..., D, D], t [..., D]) — Horn's closed form as
    implemented by align_3d_pts (pose_utils.py:877-923): rotation from
    the SVD of the correlation matrix with the det=+1 correction, scale
    from the symmetric radii ratio (see _horn_scale).  The reference
    parameterizes the transform as s*R*(x - t_ref) = y; this returns the
    equivalent y = s R x + t form.
    """
    xc, mx = _center(x)
    yc, my = _center(y)
    cov = jnp.einsum("...ni,...nj->...ij", yc, xc)
    R = _proper_rotation(cov, x.shape[-1], x.shape[:-2])
    if with_scale:
        s = _horn_scale(xc, yc)
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
                       with_scale: bool = True,
                       use_rotation_constraint: bool = True):
    """Align a predicted camera trajectory to ground truth
    (pose_utils.py:1062-1146): similarity transform fit on the camera
    centers, applied to both positions and orientations.

    `use_rotation_constraint` (reference default True): the orientation
    columns' outer products are ADDED to the correlation matrix before
    the SVD (pose_utils.py:1126-1133, sum_i R2_i R1_i^T), which pins the
    rotation when the camera centers are degenerate (e.g. a straight-line
    trajectory leaves the rotation about the path axis unconstrained by
    centers alone).  False reduces to align_pts on the centers.

    Inputs: t [N, 3], q [N, 4] (w, x, y, z) camera-to-world.
    Returns (t_aligned, q_aligned, (s, R, t_align)).
    """
    if use_rotation_constraint:
        xc, mx = _center(t_pred)
        yc, my = _center(t_gt)
        w = jnp.einsum("...ni,...nj->...ij", yc, xc)
        r1 = pose_ops.quat2mat(q_pred)              # [N, 3, 3]
        r2 = pose_ops.quat2mat(q_gt)
        # sum_i sum_c outer(R2_i[:, c], R1_i[:, c]) == sum_i R2_i R1_i^T
        w = w + jnp.sum(jnp.einsum("...nij,...nkj->...nik", r2, r1),
                        axis=-3)
        R = _proper_rotation(w, 3, t_pred.shape[:-2])
        s = (_horn_scale(xc, yc) if with_scale
             else jnp.ones(t_pred.shape[:-2]))
        t_align = (my[..., 0, :]
                   - s[..., None] * jnp.einsum("...ij,...j->...i", R,
                                               mx[..., 0, :]))
    else:
        s, R, t_align = align_pts(t_pred, t_gt, with_scale=with_scale)
    t_new = apply_similarity(s, R, t_align, t_pred)
    q_align = pose_ops.mat2quat(R)
    q_new = pose_ops.qmult(jnp.broadcast_to(q_align, q_pred.shape), q_pred)
    return t_new, q_new, (s, R, t_align)
