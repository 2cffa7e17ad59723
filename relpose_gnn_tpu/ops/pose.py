"""Quaternion / pose algebra as batched, jittable JAX ops.

Functional parity targets (reference file:line cited per function) come from
`/root/reference/python/niantic/utils/pose_utils.py`.  All functions here are
vectorized over arbitrary leading batch dimensions, are differentiable, and
contain no data-dependent Python control flow, so they compile cleanly under
`jax.jit` / `vmap` / `pjit`.

Conventions
-----------
* Quaternions are `[w, x, y, z]` (scalar first), matching the reference.
* A "pose6" is `[t(3), logq(3)]` — translation plus log-quaternion, the
  representation regressed by the network.
* A "pose7" is `[t(3), q(4)]` — translation plus unit quaternion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternion algebra (reference: pose_utils.py:17-163)
# ---------------------------------------------------------------------------

def vdot(v1: jax.Array, v2: jax.Array) -> jax.Array:
    """Row-wise dot product along the last dim (pose_utils.py:17-26)."""
    return jnp.sum(v1 * v2, axis=-1)


def normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    """L2-normalize along `axis` (pose_utils.py:29-39)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, _EPS)


def qmult(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product of two quaternion arrays, renormalized
    (pose_utils.py:42-60).  Shapes broadcast; last dim is 4."""
    q1s, q1v = q1[..., :1], q1[..., 1:]
    q2s, q2v = q2[..., :1], q2[..., 1:]
    qs = q1s * q2s - jnp.sum(q1v * q2v, axis=-1, keepdims=True)
    qv = q1v * q2s + q2v * q1s + jnp.cross(q1v, q2v)
    return normalize(jnp.concatenate([qs, qv], axis=-1))


def qinv(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion (pose_utils.py:63-70)."""
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def qexp(w: jax.Array) -> jax.Array:
    """Exponential map: log-quaternion [..., 3] -> unit quaternion [..., 4].

    Matches the numpy reference `qexp` (pose_utils.py:340-348), which uses
    `sinc` and is exact at ||w|| == 0 (identity quaternion), rather than the
    clamped torch variant `qexp_t` (pose_utils.py:73-84).

    Differentiation-safe at w == 0 (the norm's sqrt is guarded with a
    constant floor so `jacfwd` at the identity increment — the PGO
    linearization point, ops/pgo.py — stays finite).
    """
    n2 = jnp.sum(w * w, axis=-1, keepdims=True)
    small = n2 < _EPS * _EPS
    n = jnp.sqrt(jnp.maximum(n2, _EPS * _EPS))
    cos = jnp.where(small, 1.0 - 0.5 * n2, jnp.cos(n))
    # sin(n)/n with second-order Taylor in the small branch
    sinc = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(n) / n)
    return jnp.concatenate([cos, sinc * w], axis=-1)


def qlog(q: jax.Array) -> jax.Array:
    """Log map: unit quaternion [..., 4] -> log-quaternion [..., 3].

    Matches the numpy reference `qlog` (pose_utils.py:325-337): returns 0 when
    the vector part vanishes, else `arccos(q0) * v / ||v||`.
    """
    v = q[..., 1:]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(n2, _EPS * _EPS))
    ang = jnp.arccos(jnp.clip(q[..., :1], -1.0, 1.0))
    return jnp.where(n2 < _EPS * _EPS, jnp.zeros_like(v), ang * v / n)


def rotate_vec_by_q(t: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate vectors `t` by unit quaternions `q`:
    t' = t + 2*qs*(qv x t) + 2*qv x (qv x t)  (pose_utils.py:124-136)."""
    qs, qv = q[..., :1], q[..., 1:]
    b = jnp.cross(qv, t)
    c = 2.0 * jnp.cross(qv, b)
    return t + 2.0 * b * qs + c


def compose_pose_quaternion(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Compose two pose7s: apply p2 after p1 (pose_utils.py:139-151)."""
    p1t, p1q = p1[..., :3], p1[..., 3:]
    p2t, p2q = p2[..., :3], p2[..., 3:]
    q = qmult(p1q, p2q)
    t = p1t + rotate_vec_by_q(p2t, p1q)
    return jnp.concatenate([t, q], axis=-1)


def invert_pose_quaternion(p: jax.Array) -> jax.Array:
    """Invert a pose7 (pose_utils.py:154-163)."""
    t, q = p[..., :3], p[..., 3:]
    q_inv = qinv(q)
    t_inv = -rotate_vec_by_q(t, q_inv)
    return jnp.concatenate([t_inv, q_inv], axis=-1)


def calc_vo(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Relative pose of p1 expressed in the p0 frame (pose_utils.py:166-172)."""
    return compose_pose_quaternion(invert_pose_quaternion(p0), p1)


def calc_vo_logq(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """`calc_vo` on pose6 (logq) inputs/outputs (pose_utils.py:175-187)."""
    q0 = qexp(p0[..., 3:])
    q1 = qexp(p1[..., 3:])
    vo = calc_vo(jnp.concatenate([p0[..., :3], q0], axis=-1),
                 jnp.concatenate([p1[..., :3], q1], axis=-1))
    return jnp.concatenate([vo[..., :3], qlog(vo[..., 3:])], axis=-1)


def calc_vo_relative(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """World-frame relative pose (pose_utils.py:190-198)."""
    vos_t = p1[..., :3] - p0[..., :3]
    vos_q = qmult(qinv(p0[..., 3:]), p1[..., 3:])
    return jnp.concatenate([vos_t, vos_q], axis=-1)


def calc_vo_relative_logq(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """World-frame relative pose on pose6 inputs (pose_utils.py:201-213)."""
    q0 = qexp(p0[..., 3:])
    q1 = qexp(p1[..., 3:])
    vo = calc_vo_relative(jnp.concatenate([p0[..., :3], q0], axis=-1),
                          jnp.concatenate([p1[..., :3], q1], axis=-1))
    return jnp.concatenate([vo[..., :3], qlog(vo[..., 3:])], axis=-1)


def calc_vos(poses: jax.Array) -> jax.Array:
    """Consecutive geometric VO on pose6 sequences: [..., T, 6] ->
    [..., T-1, 6], each the relative pose of frame i+1 in frame i's frame,
    log-mapped (vectorized `calc_vos` / `calc_vos_safe`,
    pose_utils.py:262-304)."""
    return calc_vo_logq(poses[..., :-1, :], poses[..., 1:, :])


def calc_vos_fc(poses: jax.Array) -> jax.Array:
    """Fully-connected geometric VO on pose6 sequences.

    `poses` [..., T, 6] -> [..., T*(T-1)/2, 6]: for every i < j the relative
    pose of j in i's frame, log-mapped — the vectorized equivalent of
    `calc_vos_safe_fc` (pose_utils.py:307-321) without the per-pair Python
    loop or the numpy round-trip.
    """
    t = poses.shape[-2]
    src, dst = jnp.triu_indices(t, k=1)
    p0 = poses[..., src, :]
    p1 = poses[..., dst, :]
    return calc_vo_logq(p0, p1)


def calc_vos_simple(poses: jax.Array) -> jax.Array:
    """Consecutive-frame visual odometry as plain vector differences.

    `poses` is [..., T, D]; returns [..., T-1, D] with `p[i+1] - p[i]`
    (pose_utils.py:247-259, vectorized instead of the per-pair Python loop).
    """
    return poses[..., 1:, :] - poses[..., :-1, :]


def quaternion_angular_error(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angular error in degrees between unit quaternions, batched
    (pose_utils.py:420-431): 2*arccos(|<q1,q2>|)*180/pi."""
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    d = jnp.clip(d, -1.0, 1.0)
    return 2.0 * jnp.arccos(d) * (180.0 / jnp.pi)


def log_quaternion_angular_error(w1: jax.Array, w2: jax.Array) -> jax.Array:
    """Angular error between two log-quaternions (pose_utils.py:416-417)."""
    return quaternion_angular_error(qexp(w1), qexp(w2))


# ---------------------------------------------------------------------------
# Rotation-matrix <-> quaternion (host + device)
# ---------------------------------------------------------------------------

def mat2quat(R: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w,x,y,z).

    Shepperd's branchless method: compute all four candidate quadruples and
    select the numerically best by the largest diagonal term. Vectorized and
    jittable (no data-dependent branching — uses where-selects).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its pivot is the largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS * _EPS))

    s_w = safe_sqrt(1.0 + tr)              # pivot w
    q_w = jnp.stack([0.5 * s_w,
                     0.5 * (m21 - m12) / s_w,
                     0.5 * (m02 - m20) / s_w,
                     0.5 * (m10 - m01) / s_w], axis=-1)

    s_x = safe_sqrt(1.0 + m00 - m11 - m22)  # pivot x
    q_x = jnp.stack([0.5 * (m21 - m12) / s_x,
                     0.5 * s_x,
                     0.5 * (m01 + m10) / s_x,
                     0.5 * (m02 + m20) / s_x], axis=-1)

    s_y = safe_sqrt(1.0 - m00 + m11 - m22)  # pivot y
    q_y = jnp.stack([0.5 * (m02 - m20) / s_y,
                     0.5 * (m01 + m10) / s_y,
                     0.5 * s_y,
                     0.5 * (m12 + m21) / s_y], axis=-1)

    s_z = safe_sqrt(1.0 - m00 - m11 + m22)  # pivot z
    q_z = jnp.stack([0.5 * (m10 - m01) / s_z,
                     0.5 * (m02 + m20) / s_z,
                     0.5 * (m12 + m21) / s_z,
                     0.5 * s_z], axis=-1)

    # Pick the candidate with the largest pivot.
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)[..., None]
    q = jnp.where(best == 0, q_w,
                  jnp.where(best == 1, q_x,
                            jnp.where(best == 2, q_y, q_z)))
    return normalize(q)


def quat2mat(q: jax.Array) -> jax.Array:
    """Unit quaternion [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# Host-side pose preprocessing (numpy; runs in the input pipeline)
# ---------------------------------------------------------------------------

def process_poses(poses_in: np.ndarray, mean_t: np.ndarray, std_t: np.ndarray,
                  align_R: np.ndarray, align_t: np.ndarray,
                  align_s: float, sign_zero_quirk: bool = False
                  ) -> np.ndarray:
    """Raw Nx12 row-major [R|t] poses -> Nx6 [t, logq], aligned + normalized.

    Numpy port of the reference preprocessing (pose_utils.py:351-378):
    translation from columns (3, 7, 11), rotation aligned by `align_R`,
    quaternion constrained to the w>=0 hemisphere, log-mapped; translation
    aligned, scaled, then mean/std-normalized.  Vectorized via the jitted
    `mat2quat` above instead of the per-row Python loop.

    Quirk (flagged per the repo convention): the reference hemisphere
    constraint is `q *= np.sign(q[0])` (pose_utils.py:366), which ZEROES
    the quaternion when w == 0 exactly (a 180-degree rotation) and maps it
    to logq = 0 (identity).  Default keeps the true pi*axis log map
    (safer); pass `sign_zero_quirk=True` to replicate the reference
    byte-for-byte on such frames.
    """
    poses_in = np.asarray(poses_in, dtype=np.float64)
    n = len(poses_in)
    t = poses_in[:, [3, 7, 11]]
    R = poses_in.reshape(n, 3, 4)[:, :3, :3]
    q = np.asarray(mat2quat(jnp.asarray(align_R[None] @ R)))
    if sign_zero_quirk:
        q = q * np.sign(q[:, :1])  # reference: q -> 0 when w == 0
    else:
        q = q * np.where(q[:, :1] >= 0, 1.0, -1.0)
    logq = np.asarray(qlog(jnp.asarray(q)))
    t = (t - align_t) @ align_R.T * align_s
    t = (t - mean_t) / std_t
    return np.concatenate([t, logq], axis=1).astype(np.float64)


def process_poses_cambridge(pose_4x4: np.ndarray) -> np.ndarray:
    """4x4 pose -> 6-dof [t, logq] (pose_utils.py:381-396)."""
    R = np.asarray(pose_4x4)[:3, :3]
    t = np.asarray(pose_4x4)[:3, -1]
    q = np.asarray(mat2quat(jnp.asarray(R[None])))[0]
    if q[0] < 0:
        q = -q
    logq = np.asarray(qlog(jnp.asarray(q[None])))[0]
    return np.concatenate([t, logq])


def process_poses_cambridge_norod(pose_7: np.ndarray) -> np.ndarray:
    """[t(3), q(4)] -> [t(3), logq(3)] (pose_utils.py:399-413)."""
    pose_7 = np.asarray(pose_7, dtype=np.float64)
    t, q = pose_7[:3], pose_7[3:].copy()
    if q[0] < 0:
        q = -q
    logq = np.asarray(qlog(jnp.asarray(q[None])))[0]
    return np.concatenate([t, logq])
