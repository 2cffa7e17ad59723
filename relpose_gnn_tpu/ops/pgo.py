"""Pose-graph optimization: Gauss-Newton on the SE(3) manifold, in JAX.

Functional equivalent of the reference PGO (utils/pose_utils.py:526-874):
state = N pose7s [t, q]; unary constraints pull each node toward its
predicted pose, pairwise constraints enforce relative-pose (VO) measurements
on consecutive edges (`PoseGraph`, :526-679) or all pairs (`PoseGraphFC`,
:682-840); updates are applied through the quaternion exponential map
(:618-641).

TPU-native redesign: instead of porting the analytic Jacobian blocks
(skew/dpq_q/dpsq_q/... at :434-523), the Jacobian of the residual w.r.t. the
6-dof manifold increment is obtained with `jax.jacfwd` at the identity
increment — exact, and the whole Gauss-Newton iteration jits into one XLA
program (batched linear algebra on the MXU).

Residual definitions mirror :577-616:
    unary:     (z_i - pose_i) / sqrt(s)                     (t and q parts)
    pairwise:  R(q_i)^-1 (t_j - t_i) - vo_t                 / sqrt(srx)
               (q_i^-1 * q_j) - vo_q  (plain 4-vector diff) / sqrt(srq)
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops import pose as pose_ops


def _retract(z: jax.Array, delta: jax.Array) -> jax.Array:
    """Apply a [N, 6] manifold increment to [N, 7] poses
    (pose_utils.py:618-641): additive on t, right-multiplied exp map on q."""
    t = z[:, :3] + delta[:, :3]
    dq = pose_ops.qexp(delta[:, 3:])
    q = pose_ops.qmult(z[:, 3:], dq)
    return jnp.concatenate([t, q], axis=1)


def _residuals(z: jax.Array, poses: jax.Array, vos: jax.Array,
               src: jax.Array, dst: jax.Array,
               w_ax: float, w_aq: float, w_rx: float, w_rq: float
               ) -> jax.Array:
    """Stacked weighted residual vector."""
    # unary (pose_utils.py:590-596)
    r_abs = (z - poses) * jnp.asarray([w_ax] * 3 + [w_aq] * 4)
    # pairwise (pose_utils.py:598-614)
    ti, tj = z[src, :3], z[dst, :3]
    qi, qj = z[src, 3:], z[dst, 3:]
    rt = pose_ops.rotate_vec_by_q(tj - ti, pose_ops.qinv(qi)) - vos[:, :3]
    rq = pose_ops.qmult(pose_ops.qinv(qi), qj) - vos[:, 3:]
    return jnp.concatenate([r_abs.reshape(-1),
                            (w_rx * rt).reshape(-1),
                            (w_rq * rq).reshape(-1)])


@partial(jax.jit, static_argnames=("n_iters",))
def _optimize(z0, poses, vos, src, dst, weights, n_iters: int,
              damping: float):
    w_ax, w_aq, w_rx, w_rq = weights

    def res_of_delta(delta, z):
        return _residuals(_retract(z, delta), poses, vos, src, dst,
                          w_ax, w_aq, w_rx, w_rq)

    def step(z, _):
        delta0 = jnp.zeros((z.shape[0], 6))
        J = jax.jacfwd(res_of_delta)(delta0, z)        # [R, N, 6]
        J = J.reshape(J.shape[0], -1)                  # [R, 6N]
        r = res_of_delta(delta0, z)
        H = J.T @ J + damping * jnp.eye(J.shape[1])
        b = J.T @ r
        dx = -jnp.linalg.solve(H, b).reshape(-1, 6)
        return _retract(z, dx), None

    z, _ = jax.lax.scan(step, z0, None, length=n_iters)
    return z


def chain_edges(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Consecutive edges (PoseGraph, :552)."""
    return np.arange(n - 1), np.arange(1, n)


def fc_edges(n: int) -> tuple[np.ndarray, np.ndarray]:
    """All i < j pairs (PoseGraphFC, :735-763 iterates i, j>i)."""
    src, dst = np.triu_indices(n, k=1)
    return src, dst


def optimize_pose_graph(pred_poses: np.ndarray, vos: np.ndarray,
                        fc: bool = False, sax: float = 1.0, saq: float = 1.0,
                        srx: float = 1.0, srq: float = 1.0,
                        n_iters: int = 10,
                        damping: float = 1e-9) -> np.ndarray:
    """Run PGO initialized at `pred_poses` [N, 7] with VO measurements
    `vos` [E, 7] (E = N-1 chain or NC2 fully connected).

    Weights are 1/sqrt(sigma) like the reference's Cholesky-of-information
    construction (pose_utils.py:659-663).
    """
    pred_poses = np.asarray(pred_poses, np.float32)
    n = len(pred_poses)
    src, dst = fc_edges(n) if fc else chain_edges(n)
    assert len(vos) == len(src), (len(vos), len(src))
    weights = (1.0 / np.sqrt(sax), 1.0 / np.sqrt(saq),
               1.0 / np.sqrt(srx), 1.0 / np.sqrt(srq))
    out = _optimize(jnp.asarray(pred_poses), jnp.asarray(pred_poses),
                    jnp.asarray(vos, jnp.float32), jnp.asarray(src),
                    jnp.asarray(dst), weights, n_iters, damping)
    return np.asarray(out)


def vos_from_target_poses(target_poses: np.ndarray,
                          rotate_frame: bool = False) -> np.ndarray:
    """Consecutive VO measurements from ground-truth poses.

    With `rotate_frame=False` this matches the reference driver
    (pose_utils.py:862-869): *world-frame* translation difference + relative
    quaternion.  NOTE this is inconsistent with the residual definition,
    which rotates the translation difference into the source frame
    (pose_utils.py:601-604) — a quirk of the reference reproduced here for
    parity.  `rotate_frame=True` produces residual-consistent measurements
    (ground-truth poses become an exact fixed point of the optimization).
    """
    t = np.asarray(target_poses)
    q0 = jnp.asarray(t[:-1, 3:])
    q1 = jnp.asarray(t[1:, 3:])
    dt = jnp.asarray(t[1:, :3] - t[:-1, :3])
    if rotate_frame:
        vos_t = np.asarray(pose_ops.rotate_vec_by_q(dt, pose_ops.qinv(q0)))
    else:
        vos_t = np.asarray(dt)
    vos_q = np.asarray(pose_ops.qmult(pose_ops.qinv(q0), q1))
    return np.concatenate([vos_t, vos_q], axis=1)


def optimize_poses(pred_poses: np.ndarray, vos: np.ndarray | None = None,
                   fc_vos: bool = False,
                   target_poses: np.ndarray | None = None,
                   sax: float = 1, saq: float = 1, srx: float = 1,
                   srq: float = 1, n_iters: int = 10) -> np.ndarray | None:
    """Driver matching `optimize_poses` (pose_utils.py:843-874)."""
    if vos is None:
        if target_poses is None:
            return None
        vos = vos_from_target_poses(target_poses)
    return optimize_pose_graph(pred_poses, vos, fc=fc_vos, sax=sax, saq=saq,
                               srx=srx, srq=srq, n_iters=n_iters)
