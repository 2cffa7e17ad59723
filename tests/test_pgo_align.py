"""Tests for pose-graph optimization and Horn alignment."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from relpose_gnn_tpu.ops import align, pgo
from relpose_gnn_tpu.ops import pose as pose_ops


def to_scipy(q):
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def make_trajectory(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.cumsum(rng.normal(scale=0.3, size=(n, 3)), axis=0)
    q = Rotation.random(n, rng=rng).as_quat()  # xyzw
    q = np.concatenate([q[:, 3:], q[:, :3]], axis=1)  # wxyz
    q *= np.where(q[:, :1] >= 0, 1, -1)
    return np.concatenate([t, q], axis=1).astype(np.float32)


class TestAlign:
    def test_recovers_similarity_transform(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(20, 3)).astype(np.float32)
        R = Rotation.random(rng=rng).as_matrix().astype(np.float32)
        s, t = 1.7, np.array([0.3, -2.0, 1.0], np.float32)
        y = s * x @ R.T + t
        s_e, R_e, t_e = align.align_3d_pts(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(s_e), s, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_e), t, atol=1e-4)

    def test_noscale_keeps_unit_scale(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(15, 3)).astype(np.float32)
        R = Rotation.random(rng=rng).as_matrix().astype(np.float32)
        y = 2.0 * x @ R.T  # scaled data, but solver must keep s=1
        s_e, R_e, _ = align.align_3d_pts_noscale(jnp.asarray(x),
                                                 jnp.asarray(y))
        assert float(s_e) == 1.0
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-3)

    def test_reflection_guard(self):
        # mirrored targets must still produce det(R) = +1
        rng = np.random.default_rng(3)
        x = rng.normal(size=(10, 3)).astype(np.float32)
        y = x.copy()
        y[:, 0] = -y[:, 0]
        _, R_e, _ = align.align_3d_pts(jnp.asarray(x), jnp.asarray(y))
        assert np.linalg.det(np.asarray(R_e)) > 0.99

    def test_2d(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(12, 2)).astype(np.float32)
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                     np.float32)
        y = 0.5 * x @ R.T + np.array([1.0, 2.0], np.float32)
        s_e, R_e, t_e = align.align_2d_pts(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(s_e), 0.5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R_e), R, atol=1e-4)

    def test_align_camera_poses(self):
        # geometrically consistent similarity: positions AND orientations
        # of the target trajectory rotated by the same R (the reference's
        # rotation constraint, pose_utils.py:1126-1133, adds orientation
        # outer-products into the SVD — inconsistent fixture data would
        # fight it)
        traj = make_trajectory(8, seed=5)
        R = Rotation.random(rng=np.random.default_rng(6)).as_matrix()
        t_align = np.array([1.0, 0, -2])
        t_new = traj[:, :3] @ R.T + t_align
        rot_gt = (Rotation.from_matrix(R)
                  * Rotation.from_quat(to_scipy(traj[:, 3:])))
        q_gt = rot_gt.as_quat()
        q_gt = np.concatenate([q_gt[:, 3:], q_gt[:, :3]],
                              axis=1).astype(np.float32)  # wxyz
        ta, qa, _ = align.align_camera_poses(
            jnp.asarray(traj[:, :3]), jnp.asarray(traj[:, 3:]),
            jnp.asarray(t_new.astype(np.float32)),
            jnp.asarray(q_gt), with_scale=False)
        np.testing.assert_allclose(np.asarray(ta), t_new, atol=1e-3)
        # rotated orientations: qa = q_align * q
        want = rot_gt.as_quat()
        got = to_scipy(np.asarray(qa))
        sign = np.sign(np.sum(got * want, axis=1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=1e-3)

    def test_rotation_constraint_pins_degenerate_trajectories(self):
        # straight-line camera centers leave the rotation about the path
        # axis unconstrained by centers alone; the rotation constraint
        # (reference default) disambiguates it with the orientations
        n = 10
        t_pred = np.stack([np.linspace(0, 1, n), np.zeros(n),
                           np.zeros(n)], axis=1).astype(np.float32)
        q_id = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
        # target: same centers (degenerate), orientations rotated 90 deg
        # about x (the line direction) — only orientations reveal R
        Rx = Rotation.from_euler("x", 90, degrees=True)
        q_rx = Rx.as_quat()
        q_gt = np.tile(np.concatenate([q_rx[3:], q_rx[:3]]),
                       (n, 1)).astype(np.float32)
        ta, qa, (s, R, t_al) = align.align_camera_poses(
            jnp.asarray(t_pred), jnp.asarray(q_id),
            jnp.asarray(t_pred), jnp.asarray(q_gt), with_scale=False)
        np.testing.assert_allclose(np.asarray(R), Rx.as_matrix(),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ta), t_pred, atol=1e-4)


class TestPGO:
    def test_perfect_inputs_are_fixed_point(self):
        traj = make_trajectory(6, seed=7)
        vos = pgo.vos_from_target_poses(traj, rotate_frame=True)
        out = pgo.optimize_poses(traj, vos=vos, n_iters=3)
        np.testing.assert_allclose(out[:, :3], traj[:, :3], atol=1e-3)
        dq = np.abs(np.sum(out[:, 3:] * traj[:, 3:], axis=1))
        np.testing.assert_allclose(dq, 1.0, atol=1e-3)

    def test_denoises_toward_vo(self):
        """Noisy absolute poses + exact VO from GT + strong VO weight
        -> optimized trajectory closer to GT than the noisy input."""
        gt = make_trajectory(8, seed=8)
        rng = np.random.default_rng(9)
        noisy = gt.copy()
        noisy[:, :3] += rng.normal(scale=0.3, size=(8, 3))
        vos = pgo.vos_from_target_poses(gt, rotate_frame=True)
        out = pgo.optimize_poses(noisy, vos=vos, sax=1.0, saq=1.0,
                                 srx=0.001, srq=0.001, n_iters=10)
        err_before = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=1).mean()
        # optimal solution preserves the VO chain shape; compare after
        # removing the global offset (VO fixes shape, not gauge)
        off_out = out[:, :3] - out[0, :3]
        off_gt = gt[:, :3] - gt[0, :3]
        err_after = np.linalg.norm(off_out - off_gt, axis=1).mean()
        assert err_after < err_before * 0.5, (err_before, err_after)

    def test_fc_edges(self):
        src, dst = pgo.fc_edges(4)
        assert len(src) == 6
        assert all(s < d for s, d in zip(src, dst))

    def test_fc_mode_runs(self):
        gt = make_trajectory(5, seed=10)
        src, dst = pgo.fc_edges(5)
        qs = jnp.asarray(gt[src, 3:])
        qd = jnp.asarray(gt[dst, 3:])
        vos_q = np.asarray(pose_ops.qmult(pose_ops.qinv(qs), qd))
        vos_t = np.asarray(pose_ops.rotate_vec_by_q(
            jnp.asarray(gt[dst, :3] - gt[src, :3]), pose_ops.qinv(qs)))
        vos = np.concatenate([vos_t, vos_q], axis=1)
        out = pgo.optimize_pose_graph(gt, vos, fc=True, n_iters=3)
        np.testing.assert_allclose(out[:, :3], gt[:, :3], atol=1e-3)

    def test_quaternions_stay_unit(self):
        gt = make_trajectory(5, seed=11)
        noisy = gt.copy()
        noisy[:, :3] += 0.2
        vos = pgo.vos_from_target_poses(gt)
        out = pgo.optimize_poses(noisy, vos=vos, n_iters=5)
        np.testing.assert_allclose(np.linalg.norm(out[:, 3:], axis=1), 1.0,
                                   atol=1e-4)
