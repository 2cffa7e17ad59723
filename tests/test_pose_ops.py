"""Unit tests for relpose_gnn_tpu.ops.pose against independent oracles.

Oracles: scipy.spatial.transform.Rotation (quaternion/matrix algebra) and
direct numpy formulas. The reference repo ships no tests (SURVEY.md §4); its
inline self-checks in pose_utils.py:1149-1371 are superseded by these.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from relpose_gnn_tpu.ops import pose


def rand_unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q


def to_scipy(q):  # w,x,y,z -> x,y,z,w
    return np.concatenate([q[..., 1:], q[..., :1]], axis=-1)


def from_scipy(q):  # x,y,z,w -> w,x,y,z
    return np.concatenate([q[..., 3:], q[..., :3]], axis=-1)


class TestQuaternionAlgebra:
    def test_qmult_matches_scipy(self):
        q1 = rand_unit_quats(32, 1)
        q2 = rand_unit_quats(32, 2)
        got = np.asarray(pose.qmult(jnp.asarray(q1), jnp.asarray(q2)))
        want = from_scipy((Rotation.from_quat(to_scipy(q1)) *
                           Rotation.from_quat(to_scipy(q2))).as_quat())
        # sign ambiguity: compare up to sign
        sign = np.sign(np.sum(got * want, axis=1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-5)

    def test_qinv_is_conjugate(self):
        q = rand_unit_quats(8)
        qi = np.asarray(pose.qinv(jnp.asarray(q)))
        prod = np.asarray(pose.qmult(jnp.asarray(q), jnp.asarray(qi)))
        ident = np.tile([1.0, 0, 0, 0], (8, 1))
        np.testing.assert_allclose(prod, ident, atol=1e-5)

    def test_qexp_qlog_roundtrip(self):
        rng = np.random.default_rng(3)
        w = rng.normal(size=(64, 3)) * 0.7  # angle < pi
        q = np.asarray(pose.qexp(jnp.asarray(w)))
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-6)
        w2 = np.asarray(pose.qlog(jnp.asarray(q)))
        np.testing.assert_allclose(w2, w, atol=1e-5)

    def test_qexp_zero_is_identity(self):
        q = np.asarray(pose.qexp(jnp.zeros((1, 3))))
        np.testing.assert_allclose(q, [[1.0, 0, 0, 0]], atol=1e-7)

    def test_qlog_identity_is_zero(self):
        w = np.asarray(pose.qlog(jnp.asarray([[1.0, 0, 0, 0]])))
        np.testing.assert_allclose(w, np.zeros((1, 3)), atol=1e-7)

    def test_qexp_matches_reference_formula(self):
        # numpy reference: hstack((cos(n), sinc(n/pi) * q))
        rng = np.random.default_rng(4)
        w = rng.normal(size=(16, 3))
        want = np.stack([np.hstack([np.cos(np.linalg.norm(x)),
                                    np.sinc(np.linalg.norm(x) / np.pi) * x])
                         for x in w])
        got = np.asarray(pose.qexp(jnp.asarray(w)))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_rotate_vec_by_q_matches_scipy(self):
        q = rand_unit_quats(16, 5)
        rng = np.random.default_rng(6)
        t = rng.normal(size=(16, 3))
        got = np.asarray(pose.rotate_vec_by_q(jnp.asarray(t), jnp.asarray(q)))
        want = Rotation.from_quat(to_scipy(q)).apply(t)
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPoseComposition:
    def _homog(self, p7):
        T = np.eye(4)
        T[:3, :3] = Rotation.from_quat(to_scipy(p7[3:])).as_matrix()
        T[:3, 3] = p7[:3]
        return T

    def test_compose_matches_homogeneous(self):
        rng = np.random.default_rng(7)
        q = rand_unit_quats(2, 8)
        p1 = np.concatenate([rng.normal(size=3), q[0]])
        p2 = np.concatenate([rng.normal(size=3), q[1]])
        got = np.asarray(pose.compose_pose_quaternion(
            jnp.asarray(p1[None]), jnp.asarray(p2[None])))[0]
        T = self._homog(p1) @ self._homog(p2)
        np.testing.assert_allclose(got[:3], T[:3, 3], atol=1e-5)
        got_R = Rotation.from_quat(to_scipy(got[3:])).as_matrix()
        np.testing.assert_allclose(got_R, T[:3, :3], atol=1e-5)

    def test_invert_roundtrip(self):
        rng = np.random.default_rng(9)
        p = np.concatenate([rng.normal(size=(4, 3)), rand_unit_quats(4, 10)],
                           axis=1)
        pj = jnp.asarray(p)
        ident = np.asarray(pose.compose_pose_quaternion(
            pj, pose.invert_pose_quaternion(pj)))
        np.testing.assert_allclose(ident[:, :3], 0, atol=1e-5)
        np.testing.assert_allclose(np.abs(ident[:, 3]), 1, atol=1e-5)

    def test_calc_vo_frame(self):
        # relative pose of p1 in p0's frame: p0 * vo == p1
        rng = np.random.default_rng(11)
        p0 = np.concatenate([rng.normal(size=(3, 3)), rand_unit_quats(3, 12)], axis=1)
        p1 = np.concatenate([rng.normal(size=(3, 3)), rand_unit_quats(3, 13)], axis=1)
        vo = pose.calc_vo(jnp.asarray(p0), jnp.asarray(p1))
        back = np.asarray(pose.compose_pose_quaternion(jnp.asarray(p0), vo))
        sign = np.sign(np.sum(back[:, 3:] * p1[:, 3:], axis=1, keepdims=True))
        np.testing.assert_allclose(back[:, :3], p1[:, :3], atol=1e-4)
        np.testing.assert_allclose(back[:, 3:] * sign, p1[:, 3:], atol=1e-4)

    def test_calc_vos_simple(self):
        rng = np.random.default_rng(14)
        p = rng.normal(size=(2, 5, 6))
        got = np.asarray(pose.calc_vos_simple(jnp.asarray(p)))
        want = p[:, 1:] - p[:, :-1]
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestAngularError:
    def test_zero_for_same_quat(self):
        q = rand_unit_quats(8, 15)
        err = np.asarray(pose.quaternion_angular_error(jnp.asarray(q),
                                                       jnp.asarray(q)))
        # float32 arccos near 1.0 has ~0.04 deg noise; final metrics are
        # computed host-side in float64 by the evaluator.
        np.testing.assert_allclose(err, 0, atol=0.08)

    def test_matches_reference_formula(self):
        q1 = rand_unit_quats(32, 16)
        q2 = rand_unit_quats(32, 17)
        got = np.asarray(pose.quaternion_angular_error(jnp.asarray(q1),
                                                       jnp.asarray(q2)))
        for i in range(32):
            d = abs(float(q2[i] @ q1[i].T))
            d = min(1.0, max(-1.0, d))
            want = 2 * np.arccos(d) * 180 / np.pi
            assert abs(got[i] - want) < 1e-3

    def test_sign_invariance(self):
        q1 = rand_unit_quats(8, 18)
        e1 = np.asarray(pose.quaternion_angular_error(jnp.asarray(q1),
                                                      jnp.asarray(-q1)))
        np.testing.assert_allclose(e1, 0, atol=0.08)  # f32 arccos noise


class TestMatQuat:
    def test_mat2quat_matches_scipy(self):
        R = Rotation.random(64, rng=np.random.default_rng(19)).as_matrix()
        got = np.asarray(pose.mat2quat(jnp.asarray(R)))
        want = from_scipy(Rotation.from_matrix(R).as_quat())
        sign = np.sign(np.sum(got * want, axis=1, keepdims=True))
        np.testing.assert_allclose(got, want * sign, atol=1e-5)

    def test_quat2mat_roundtrip(self):
        q = rand_unit_quats(32, 20)
        R = np.asarray(pose.quat2mat(jnp.asarray(q)))
        want = Rotation.from_quat(to_scipy(q)).as_matrix()
        np.testing.assert_allclose(R, want, atol=1e-5)

    def test_mat2quat_near_identity_and_pi(self):
        # numerically tricky cases: tiny angle and ~pi rotations
        axes = np.eye(3)
        for ang in (1e-7, np.pi - 1e-6, np.pi):
            for ax in axes:
                R = Rotation.from_rotvec(ang * ax).as_matrix()
                q = np.asarray(pose.mat2quat(jnp.asarray(R[None])))[0]
                R2 = np.asarray(pose.quat2mat(jnp.asarray(q[None])))[0]
                np.testing.assert_allclose(R2, R, atol=1e-5)


class TestProcessPoses:
    def test_identity_alignment(self):
        rng = np.random.default_rng(21)
        R = Rotation.random(5, rng=rng).as_matrix()
        t = rng.normal(size=(5, 3))
        raw = np.concatenate([R, t[:, :, None]], axis=2).reshape(5, 12)
        out = pose.process_poses(raw, np.zeros(3), np.ones(3),
                                 np.eye(3), np.zeros(3), 1.0)
        np.testing.assert_allclose(out[:, :3], t, atol=1e-6)
        # rotation roundtrip through logq
        q = np.asarray(pose.qexp(jnp.asarray(out[:, 3:])))
        R2 = Rotation.from_quat(to_scipy(q)).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-5)

    def test_normalization(self):
        rng = np.random.default_rng(22)
        R = Rotation.random(4, rng=rng).as_matrix()
        t = rng.normal(size=(4, 3))
        raw = np.concatenate([R, t[:, :, None]], axis=2).reshape(4, 12)
        mean_t, std_t = np.array([1.0, 2.0, 3.0]), np.array([2.0, 2.0, 2.0])
        out = pose.process_poses(raw, mean_t, std_t, np.eye(3), np.zeros(3), 1.0)
        np.testing.assert_allclose(out[:, :3], (t - mean_t) / std_t, atol=1e-6)

    def test_cambridge_4x4(self):
        R = Rotation.random(1, rng=np.random.default_rng(23)).as_matrix()[0]
        t = np.array([0.5, -1.0, 2.0])
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        out = pose.process_poses_cambridge(T)
        np.testing.assert_allclose(out[:3], t, atol=1e-6)
        q = np.asarray(pose.qexp(jnp.asarray(out[None, 3:])))[0]
        R2 = Rotation.from_quat(to_scipy(q)).as_matrix()
        np.testing.assert_allclose(R2, R, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
