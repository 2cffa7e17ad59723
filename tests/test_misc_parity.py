"""Small parity helpers: fully-connected VO, leave-one-out file masks."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from relpose_gnn_tpu.data.seven_scenes import leave_one_out_file_mask
from relpose_gnn_tpu.ops import pose


class TestCalcVosFC:
    def test_pair_count_and_values(self):
        rng = np.random.default_rng(0)
        t = 5
        logq = rng.normal(size=(t, 3)) * 0.3
        p = np.concatenate([rng.normal(size=(t, 3)), logq],
                           axis=1).astype(np.float32)
        out = np.asarray(pose.calc_vos_fc(jnp.asarray(p)))
        assert out.shape == (10, 6)  # 5 choose 2
        # check pair (1, 3) against the pairwise op
        src, dst = np.triu_indices(t, k=1)
        k = int(np.where((src == 1) & (dst == 3))[0][0])
        want = np.asarray(pose.calc_vo_logq(jnp.asarray(p[1][None]),
                                            jnp.asarray(p[3][None])))[0]
        np.testing.assert_allclose(out[k], want, atol=1e-5)

    def test_batched(self):
        rng = np.random.default_rng(1)
        p = rng.normal(size=(2, 4, 6)).astype(np.float32) * 0.3
        out = np.asarray(pose.calc_vos_fc(jnp.asarray(p)))
        assert out.shape == (2, 6, 6)

    def test_identity_pairs(self):
        # identical poses -> zero relative translation + zero logq
        p = np.tile(np.array([1.0, 2, 3, 0.1, 0.2, 0.3], np.float32),
                    (3, 1))
        out = np.asarray(pose.calc_vos_fc(jnp.asarray(p)))
        np.testing.assert_allclose(out, 0, atol=1e-5)


class TestLeaveOneOutMask:
    def test_excludes_range(self):
        idx = np.array([0, 500, 999, 1000, 3000, 4999, 5000, 20000])
        keep = leave_one_out_file_mask(idx, "chess")  # range (999, 5000)
        # strictly-inside indices dropped (reference: min < idx < max,
        # dataset_7Scenes_multi.py:107) — 4999 is inside, 999/5000 are not
        np.testing.assert_array_equal(
            keep, [True, True, True, False, False, False, True, True])

    def test_multiple_scenes(self):
        idx = np.arange(0, 26000, 500)
        keep = leave_one_out_file_mask(idx, ("heads", "stairs"))
        assert not keep[idx < 1000].any()   # heads range (-1, 1000)
        assert not keep[idx > 24000].any()  # stairs range (23999, 26000)

    def test_none_excluded(self):
        idx = np.arange(10)
        np.testing.assert_array_equal(
            leave_one_out_file_mask(idx, ()), np.ones(10, bool))


class TestMoreVariants:
    def test_calc_vos_consecutive(self):
        rng = np.random.default_rng(2)
        p = (rng.normal(size=(2, 4, 6)) * 0.3).astype(np.float32)
        out = np.asarray(pose.calc_vos(jnp.asarray(p)))
        assert out.shape == (2, 3, 6)
        want = np.asarray(pose.calc_vo_logq(jnp.asarray(p[:, :-1]),
                                            jnp.asarray(p[:, 1:])))
        np.testing.assert_allclose(out, want, atol=1e-6)

    def test_posenet_nolog_head(self):
        import jax
        from relpose_gnn_tpu.models.zoo import build_model
        m = build_model("posenet-nolog", feat_dim=32)
        img = jnp.ones((2, 32, 40, 3))
        v = m.init(jax.random.PRNGKey(0), img, train=False)
        out = m.apply(v, img, train=False)
        assert out.shape == (2, 7)  # t(3) + quat(4)
