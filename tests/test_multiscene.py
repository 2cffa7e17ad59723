"""MultiSceneService: one compiled query executable shared across scenes.

Covers the two contracts VERDICT r3 demanded of the norm_ms runtime-
normalization path: (i) per scene, the runtime-normalized results
bit-match the traced-model_norm path; (ii) cross-scene queries hit the
right database — plus the single-compile proof, per-scene mutations, and
persistence.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.evaluation.multiscene import MultiSceneService
from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                ServiceConfig)
from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig

# deliberately NOT powers of two: the bitwise-equality claims below only
# mean something when 1/std is inexact (XLA's division-by-constant
# rewrite is a reciprocal multiply; with 1/0.25 the rewrite is exact and
# the test would pass vacuously)
STATS_A = (np.float32([0.45, 0.43, 0.41]), np.float32([0.293, 0.277, 0.301]))
STATS_B = (np.float32([0.52, 0.50, 0.48]), np.float32([0.311, 0.286, 0.297]))


def make_parts(seq_len=4, deterministic=True, capacity=16,
               retrieval_candidates=None, retrieval="netvlad"):
    mcfg = RelPoseGNNConfig(num_nodes=seq_len, feat_dim=32, edge_dim=32,
                            node_dim=32, knn=2, backbone="resnet18",
                            droprate=0.0)
    model = RelPoseGNN(mcfg)
    model_vars = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, seq_len, 32, 40, 3)),
                            jnp.ones((1, seq_len, seq_len), bool),
                            train=False)
    if retrieval == "shared-trunk":
        netvlad, nv_vars = None, None
    else:
        netvlad = NetVLADEncoder(num_clusters=4, encoder_dim=512)
        nv_vars = netvlad.init(jax.random.PRNGKey(1),
                               jnp.ones((1, 48, 64, 3)))
    cfg = ServiceConfig(seq_len=seq_len, sampling_period=2,
                        retrieval_hw=(48, 64), deterministic=deterministic,
                        retrieval_candidates=retrieval_candidates,
                        capacity=capacity, retrieval=retrieval)
    return model, model_vars, netvlad, nv_vars, cfg


def traced_norm(stats):
    """The single-scene serve path's model_norm closure (cli/serve.py):
    jit traces mean/std in as CONSTANTS."""
    mj, sj = jnp.asarray(stats[0]), jnp.asarray(stats[1])

    def f(x01):
        return (x01 - mj) / sj

    return f


def scene_data(n, seed, pose_offset=0.0):
    rng = np.random.default_rng(seed)
    imgs = rng.random((n, 32, 40, 3)).astype(np.float32)
    poses = (rng.normal(size=(n, 6)) + pose_offset).astype(np.float32)
    return imgs, poses


class TestNormMsBitwise:
    def test_norm_ms_query_bitwise_matches_traced_model_norm(self):
        """(i) On the SAME service + database, a norm_ms-driven query is
        bit-identical to the traced-model_norm query: the runtime
        (x - mean) * (1/std) form compiles to the same math XLA rewrites
        the traced (x - mean)/std closure into."""
        model, mv, nv, nvv, cfg = make_parts(deterministic=True)
        svc = RelocalizationService(model, mv, nv, nvv, cfg)
        imgs, poses = scene_data(10, seed=0)
        norm = traced_norm(STATS_A)
        svc.build(imgs, poses, norm, batch=4)
        q = imgs[2:5] * 0.98

        out_traced = svc.query(q, norm)
        out_runtime = svc.query(q, None, norm_ms=(
            jnp.asarray(STATS_A[0]), jnp.asarray(STATS_A[1])))
        np.testing.assert_array_equal(np.asarray(out_traced["pose"]),
                                      np.asarray(out_runtime["pose"]))
        np.testing.assert_array_equal(np.asarray(out_traced["neighbors"]),
                                      np.asarray(out_runtime["neighbors"]))
        np.testing.assert_array_equal(np.asarray(out_traced["anchor"]),
                                      np.asarray(out_runtime["anchor"]))

    def test_multiscene_bitwise_matches_per_scene_services(self):
        """(i) across the whole stack: each scene served by
        MultiSceneService (runtime norm, shared executable) bit-matches a
        dedicated single-scene RelocalizationService (traced norm) built
        at the same capacity — database embedding included."""
        model, mv, nv, nvv, cfg = make_parts(deterministic=True,
                                             capacity=16)
        ms = MultiSceneService(model, mv, nv, nvv, cfg)
        for name, stats, seed in (("a", STATS_A, 1), ("b", STATS_B, 2)):
            imgs, poses = scene_data(10, seed=seed)
            ms.add_scene(name, imgs, poses, *stats, batch=4)

            single = RelocalizationService(model, mv, nv, nvv, cfg)
            single.build(imgs, poses, traced_norm(stats), batch=4)

            # database embeddings bit-match (build used the traced
            # closure; add_scene used the runtime embed program)
            np.testing.assert_array_equal(
                np.asarray(ms._scenes[name].emb),
                np.asarray(single.db_emb))
            np.testing.assert_array_equal(
                np.asarray(ms._scenes[name].desc),
                np.asarray(single.db_desc))

            q = imgs[3:6] * 0.97
            got = ms.query(name, q)
            want = single.query(q, traced_norm(stats))
            np.testing.assert_array_equal(np.asarray(got["pose"]),
                                          np.asarray(want["pose"]))
            np.testing.assert_array_equal(np.asarray(got["neighbors"]),
                                          np.asarray(want["neighbors"]))


class TestMultiScene:
    def _service_with_scenes(self, deterministic=True, capacity=16,
                             retrieval_candidates=None):
        model, mv, nv, nvv, cfg = make_parts(
            deterministic=deterministic, capacity=capacity,
            retrieval_candidates=retrieval_candidates)
        ms = MultiSceneService(model, mv, nv, nvv, cfg)
        # scene b's poses live around +100: a query served against the
        # wrong database is unmistakable in the recovered pose
        data = {"a": scene_data(10, seed=3, pose_offset=0.0),
                "b": scene_data(12, seed=4, pose_offset=100.0)}
        for name, stats in (("a", STATS_A), ("b", STATS_B)):
            ms.add_scene(name, data[name][0], data[name][1], *stats,
                         batch=4)
        return ms, data

    def test_cross_scene_queries_hit_right_database(self):
        """(ii) a query near scene X's frames retrieves scene X's
        database rows and recovers a pose in scene X's pose range."""
        ms, data = self._service_with_scenes()
        for name, offset in (("a", 0.0), ("b", 100.0)):
            imgs, _ = data[name]
            q = imgs[4:5]  # exact copy of frame 4
            out = ms.query(name, q)
            assert int(np.asarray(out["neighbors"])[0, 0]) == 4
            pose = np.asarray(out["pose"])[0]
            assert abs(pose.mean() - offset) < 50.0, (name, pose)

    def test_one_compile_serves_every_scene(self):
        """The single-executable contract: after serving both scenes
        (and growing one), exactly ONE query program was compiled."""
        ms, data = self._service_with_scenes()
        ms.query("a", data["a"][0][:2])
        ms.query("b", data["b"][0][:2])
        ms.add_frames("a", data["a"][0][:3], data["a"][1][:3], batch=4)
        ms.query("a", data["a"][0][2:4])
        assert ms.query_compiles() == 1

    def test_shared_trunk_single_compile_and_bitwise(self):
        """retrieval='shared-trunk' composes with the multi-scene
        contract: two scenes share one executable (no NetVLAD encoder
        exists at all), and each scene bit-matches a dedicated
        single-scene shared-trunk service with the normalization traced
        in — covering the normalized-embedding descriptor through the
        runtime-norm embed path."""
        model, mv, _, _, cfg = make_parts(retrieval="shared-trunk")
        ms = MultiSceneService(model, mv, None, None, cfg)
        for name, stats, seed in (("a", STATS_A, 5), ("b", STATS_B, 6)):
            imgs, poses = scene_data(10, seed=seed)
            ms.add_scene(name, imgs, poses, *stats, batch=4)

            single = RelocalizationService(model, mv, None, None, cfg)
            single.build(imgs, poses, traced_norm(stats), batch=4)
            np.testing.assert_array_equal(
                np.asarray(ms._scenes[name].desc),
                np.asarray(single.db_desc))

            q = imgs[3:6] * 0.97
            got = ms.query(name, q)
            want = single.query(q, traced_norm(stats))
            np.testing.assert_array_equal(np.asarray(got["pose"]),
                                          np.asarray(want["pose"]))
            np.testing.assert_array_equal(np.asarray(got["neighbors"]),
                                          np.asarray(want["neighbors"]))
        assert ms.query_compiles() == 1

    def test_requires_capacity(self):
        model, mv, nv, nvv, cfg = make_parts(capacity=None)
        with pytest.raises(ValueError, match="capacity"):
            MultiSceneService(model, mv, nv, nvv, cfg)

    def test_scene_validation(self):
        ms, data = self._service_with_scenes()
        with pytest.raises(ValueError, match="already added"):
            ms.add_scene("a", data["a"][0], data["a"][1], *STATS_A)
        imgs, poses = scene_data(20, seed=9)
        with pytest.raises(ValueError, match="capacity"):
            ms.add_scene("c", imgs, poses, *STATS_A)

    def test_pose_length_mismatch_fails_loudly(self):
        """len(poses) != len(images) raises before any mutation, on both
        add_scene and add_frames (see the single-scene twin in
        tests/test_service.py for why silent mismatches corrupt)."""
        ms, data = self._service_with_scenes()
        imgs, poses = scene_data(6, seed=10)
        with pytest.raises(ValueError, match="poses shape"):
            ms.add_scene("c", imgs, poses[:4], *STATS_A, batch=4)
        assert "c" not in ms.scenes()
        before = np.asarray(ms._scenes["a"].poses).copy()
        with pytest.raises(ValueError, match="poses shape"):
            ms.add_frames("a", imgs[:2], poses[:3], batch=4)
        np.testing.assert_array_equal(
            np.asarray(ms._scenes["a"].poses), before)
        assert ms.scene_count("a") == 10

    def test_unknown_scene_fails_with_available_list(self):
        """Every per-scene surface names the unknown scene AND what the
        service actually holds — and query_stream fails BEFORE any
        dispatch (a KeyError mid-stream would discard the batches
        already served)."""
        ms, data = self._service_with_scenes()
        q = data["a"][0][:2]
        with pytest.raises(KeyError, match=r"unknown scene 'z'.*'a'"):
            ms.query("z", q)
        with pytest.raises(KeyError, match="unknown scene"):
            ms.query_stream("z", iter([q]))  # raises at call, not on next()
        for call in (lambda: ms.scene_count("z"),
                     lambda: ms.add_frames("z", q, data["a"][1][:2]),
                     lambda: ms.invalidate_frames("z", [0]),
                     lambda: ms.compact_scene("z")):
            with pytest.raises(KeyError, match="unknown scene"):
                call()

    def test_load_rejects_single_scene_snapshot(self, tmp_path):
        """A RelocalizationService.save_database file (no 'scenes' key)
        must be rejected with a pointer to the right loader, not die on
        a raw KeyError deep in np.load."""
        path = str(tmp_path / "single.npz")
        np.savez(path, desc=np.zeros((4, 8), np.float32),
                 retrieval_hw=np.asarray((48, 64), np.int64))
        model, mv, nv, nvv, cfg = make_parts()
        ms = MultiSceneService(model, mv, nv, nvv, cfg)
        with pytest.raises(ValueError,
                           match="not a MultiSceneService snapshot"):
            ms.load_database(path)

    def test_add_frames_matches_fresh_scene(self):
        """Growing a scene behaves like registering it whole (same
        chunking -> same embeddings -> identical deterministic
        retrieval), and growth in one scene leaves the other intact."""
        model, mv, nv, nvv, cfg = make_parts(deterministic=True,
                                             capacity=16)
        imgs, poses = scene_data(12, seed=7)

        grown = MultiSceneService(model, mv, nv, nvv, cfg)
        grown.add_scene("s", imgs[:8], poses[:8], *STATS_A, batch=4)
        grown.add_frames("s", imgs[8:], poses[8:], batch=4)
        assert grown.scene_count("s") == 12

        fresh = MultiSceneService(model, mv, nv, nvv, cfg)
        fresh.add_scene("s", imgs, poses, *STATS_A, batch=4)

        q = imgs[9:12] * 0.98  # nearest to the ADDED frames
        out_g = grown.query("s", q)
        out_f = fresh.query("s", q)
        np.testing.assert_array_equal(np.asarray(out_g["neighbors"]),
                                      np.asarray(out_f["neighbors"]))
        np.testing.assert_array_equal(
            np.asarray(out_g["neighbors"])[:, 0], [9, 10, 11])

    def test_invalidate_and_compact_per_scene(self):
        ms, data = self._service_with_scenes()
        imgs_a, _ = data["a"]
        q = imgs_a[4:5]
        assert int(np.asarray(ms.query("a", q)["neighbors"])[0, 0]) == 4
        ms.invalidate_frames("a", [4])
        nbrs = np.asarray(ms.query("a", q)["neighbors"])
        assert 4 not in nbrs[0].tolist()
        # scene b untouched
        assert int(np.asarray(
            ms.query("b", data["b"][0][4:5])["neighbors"])[0, 0]) == 4

        before = ms.query("a", q)
        mapping = ms.compact_scene("a")
        assert ms.scene_count("a") == 9
        after = ms.query("a", q)
        np.testing.assert_array_equal(
            mapping[np.asarray(before["neighbors"])],
            np.asarray(after["neighbors"]))
        np.testing.assert_array_equal(np.asarray(before["pose"]),
                                      np.asarray(after["pose"]))

    def test_save_load_roundtrip_bitwise(self, tmp_path):
        ms, data = self._service_with_scenes()
        path = str(tmp_path / "ms.npz")
        ms.save_database(path)

        model, mv, nv, nvv, cfg = make_parts(deterministic=True,
                                             capacity=16)
        dst = MultiSceneService(model, mv, nv, nvv, cfg)
        dst.load_database(path)
        assert sorted(dst.scenes()) == ["a", "b"]
        for name in ("a", "b"):
            q = data[name][0][2:5]
            np.testing.assert_array_equal(
                np.asarray(ms.query(name, q)["pose"]),
                np.asarray(dst.query(name, q)["pose"]))

    def test_load_replaces_registry_wholesale(self, tmp_path):
        """load_database REPLACES the scene registry (like the
        single-scene loader replaces db_* state): a scene added before
        the load — whether or not the snapshot also has one by that
        name — never survives as mixed-provenance state."""
        ms, data = self._service_with_scenes()
        path = str(tmp_path / "ms.npz")
        ms.save_database(path)

        model, mv, nv, nvv, cfg = make_parts(deterministic=True,
                                             capacity=16)
        dst = MultiSceneService(model, mv, nv, nvv, cfg)
        # pre-load scenes: one name-colliding ('a', DIFFERENT data), one
        # extra ('c') absent from the snapshot
        imgs_c, poses_c = scene_data(6, seed=9, pose_offset=50.0)
        dst.add_scene("a", imgs_c, poses_c, *STATS_B, batch=4)
        dst.add_scene("c", imgs_c, poses_c, *STATS_B, batch=4)
        dst.load_database(path)
        assert sorted(dst.scenes()) == ["a", "b"]  # 'c' dropped
        # 'a' is the SNAPSHOT's scene a, not the pre-load imposter
        q = data["a"][0][2:5]
        np.testing.assert_array_equal(
            np.asarray(dst.query("a", q)["pose"]),
            np.asarray(ms.query("a", q)["pose"]))

    def test_query_stream_matches_sequential(self):
        ms, data = self._service_with_scenes(deterministic=False)
        rng = np.random.default_rng(5)
        batches = [rng.random((2, 32, 40, 3)).astype(np.float32)
                   for _ in range(4)]
        key = jax.random.PRNGKey(11)
        want = [ms.query("a", b, jax.random.fold_in(key, i))
                for i, b in enumerate(batches)]
        got = list(ms.query_stream("a", batches, depth=2, rng=key))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g["neighbors"],
                                          np.asarray(w["neighbors"]))
            np.testing.assert_array_equal(g["pose"], np.asarray(w["pose"]))


class TestMultiSceneBindingGuards:
    """Round-5 snapshot/resolution binding on the multiscene surface
    (ADVICE r4 #1): per-scene hw travels with the database and the
    snapshot carries the model fingerprint."""

    def _service(self):
        model, mv, nv, nvv, cfg = make_parts(deterministic=True,
                                             capacity=16)
        ms = MultiSceneService(model, mv, nv, nvv, cfg)
        imgs, poses = scene_data(8, seed=11)
        ms.add_scene("a", imgs, poses, *STATS_A, batch=4)
        return ms, imgs, poses

    def test_query_rejects_mismatched_resolution(self):
        ms, _, _ = self._service()
        q = np.random.default_rng(0).random((2, 16, 20, 3)).astype(
            np.float32)
        with pytest.raises(ValueError, match="embedded at"):
            ms.query("a", q)

    def test_add_frames_rejects_mismatched_resolution(self):
        ms, _, poses = self._service()
        bad = np.random.default_rng(1).random((2, 16, 20, 3)).astype(
            np.float32)
        with pytest.raises(ValueError, match="embedded at"):
            ms.add_frames("a", bad, poses[:2], batch=2)

    def test_load_rejects_different_weights(self, tmp_path):
        ms, _, _ = self._service()
        path = str(tmp_path / "ms.npz")
        ms.save_database(path)
        model, mv, nv, nvv, cfg = make_parts(deterministic=True,
                                             capacity=16)
        mv = jax.tree.map(lambda x: x * 1.5 + 0.01, mv)
        dst = MultiSceneService(model, mv, nv, nvv, cfg)
        with pytest.raises(ValueError, match="WEIGHTS"):
            dst.load_database(path)

    def test_hw_survives_save_load(self, tmp_path):
        ms, _, _ = self._service()
        path = str(tmp_path / "ms.npz")
        ms.save_database(path)
        model, mv, nv, nvv, cfg = make_parts(deterministic=True,
                                             capacity=16)
        dst = MultiSceneService(model, mv, nv, nvv, cfg)
        dst.load_database(path)
        bad = np.random.default_rng(2).random((1, 16, 20, 3)).astype(
            np.float32)
        with pytest.raises(ValueError, match="embedded at"):
            dst.query("a", bad)
