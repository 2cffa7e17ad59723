"""Data layer tests: parsers on synthetic on-disk fixtures, packed dataset
roundtrip, graph builder, pipeline."""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation

from relpose_gnn_tpu.data import transforms as T
from relpose_gnn_tpu.data.cambridge import CambridgeLandmark
from relpose_gnn_tpu.data.graph_builder import (
    GraphBuilderConfig, build_graphs, self_exclusion_mask)
from relpose_gnn_tpu.data.packed import (
    ConcatPackedDataset, PackedGraphDataset, PackedGraphWriter)
from relpose_gnn_tpu.data.pipeline import data_iterator, device_prefetch
from relpose_gnn_tpu.data.seven_scenes import SevenScenes


def write_7scenes_fixture(root, scene="chess", n_seqs=2, n_frames=4,
                          train=True, size=(64, 48)):
    rng = np.random.default_rng(0)
    base = osp.join(root, scene)
    os.makedirs(base, exist_ok=True)
    split = "TrainSplit.txt" if train else "TestSplit.txt"
    with open(osp.join(base, split), "w") as f:
        for s in range(1, n_seqs + 1):
            f.write(f"sequence{s}\n")
    poses = []
    for s in range(1, n_seqs + 1):
        seq_dir = osp.join(base, f"seq-{s:02d}")
        os.makedirs(seq_dir, exist_ok=True)
        for i in range(n_frames):
            R = Rotation.random(rng=rng).as_matrix()
            t = rng.normal(size=3)
            P = np.eye(4)
            P[:3, :3] = R
            P[:3, 3] = t
            np.savetxt(osp.join(seq_dir, f"frame-{i:06d}.pose.txt"), P)
            img = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                osp.join(seq_dir, f"frame-{i:06d}.color.png"))
            Image.fromarray(img[..., 0]).save(
                osp.join(seq_dir, f"frame-{i:06d}.depth.png"))
            poses.append((R, t))
    return poses


def write_7scenes_vo_fixture(root, scene="chess", vo_lib="orbslam",
                             n_seqs=2, n_frames=4, train=True,
                             size=(64, 48)):
    """On top of the GT fixture, write the `real` mode's artifacts
    (seven_scenes.py:79-92): per-seq `<vo_lib>_poses/seq-NN.txt` tables
    [frame_idx, R|t(12)] covering a SUBSET of frames (VO loses some), and
    per-seq `<vo_lib>_vo_stats.pkl` Sim(3) alignments {'R','t','s'}.
    Returns (tracked frame indices per seq, vo pose rows per seq, stats)."""
    import pickle

    gt = write_7scenes_fixture(root, scene, n_seqs, n_frames, train, size)
    rng = np.random.default_rng(5)
    base = osp.join(root, scene)
    vo_dir = osp.join(base, f"{vo_lib}_poses")
    os.makedirs(vo_dir, exist_ok=True)
    tracked, vo_rows, stats = [], [], []
    offset = 1 if vo_lib == "libviso2" else 0  # 1-based frame indices
    for s in range(1, n_seqs + 1):
        idx = np.sort(rng.choice(n_frames, size=n_frames - 1,
                                 replace=False))
        rows = np.zeros((len(idx), 13))
        rows[:, 0] = idx + offset
        for j, i in enumerate(idx):
            R = Rotation.random(rng=rng).as_matrix()
            t = rng.normal(size=3)
            rows[j, 1:] = np.hstack([R, t[:, None]]).reshape(12)
        np.savetxt(osp.join(vo_dir, f"seq-{s:02d}.txt"), rows)
        st = {"R": Rotation.random(rng=rng).as_matrix(),
              "t": rng.normal(size=3), "s": float(rng.uniform(0.5, 2.0))}
        with open(osp.join(base, f"seq-{s:02d}",
                           f"{vo_lib}_vo_stats.pkl"), "wb") as f:
            pickle.dump(st, f)
        tracked.append(idx)
        vo_rows.append(rows)
        stats.append(st)
    return gt, tracked, vo_rows, stats


def write_cambridge_fixture(root, scene="ShopFacade", n=6, train=True,
                            size=(64, 48), subdirs=None):
    rng = np.random.default_rng(1)
    base = osp.join(root, scene)
    subdirs = subdirs or ["seq1"] * n
    for sd in set(subdirs):
        os.makedirs(osp.join(base, sd), exist_ok=True)
    split = "dataset_train.txt" if train else "dataset_test.txt"
    rows = []
    for i in range(n):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        t = rng.normal(size=3)
        name = f"{subdirs[i]}/frame{i:05d}.png"
        img = (rng.random((size[1], size[0], 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(osp.join(base, name))
        rows.append((name, t, q))
    with open(osp.join(base, split), "w") as f:
        f.write("Visual Landmark Dataset\nImageFile, Camera Position\n\n")
        for name, t, q in rows:
            f.write(f"{name} {t[0]} {t[1]} {t[2]} "
                    f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    stats = osp.join(root, "pose_stats.txt")
    np.savetxt(stats, np.vstack([np.zeros(3), np.ones(3)]))
    return rows, stats


class TestTransforms:
    def test_resize_short_side(self):
        img = Image.new("RGB", (640, 480))
        out = T.resize_short_side(img, 256)
        assert out.size == (341, 256)  # torchvision Resize(256) on 640x480
        img2 = Image.new("RGB", (480, 640))
        assert T.resize_short_side(img2, 256).size == (256, 341)

    def test_normalize(self):
        x = np.full((4, 4, 3), 0.5, np.float32)
        out = T.normalize(x, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
        np.testing.assert_allclose(out, 0.0)

    def test_color_jitter_stays_in_range(self):
        rng = np.random.default_rng(0)
        x = rng.random((8, 8, 3)).astype(np.float32)
        for _ in range(5):
            y = T.color_jitter(rng, x)
            assert y.min() >= 0 and y.max() <= 1

    def test_load_missing_returns_none(self):
        assert T.load_rgb("/nonexistent/file.png") is None


class TestSevenScenesParser:
    def test_parse(self, tmp_path):
        write_7scenes_fixture(str(tmp_path))
        ds = SevenScenes("chess", str(tmp_path), train=True, image_size=32)
        assert len(ds) == 8
        img, pose, rel = ds[0]
        assert img.shape[2] == 3 and img.shape[0] == 32
        assert pose.shape == (6,)
        assert rel.startswith("chess/seq-01")

    def test_pose_roundtrip(self, tmp_path):
        raw = write_7scenes_fixture(str(tmp_path))
        ds = SevenScenes("chess", str(tmp_path), train=True)
        import jax.numpy as jnp
        from relpose_gnn_tpu.ops import pose as pose_ops
        for i, (R, t) in enumerate(raw):
            np.testing.assert_allclose(ds.poses[i, :3], t, atol=1e-5)
            q = np.asarray(pose_ops.qexp(jnp.asarray(ds.poses[i:i + 1, 3:])))
            R2 = np.asarray(pose_ops.quat2mat(jnp.asarray(q)))[0]
            np.testing.assert_allclose(R2, R, atol=1e-4)


class TestSevenScenesVOMode:
    def test_real_mode_poses_gt_idx_and_alignment(self, tmp_path):
        """real=True serves only VO-tracked frames, maps each back to its
        GT row via gt_idx, and applies the per-sequence Sim(3) alignment
        exactly as process_poses would (seven_scenes.py:79-101,119-124)."""
        from relpose_gnn_tpu.ops.pose import process_poses

        _, tracked, vo_rows, stats = write_7scenes_vo_fixture(
            str(tmp_path), n_seqs=2, n_frames=4)
        ds = SevenScenes("chess", str(tmp_path), train=True, image_size=32,
                         real=True)
        n0, n1 = len(tracked[0]), len(tracked[1])
        assert len(ds) == n0 + n1
        # gt_idx: seq-2's indices offset by seq-1's GT frame count (4)
        np.testing.assert_array_equal(
            ds.gt_idx, np.hstack([tracked[0], 4 + tracked[1]]))
        # images come from the tracked frames
        assert ds.c_imgs[0].endswith(
            f"seq-01/frame-{tracked[0][0]:06d}.color.png")
        assert ds.c_imgs[n0].endswith(
            f"seq-02/frame-{tracked[1][0]:06d}.color.png")
        # poses: per-seq aligned VO poses, identity normalization
        for s, (rows, st) in enumerate(zip(vo_rows, stats)):
            want = process_poses(rows[:, 1:13], np.zeros(3), np.ones(3),
                                 np.asarray(st["R"]), np.asarray(st["t"]),
                                 st["s"])
            got = ds.poses[s * n0:(s + 1) * n0] if s == 0 else \
                ds.poses[n0:n0 + n1]
            np.testing.assert_allclose(got, want, atol=1e-5)
        # frames load fine
        img, pose, _ = ds[0]
        assert img.shape[0] == 32 and pose.shape == (6,)

    def test_libviso2_one_based_indices(self, tmp_path):
        write_7scenes_vo_fixture(str(tmp_path), vo_lib="libviso2",
                                 n_seqs=1, n_frames=4)
        ds = SevenScenes("chess", str(tmp_path), train=True, image_size=32,
                         real=True, vo_lib="libviso2")
        # the 1-based table indices come back 0-based (seven_scenes.py:84-85)
        assert ds.gt_idx.min() >= 0 and ds.gt_idx.max() <= 3
        assert all(osp.exists(p) for p in ds.c_imgs)

    def test_gt_mode_gt_idx_is_arange(self, tmp_path):
        write_7scenes_fixture(str(tmp_path))
        ds = SevenScenes("chess", str(tmp_path), train=True, image_size=32)
        np.testing.assert_array_equal(ds.gt_idx, np.arange(8))


class TestCambridgeParser:
    def test_parse_and_convention(self, tmp_path):
        rows, stats = write_cambridge_fixture(str(tmp_path))
        ds = CambridgeLandmark("ShopFacade", str(tmp_path), train=True,
                               image_size=32, pose_stats_file=stats)
        assert len(ds) == 6
        import jax.numpy as jnp
        from relpose_gnn_tpu.ops import pose as pose_ops
        name, t_c2w, q = rows[0]
        # stored translation must be t = -R @ c (cambridge_landmark.py:96)
        R = np.asarray(pose_ops.quat2mat(
            jnp.asarray(q, jnp.float32)[None]))[0]
        np.testing.assert_allclose(ds.poses[0, :3], -(R @ t_c2w), atol=1e-4)

    def test_image_normalized(self, tmp_path):
        _, stats = write_cambridge_fixture(str(tmp_path))
        ds = CambridgeLandmark("ShopFacade", str(tmp_path), train=True,
                               image_size=32, pose_stats_file=stats)
        img, _, _ = ds[0]
        # Normalize(0.5, 0.25): range roughly [-2, 2]
        assert img.min() >= -2.01 and img.max() <= 2.01

    def test_seq_id_groups_nonseq_prefixes_distinctly(self, tmp_path):
        """Non-'seqN' path prefixes must get DISTINCT group ids per
        distinct prefix — a shared -1 sentinel would make cross-connect
        exclude the whole database for such datasets (review finding).
        Only 'seq*' rows survive the split parse (reference parity,
        cambridge_landmark.py:54), so the reachable cases are 'seq'
        prefixes with non-numeric suffixes."""
        subdirs = ["seq1", "seq1", "seq2", "seqA", "seqA", "seqB"]
        _, stats = write_cambridge_fixture(str(tmp_path), subdirs=subdirs)
        ds = CambridgeLandmark("ShopFacade", str(tmp_path), train=True,
                               image_size=32, pose_stats_file=stats)
        sid = ds.seq_id
        assert sid[0] == sid[1] == 1 and sid[2] == 2    # seqN parses
        assert sid[3] == sid[4] and sid[3] < 0          # same prefix groups
        assert sid[5] < 0 and sid[5] != sid[3]          # distinct prefixes
        # seqN numeric ids and pseudo-ids never collide
        assert set(sid[sid >= 0]).isdisjoint(set(sid[sid < 0]))


class TestPackedDataset:
    def test_write_read_roundtrip(self, tmp_path):
        root = str(tmp_path / "packed")
        w = PackedGraphWriter(root, num_graphs=3, num_nodes=4, height=8,
                              width=10, mean=[0.4] * 3, std=[0.2] * 3)
        rng = np.random.default_rng(0)
        recs = []
        for _ in range(3):
            img = rng.random((4, 8, 10, 3)).astype(np.float32)
            poses = rng.normal(size=(4, 6)).astype(np.float32)
            adj = rng.random((4, 4)) < 0.5
            w.add(img, poses, adj)
            recs.append((img, poses, adj))
        w.finalize()

        ds = PackedGraphDataset(root)
        assert len(ds) == 3
        b = ds.batch(np.array([1]))
        # uint8 quantization: within 1/255
        np.testing.assert_allclose(b["images"][0] / 255.0, recs[1][0],
                                   atol=1 / 255)
        np.testing.assert_array_equal(b["poses"][0], recs[1][1])
        np.testing.assert_array_equal(b["adj"][0], recs[1][2])

    def test_concat(self, tmp_path):
        roots = []
        for j in range(2):
            root = str(tmp_path / f"p{j}")
            w = PackedGraphWriter(root, num_graphs=2, num_nodes=2, height=4,
                                  width=4, mean=[0] * 3, std=[1] * 3)
            for i in range(2):
                w.add(np.full((2, 4, 4, 3), 0.5, np.float32),
                      np.full((2, 6), j * 10 + i, np.float32),
                      np.ones((2, 2), bool))
            w.finalize()
            roots.append(root)
        cat = ConcatPackedDataset([PackedGraphDataset(r) for r in roots])
        assert len(cat) == 4
        b = cat.batch(np.array([3, 0]))
        assert b["poses"][0, 0, 0] == 11  # dataset 1, record 1
        assert b["poses"][1, 0, 0] == 0


class _ToyDataset:
    """Minimal query/database dataset for the builder."""

    def __init__(self, n, h=8, w=10, seed=0):
        rng = np.random.default_rng(seed)
        self.poses = rng.normal(size=(n, 6)).astype(np.float32)
        self._imgs = rng.random((n, h, w, 3)).astype(np.float32)

    def __len__(self):
        return len(self.poses)

    def load_image(self, i):
        return self._imgs[i]


class TestGraphBuilder:
    def test_build_rand_mode(self, tmp_path):
        ds = _ToyDataset(10)
        cfg = GraphBuilderConfig(seq_len=4, retrieval_mode="RAND")
        out = str(tmp_path / "g")
        n = build_graphs(ds, ds, out, cfg, height=8, width=10)
        assert n == 10
        packed = PackedGraphDataset(out)
        b = packed.batch(np.arange(3))
        assert b["images"].shape == (3, 4, 8, 10, 3)
        # node 0 is the query: pose matches
        np.testing.assert_allclose(b["poses"][:, 0], ds.poses[:3], atol=1e-6)
        # fc adjacency stored
        assert b["adj"][0].sum() == 12

    def test_build_ir_mode_prefers_similar(self, tmp_path):
        n = 30
        ds = _ToyDataset(n)
        desc = np.random.default_rng(3).normal(size=(n, 8))
        desc /= np.linalg.norm(desc, axis=1, keepdims=True)

        def sim(qi):
            return desc @ desc[qi]

        def invalid(qi):
            return self_exclusion_mask(n, qi, True)

        cfg = GraphBuilderConfig(seq_len=4, sampling_period=2, seed=1)
        out = str(tmp_path / "g2")
        written = build_graphs(ds, ds, out, cfg, similarity_fn=sim,
                               invalid_fn=invalid, height=8, width=10)
        assert written == n
        packed = PackedGraphDataset(out)
        b = packed.batch(np.arange(n))
        # neighbors must never be an exact copy of the query image
        q = b["images"][:, 0].astype(np.int32)
        for j in range(1, 4):
            assert (np.abs(q - b["images"][:, j].astype(np.int32))
                    .reshape(n, -1).sum(1) > 0).all()

    def test_skipped_frames_store_is_loadable(self, tmp_path):
        """A corrupt query image shrinks the store: the header records the
        written count while the preallocated memmaps keep their full length;
        the loader must slice, not assert (ADVICE.md r1 #3)."""
        ds = _ToyDataset(10)
        bad = {3, 7}
        orig = ds.load_image
        ds.load_image = lambda i: None if i in bad else orig(i)
        cfg = GraphBuilderConfig(seq_len=4, retrieval_mode="RAND", seed=0)
        out = str(tmp_path / "gskip")
        written = build_graphs(ds, ds, out, cfg, height=8, width=10)
        assert written < 10
        packed = PackedGraphDataset(out)
        assert len(packed) == written
        b = packed.batch(np.arange(written))
        assert b["images"].shape[0] == written
        assert np.isfinite(b["poses"]).all()

    def test_self_exclusion_mask(self):
        m = self_exclusion_mask(10, 3, True)
        assert m[3] and m.sum() == 1
        m2 = self_exclusion_mask(10, 3, True, cross_connect=True,
                                 group_len=5)
        assert m2[:5].all() and not m2[5:].any()
        m3 = self_exclusion_mask(10, 3, False)
        assert not m3.any()

    def test_self_exclusion_mask_seq_ids(self):
        """Cross-connect via per-frame seq ids: the query's WHOLE source
        sequence is excluded (dataset_7Scenes_multi.py:245-252), robust
        to ragged sequences the fixed-block arithmetic can't express."""
        seq_ids = np.array([1, 1, 1, 2, 2, 3, 3, 3, 3], np.int32)
        m = self_exclusion_mask(9, 4, True, cross_connect=True,
                                seq_ids=seq_ids, query_seq=2)
        np.testing.assert_array_equal(
            m, seq_ids == 2)
        # self still excluded even if seq ids disagree (defensive)
        m2 = self_exclusion_mask(9, 0, True, cross_connect=True,
                                 seq_ids=seq_ids, query_seq=2)
        assert m2[0] and m2[3] and m2[4] and m2.sum() == 3

    def test_seven_scenes_seq_id(self, tmp_path):
        write_7scenes_fixture(str(tmp_path), n_seqs=2, n_frames=3)
        from relpose_gnn_tpu.data.seven_scenes import SevenScenes
        ds = SevenScenes("chess", str(tmp_path), train=True, image_size=16)
        np.testing.assert_array_equal(ds.seq_id, [1, 1, 1, 2, 2, 2])

    def test_ir_mode_short_ranking_pads(self, tmp_path):
        """IR retrieval over a DB smaller than seq_len-1 must cycle the
        available neighbors, not crash writer.add with a short nbr_idx
        row (review finding)."""

        class Toy:
            def __init__(self, n):
                rng = np.random.default_rng(1)
                self._imgs = rng.random((n, 8, 8, 3)).astype(np.float32)
                self.poses = rng.normal(size=(n, 6)).astype(np.float32)

            def __len__(self):
                return len(self.poses)

            def load_image(self, i):
                return self._imgs[i]

        query, database = Toy(3), Toy(3)
        cfg = GraphBuilderConfig(seq_len=8, retrieval_mode="IR", seed=0)
        sim = np.eye(3)
        n = build_graphs(query, database, str(tmp_path / "g"), cfg,
                         similarity_fn=lambda qi: sim[qi],
                         invalid_fn=lambda qi: self_exclusion_mask(
                             3, qi, True),
                         height=8, width=8)
        assert n == 3
        ds = PackedGraphDataset(str(tmp_path / "g"))
        assert ds.nbr_idx.shape == (3, 7)
        # every neighbor is a real DB index (no zero-padding artifacts)
        assert (ds.nbr_idx >= 0).all() and (ds.nbr_idx < 3).all()

    def test_ir_mode_all_excluded_skips_query(self, tmp_path):
        """When the retrieval mask excludes EVERY candidate there is no
        legal neighbor: the builder must skip the query with a warning,
        not silently draw neighbors (incl. the query itself) from the
        full DB (review finding)."""
        import warnings as _warnings

        ds = _ToyDataset(6)
        cfg = GraphBuilderConfig(seq_len=4, retrieval_mode="IR", seed=0)
        all_invalid = np.ones(6, bool)
        with _warnings.catch_warnings(record=True) as caught:
            _warnings.simplefilter("always")
            written = build_graphs(
                ds, ds, str(tmp_path / "g"), cfg,
                similarity_fn=lambda qi: np.ones(6),
                invalid_fn=lambda qi: all_invalid,
                height=8, width=10)
        assert written == 0
        assert any("excluded" in str(w.message) for w in caught)


class TestPipeline:
    def _packed(self, tmp_path, n=6):
        root = str(tmp_path / "pp")
        w = PackedGraphWriter(root, num_graphs=n, num_nodes=2, height=4,
                              width=4, mean=[0.5] * 3, std=[0.25] * 3)
        for i in range(n):
            w.add(np.full((2, 4, 4, 3), i / 10, np.float32),
                  np.full((2, 6), i, np.float32), np.ones((2, 2), bool))
        w.finalize()
        return PackedGraphDataset(root)

    def test_iterator_epoch(self, tmp_path):
        ds = self._packed(tmp_path)
        batches = list(data_iterator(ds, batch_size=2, epochs=1))
        assert len(batches) == 3
        seen = sorted(int(b["poses"][i, 0, 0]) for b in batches
                      for i in range(2))
        assert seen == [0, 1, 2, 3, 4, 5]

    def test_device_prefetch_normalizes(self, tmp_path):
        ds = self._packed(tmp_path)
        it = data_iterator(ds, batch_size=2, epochs=1, shuffle=False)
        out = list(device_prefetch(it, ds.mean, ds.std))
        assert len(out) == 3
        img = np.asarray(out[0]["images"])
        # record 0: value 0.0 -> (0 - 0.5) / 0.25 = -2
        np.testing.assert_allclose(img[0], -2.0, atol=0.02)
        assert img.dtype == np.float32


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestSevenScenesDepthModes:
    def test_depth_mode(self, tmp_path):
        write_7scenes_fixture(str(tmp_path))
        ds = SevenScenes("chess", str(tmp_path), train=True, image_size=32,
                         mode=1)
        d, pose, rel = ds[0]
        assert d.ndim == 2 and d.shape[0] == 32
        assert (d >= 0).all()

    def test_rgbd_mode(self, tmp_path):
        write_7scenes_fixture(str(tmp_path))
        ds = SevenScenes("chess", str(tmp_path), train=True, image_size=32,
                         mode=2)
        (c, d), pose, rel = ds[0]
        assert c.shape[2] == 3 and d.ndim == 2


class TestPipelineDeterminism:
    def test_same_seed_same_batches(self, tmp_path):
        root = str(tmp_path / "det")
        w = PackedGraphWriter(root, num_graphs=6, num_nodes=2, height=4,
                              width=4, mean=[0] * 3, std=[1] * 3)
        rng = np.random.default_rng(0)
        for i in range(6):
            w.add(rng.random((2, 4, 4, 3)).astype(np.float32),
                  np.full((2, 6), i, np.float32), np.ones((2, 2), bool))
        w.finalize()
        ds = PackedGraphDataset(root)
        a = [b["poses"][:, 0, 0].tolist()
             for b in data_iterator(ds, 2, seed=5, epochs=1)]
        b = [b["poses"][:, 0, 0].tolist()
             for b in data_iterator(ds, 2, seed=5, epochs=1)]
        c = [b["poses"][:, 0, 0].tolist()
             for b in data_iterator(ds, 2, seed=6, epochs=1)]
        assert a == b
        assert a != c


class TestDeviceSyntheticGenerator:
    def test_matches_contract_and_learnability_structure(self):
        import jax
        from relpose_gnn_tpu.data.synthetic import make_device_batch_fn
        gen = make_device_batch_fn(2, 4, 32, 40, learnable=True)
        b = gen(jax.random.PRNGKey(0))
        assert b["images"].shape == (2, 4, 32, 40, 3)
        assert b["poses"].shape == (2, 4, 6)
        assert b["adj"].shape == (2, 4, 4)
        img = np.asarray(b["images"])
        poses = np.asarray(b["poses"])
        w6 = 40 // 6
        # pose components painted as full-height vertical stripes
        np.testing.assert_allclose(img[0, 1, :, :w6, :],
                                   poses[0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(img[1, 2, :, 5 * w6:6 * w6, :],
                                   poses[1, 2, 5], atol=1e-6)
        # distinct keys -> distinct data
        b2 = gen(jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(b2["poses"]), poses)


class TestTestSplitRgbPaths:
    def test_mapping_and_count_assertion(self, tmp_path):
        from relpose_gnn_tpu.data.seven_scenes import test_split_rgb_paths
        write_7scenes_fixture(str(tmp_path), scene="chess", n_seqs=2,
                              n_frames=3, train=False)
        paths = test_split_rgb_paths(str(tmp_path), "chess",
                                     expected_count=6)
        assert len(paths) == 6
        assert all(p.endswith(".color.png") for p in paths)
        # reference linear order: seq-major, frame-minor (test.py:101-114)
        assert "seq-01" in paths[0] and "seq-02" in paths[-1]
        import pytest as _pytest
        with _pytest.raises(IOError):
            test_split_rgb_paths(str(tmp_path), "chess", expected_count=5)


class TestPrefetchErrorPropagation:
    def test_worker_exception_reaches_consumer(self):
        """A data-pipeline error in the prefetch worker must fail the
        epoch, not silently truncate it (review finding: a swallowed
        per-batch error lets training 'succeed' on a biased data prefix)."""
        import pytest
        from relpose_gnn_tpu.data.pipeline import device_prefetch

        def bad_iter():
            yield {"images": np.zeros((2, 1, 4, 4, 3), np.uint8),
                   "poses": np.zeros((2, 1, 6), np.float32),
                   "adj": np.zeros((2, 1, 1), bool)}
            raise RuntimeError("boom in the loader")

        got = []
        with pytest.raises(RuntimeError, match="boom in the loader"):
            for b in device_prefetch(bad_iter(), np.zeros(3), np.ones(3)):
                got.append(b)
        assert len(got) == 1  # the good batch still flows


class TestConcatDtypePolicy:
    def test_mixed_image_dtypes_rejected_at_construction(self, tmp_path):
        """uint8 + float image stores must fail at ConcatPackedDataset
        construction (the device normalizer keys /255 on uint8), not on
        some later batch that happens to touch both."""
        import pytest
        from relpose_gnn_tpu.data.packed import (ConcatPackedDataset,
                                                 PackedGraphDataset,
                                                 PackedGraphWriter)

        rng = np.random.default_rng(0)
        roots = []
        for i, dt in enumerate(("uint8", "float16")):
            root = str(tmp_path / f"s{i}")
            w = PackedGraphWriter(root, num_graphs=3, num_nodes=2,
                                  height=4, width=4, mean=[0] * 3,
                                  std=[1] * 3, dtype=dt)
            for _ in range(3):
                w.add(rng.random((2, 4, 4, 3)).astype(np.float32),
                      np.zeros((2, 6), np.float32),
                      np.ones((2, 2), bool))
            w.finalize()
            roots.append(root)
        with pytest.raises(ValueError, match="mixed image dtypes"):
            ConcatPackedDataset([PackedGraphDataset(r) for r in roots])

    def test_mixed_shapes_rejected_at_construction(self, tmp_path):
        """Stores with different num_nodes/H/W must fail at construction
        with the offending store named, not mid-epoch on the first
        shuffled batch that mixes members (review finding)."""
        import pytest
        from relpose_gnn_tpu.data.packed import (ConcatPackedDataset,
                                                 PackedGraphDataset,
                                                 PackedGraphWriter)

        rng = np.random.default_rng(0)
        roots = []
        for i, nodes in enumerate((2, 3)):
            root = str(tmp_path / f"m{i}")
            w = PackedGraphWriter(root, num_graphs=2, num_nodes=nodes,
                                  height=4, width=4, mean=[0] * 3,
                                  std=[1] * 3)
            for _ in range(2):
                w.add(rng.random((nodes, 4, 4, 3)).astype(np.float32),
                      np.zeros((nodes, 6), np.float32),
                      np.ones((nodes, nodes), bool))
            w.finalize()
            roots.append(root)
        with pytest.raises(ValueError, match="mixed graph shapes"):
            ConcatPackedDataset([PackedGraphDataset(r) for r in roots])


class TestPerSceneNormalization:
    def test_multiscene_batches_use_each_scenes_stats(self, tmp_path):
        """The reference normalizes EACH scene with its own stats.txt;
        a concat batch must not apply scene 0's stats to other scenes'
        rows (review finding: 6 of 7 scenes trained mis-normalized)."""
        from relpose_gnn_tpu.data.packed import (ConcatPackedDataset,
                                                 PackedGraphDataset,
                                                 PackedGraphWriter)
        from relpose_gnn_tpu.data.pipeline import (data_iterator,
                                                   device_prefetch)

        stats = [([0.2] * 3, [0.5] * 3), ([0.6] * 3, [0.25] * 3)]
        vals = [0.4, 0.8]
        roots = []
        for i, ((m, s), v) in enumerate(zip(stats, vals)):
            root = str(tmp_path / f"sc{i}")
            w = PackedGraphWriter(root, num_graphs=2, num_nodes=2,
                                  height=4, width=4, mean=m, std=s)
            for _ in range(2):
                w.add(np.full((2, 4, 4, 3), v, np.float32),
                      np.zeros((2, 6), np.float32), np.ones((2, 2), bool))
            w.finalize()
            roots.append(root)
        ds = ConcatPackedDataset([PackedGraphDataset(r) for r in roots])
        it = data_iterator(ds, batch_size=4, shuffle=False, epochs=1)
        (batch,) = list(device_prefetch(it, ds.mean, ds.std))
        imgs = np.asarray(batch["images"])
        for i, ((m, s), v) in enumerate(zip(stats, vals)):
            got = imgs[2 * i: 2 * i + 2]
            want = (round(v * 255) / 255.0 - m[0]) / s[0]
            np.testing.assert_allclose(got, want, atol=1e-6)
        # the stats rows were consumed by the normalizer, not leaked into
        # the training step's batch
        assert "norm_mean" not in batch and "norm_std" not in batch
