"""Tests for camera geometry ops and sequence metadata tooling."""

import os.path as osp
import pickle

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from test_data import write_7scenes_fixture

from relpose_gnn_tpu.data import sequences
from relpose_gnn_tpu.ops import camera


class TestProjectiveOps:
    def _K(self, fx=500.0, fy=480.0, cx=320.0, cy=240.0):
        return np.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)

    def test_pi_pi_inv_roundtrip(self):
        rng = np.random.default_rng(0)
        K = np.stack([self._K(), self._K(600, 600, 100, 80)])
        x2d = rng.uniform(0, 600, size=(2, 50, 2)).astype(np.float32)
        d = rng.uniform(0.5, 5.0, size=(2, 50, 1)).astype(np.float32)
        X = camera.pi_inv(jnp.asarray(K), jnp.asarray(x2d), jnp.asarray(d))
        x2d_back, d_back = camera.pi(jnp.asarray(K), X)
        np.testing.assert_allclose(np.asarray(x2d_back), x2d, atol=1e-2)
        np.testing.assert_allclose(np.asarray(d_back), d, atol=1e-5)

    def test_inv_pose(self):
        rng = np.random.default_rng(1)
        R = Rotation.random(3, rng=rng).as_matrix().astype(np.float32)
        t = rng.normal(size=(3, 3)).astype(np.float32)
        Ri, ti = camera.inv_pose(jnp.asarray(R), jnp.asarray(t))
        for b in range(3):
            T = np.eye(4)
            T[:3, :3], T[:3, 3] = R[b], t[b]
            Tinv = np.linalg.inv(T)
            np.testing.assert_allclose(np.asarray(Ri)[b], Tinv[:3, :3],
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(ti)[b], Tinv[:3, 3],
                                       atol=1e-5)

    def test_transform_points(self):
        rng = np.random.default_rng(2)
        R = Rotation.random(rng=rng).as_matrix().astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        X = rng.normal(size=(10, 3)).astype(np.float32)
        got = camera.transform_points(jnp.asarray(R), jnp.asarray(t),
                                      jnp.asarray(X))
        np.testing.assert_allclose(np.asarray(got), X @ R.T + t, atol=1e-5)

    def test_camera_center(self):
        rng = np.random.default_rng(3)
        R = Rotation.random(rng=rng).as_matrix().astype(np.float32)
        c = rng.normal(size=3).astype(np.float32)
        t = -R @ c  # Tcw built from center c
        got = camera.camera_center_from_Tcw(jnp.asarray(R), jnp.asarray(t))
        np.testing.assert_allclose(np.asarray(got), c, atol=1e-5)

    def test_decode_depth(self):
        d = np.array([[0, 1000, 65535], [500, 2500, 65535]], np.uint16)
        got = np.asarray(camera.decode_depth_mm(jnp.asarray(d)))
        np.testing.assert_allclose(got, [[0, 1.0, 0], [0.5, 2.5, 0]])

    def test_preprocess_scene_world_points(self):
        """Back-projected points must land at known world coordinates."""
        h, w = 4, 6
        K = self._K(fx=2.0, fy=2.0, cx=w / 2, cy=h / 2)
        depth = np.full((1, h, w), 2.0, np.float32)
        rgb = np.zeros((1, h, w, 3), np.float32)
        # camera at origin looking down +z: Tcw = identity
        Tcw = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)[None] \
            .astype(np.float32)
        out = camera.preprocess_scene(jnp.asarray(rgb), jnp.asarray(depth),
                                      jnp.asarray(K)[None],
                                      jnp.asarray(Tcw))
        Xw = np.asarray(out["X_world"])[0] + np.asarray(out["scene_center"])
        # pixel (cx, cy) unprojects to (0, 0, 2)
        np.testing.assert_allclose(Xw[h // 2, w // 2], [0, 0, 2], atol=1e-5)
        assert out["scene_input"].shape == (1, h, w, 6)
        assert bool(out["valid_mask"].all())

    def test_rel_metrics(self):
        rng = np.random.default_rng(4)
        R1 = Rotation.random(rng=rng)
        ang = 25.0
        R2 = R1 * Rotation.from_euler("x", ang, degrees=True)
        T1 = np.concatenate([R1.as_matrix(), np.zeros((3, 1))], 1) \
            .astype(np.float32)
        T2 = np.concatenate([R2.as_matrix(), np.ones((3, 1))], 1) \
            .astype(np.float32)
        got_ang = float(camera.rel_rot_angle(jnp.asarray(T1),
                                             jnp.asarray(T2)))
        np.testing.assert_allclose(got_ang, ang, atol=0.1)
        d = float(camera.rel_distance(jnp.asarray(T1), jnp.asarray(T2)))
        assert d > 0

    def test_crop_by_intrinsic(self):
        img = (np.random.default_rng(5).random((64, 96, 3)) * 255) \
            .astype(np.uint8)
        cur_k = self._K(fx=100, fy=100, cx=48, cy=32)
        new_k = self._K(fx=120, fy=120, cx=40, cy=28)
        out = camera.crop_by_intrinsic(img, cur_k, new_k)
        assert out.shape == (56, 80, 3)


class TestSequences:
    def test_scene_to_frame_seq_inverts_pose(self, tmp_path):
        write_7scenes_fixture(str(tmp_path), scene="chess", n_seqs=1,
                              n_frames=3)
        seq = sequences.scene_to_frame_seq(str(tmp_path / "chess"),
                                           "seq-01")
        assert len(seq) == 3
        Twc = np.loadtxt(
            str(tmp_path / "chess/seq-01/frame-000000.pose.txt"))
        Tcw = seq.frames[0]["extrinsic_Tcw"]
        # Tcw @ Twc == identity
        full = np.eye(4)
        full[:3] = Tcw
        np.testing.assert_allclose((full @ Twc)[:3], np.eye(4)[:3],
                                   atol=1e-4)

    def test_json_roundtrip(self, tmp_path):
        write_7scenes_fixture(str(tmp_path), scene="chess", n_seqs=1,
                              n_frames=2)
        seq = sequences.scene_to_frame_seq(str(tmp_path / "chess"),
                                           "seq-01")
        p = str(tmp_path / "seq.json")
        seq.dump_json(p)
        seq2 = sequences.FrameSeq(p)
        assert len(seq2) == 2
        np.testing.assert_allclose(seq2.frames[1]["extrinsic_Tcw"],
                                   seq.frames[1]["extrinsic_Tcw"],
                                   atol=1e-6)

    def test_scenes_to_sequences_bins(self, tmp_path):
        write_7scenes_fixture(str(tmp_path), scene="chess", n_seqs=2,
                              n_frames=3, train=True)
        write_7scenes_fixture(str(tmp_path), scene="chess", n_seqs=1,
                              n_frames=3, train=False)
        out = sequences.scenes_to_sequences(str(tmp_path / "chess"),
                                            str(tmp_path / "out"))
        assert osp.isfile(out["train"]) and osp.isfile(out["test"])
        train = sequences.load_frames_bin(out["train"])
        assert len(train) == 6  # 2 seqs x 3 frames
        with open(out["test"], "rb") as f:
            test = pickle.load(f)
        assert len(test) == 3
        # strided load
        assert len(sequences.load_frames_bin(out["train"], 2)) == 3
        # K.txt written
        assert osp.isfile(str(tmp_path / "out/seq-01/K.txt"))

    def test_K_from_frame(self):
        f = {"camera_intrinsic": np.asarray([585, 585, 320, 240, 0, 0])}
        K = sequences.K_from_frame(f)
        np.testing.assert_allclose(
            K, [[585, 0, 320], [0, 585, 240], [0, 0, 1]])


class TestPnP:
    def test_recovers_known_pose(self):
        rng = np.random.default_rng(7)
        R_true = Rotation.from_euler("xyz", [0.2, -0.1, 0.3]).as_matrix()
        t_true = np.array([0.5, -0.2, 2.0])
        K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        X_world = rng.uniform(-1, 1, size=(60, 3)) + [0, 0, 4]
        X_cam = X_world @ R_true.T + t_true
        x = X_cam[:, 0] / X_cam[:, 2] * 500 + 320
        y = X_cam[:, 1] / X_cam[:, 2] * 500 + 240
        x_2d = np.stack([x, y], axis=1)
        out = camera.solve_pnp_ransac(x_2d, X_world, K)
        assert out is not None
        R, t, mask = out
        np.testing.assert_allclose(R, R_true, atol=1e-3)
        np.testing.assert_allclose(t, t_true, atol=1e-2)
        assert mask.mean() > 0.9


class TestTumIngest:
    """E3 ingest direction (tum_seq2ares.py:78-143): FrameSeq ->
    rdpose_associate.txt -> read_tum_sequence round-trips poses, names,
    timestamps; rd_associate (no poses) yields identity extrinsics."""

    def _make_seq(self, n=5, seed=3):
        from relpose_gnn_tpu.data.sequences import FrameSeq
        rng = np.random.default_rng(seed)
        seq = FrameSeq()
        for i in range(n):
            R = Rotation.random(rng=rng).as_matrix()
            t = rng.normal(size=3)
            Tcw = np.concatenate([R, t[:, None]], 1)
            seq.append_frame(i, f"rgb/{i:04d}.png", Tcw,
                             (525.0, 525.0, 319.5, 239.5, 0, 0),
                             (480, 640), timestamp=1000.0 + i * 0.033,
                             depth_file_name=f"depth/{i:04d}.png")
        return seq

    def test_associate_roundtrip(self, tmp_path):
        from relpose_gnn_tpu.data.sequences import (export_tum_associate,
                                                    read_tum_sequence)
        seq = self._make_seq()
        d = tmp_path / "rgbd_dataset_freiburg1_room"
        d.mkdir()
        export_tum_associate(seq, str(d / "rdpose_associate.txt"))
        got = read_tum_sequence(str(tmp_path),
                                "rgbd_dataset_freiburg1_room")
        assert len(got) == len(seq)
        for a, b in zip(seq.frames, got.frames):
            np.testing.assert_allclose(b["extrinsic_Tcw"],
                                       a["extrinsic_Tcw"], atol=1e-5)
            assert b["file_name"].endswith(a["file_name"])
            assert b["depth_file_name"].endswith(a["depth_file_name"])
            assert abs(b["timestamp"] - a["timestamp"]) < 1e-6
            np.testing.assert_array_equal(b["camera_intrinsic"],
                                          np.float32([525, 525, 319.5,
                                                      239.5, 0, 0]))

    def test_no_pose_variant_and_missing(self, tmp_path):
        from relpose_gnn_tpu.data.sequences import read_tum_sequence
        d = tmp_path / "seqA"
        d.mkdir()
        with open(d / "rd_associate.txt", "w") as f:
            f.write("# comment\n")
            f.write("1000.1 rgb/a.png 1000.1 depth/a.png\n")
        got = read_tum_sequence(str(tmp_path), "seqA")
        assert len(got) == 1
        np.testing.assert_array_equal(got.frames[0]["extrinsic_Tcw"],
                                      np.eye(4, dtype=np.float32)[:3])
        with pytest.raises(FileNotFoundError, match="associate"):
            read_tum_sequence(str(tmp_path), "nope")

    def test_seq_to_json(self, tmp_path):
        from relpose_gnn_tpu.data.sequences import (FrameSeq,
                                                    export_tum_associate,
                                                    tum_seq_to_json)
        seq = self._make_seq(3)
        d = tmp_path / "s"
        d.mkdir()
        export_tum_associate(seq, str(d / "rdpose_associate.txt"))
        out = str(tmp_path / "seq.json")
        tum_seq_to_json(str(tmp_path), "s", out)
        loaded = FrameSeq(out)
        assert len(loaded) == 3
        np.testing.assert_allclose(loaded.frames[1]["extrinsic_Tcw"],
                                   seq.frames[1]["extrinsic_Tcw"],
                                   atol=1e-5)
