"""Synthetic multi-scene generator (data/synthetic_scenes.py): the written
raw layout must parse through the REAL SevenScenes loader with the image
stripes decoding back to the loader's own pose6."""

import numpy as np

from relpose_gnn_tpu.data import synthetic_scenes as S
from relpose_gnn_tpu.data.seven_scenes import SevenScenes, load_scene_stats


def test_roundtrip_through_loader(tmp_path):
    root, stats = str(tmp_path / "raw"), str(tmp_path / "stats")
    S.generate_scene(root, "chess", n_train_seqs=2, n_test_seqs=1,
                     frames_per_seq=5, height=32, width=42, seed=3,
                     stats_root=stats)
    for train, n_want in ((True, 10), (False, 5)):
        ds = SevenScenes("chess", root, train=train, image_size=32)
        assert len(ds) == n_want
        w6 = 42 // 6
        for i in (0, n_want - 1):
            img = ds.load_image(i)
            assert img.shape == (32, 42, 3)
            pose = ds.poses[i]
            # decode each stripe's mean back to the pose component
            for c in range(6):
                stripe = img[:, c * w6:(c + 1) * w6, :].mean()
                dec = (stripe - 0.5) / S._GAINS[c]
                assert abs(dec - pose[c]) < 0.02, (train, i, c, dec, pose[c])
    mean, std = load_scene_stats(stats, "chess")
    assert mean.shape == (3,) and (std > 0).all()


def test_poses_within_encoder_range(tmp_path):
    S.generate_scene(str(tmp_path), "fire", n_train_seqs=1, n_test_seqs=1,
                     frames_per_seq=40, height=16, width=24, seed=9)
    ds = SevenScenes("fire", str(tmp_path), train=True, image_size=16)
    assert np.abs(ds.poses[:, :3]).max() <= 1.6
    assert np.abs(ds.poses[:, 3:]).max() <= 0.56


def test_builder_consumes_generated_scene(tmp_path):
    from relpose_gnn_tpu.data.graph_builder import (GraphBuilderConfig,
                                                    build_graphs)
    from relpose_gnn_tpu.data.packed import PackedGraphDataset

    root = str(tmp_path / "raw")
    S.generate_scene(root, "heads", n_train_seqs=1, n_test_seqs=1,
                     frames_per_seq=6, height=24, width=30, seed=1)
    q = SevenScenes("heads", root, train=True, image_size=24)
    out = str(tmp_path / "heads_fc4_sp5_train")
    n = build_graphs(q, q, out, GraphBuilderConfig(
        seq_len=4, retrieval_mode="RAND", seed=0), height=24, width=30)
    assert n == 6
    ds = PackedGraphDataset(out)
    b = ds.batch(np.arange(2))
    assert b["images"].shape == (2, 4, 24, 30, 3)
