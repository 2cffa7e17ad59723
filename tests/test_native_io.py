"""Native C++ graphio runtime tests (skipped when g++ is unavailable)."""

import numpy as np
import pytest

from relpose_gnn_tpu.data import native_io
from relpose_gnn_tpu.data.packed import PackedGraphWriter

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="native graphio unavailable")


def make_packed(tmp_path, n=10, nodes=3, h=6, w=8):
    root = str(tmp_path / "packed")
    wtr = PackedGraphWriter(root, num_graphs=n, num_nodes=nodes, height=h,
                            width=w, mean=[0] * 3, std=[1] * 3)
    rng = np.random.default_rng(0)
    recs = []
    for i in range(n):
        img = rng.random((nodes, h, w, 3)).astype(np.float32)
        poses = np.full((nodes, 6), i, np.float32)
        adj = rng.random((nodes, nodes)) < 0.5
        wtr.add(img, poses, adj)
        recs.append((img, poses, adj))
    wtr.finalize()
    return root, recs


class TestNativeArray:
    def test_gather_matches_memmap(self, tmp_path):
        root, recs = make_packed(tmp_path)
        arr = native_io.NativeArray(root + "/poses.npy")
        assert arr.shape == (10, 3, 6)
        idx = np.array([7, 2, 9, 0])
        out = arr.gather(idx)
        for k, i in enumerate(idx):
            np.testing.assert_array_equal(out[k], recs[i][1])
        arr.close()

    def test_gather_images_threads(self, tmp_path):
        root, recs = make_packed(tmp_path)
        arr = native_io.NativeArray(root + "/images.npy")
        idx = np.arange(10)[::-1].copy()
        out = arr.gather(idx, threads=4)
        ref = np.load(root + "/images.npy", mmap_mode="r")
        np.testing.assert_array_equal(out, np.asarray(ref)[idx])
        arr.close()


class TestNativeBatchLoader:
    def test_epoch_covers_dataset(self, tmp_path):
        root, recs = make_packed(tmp_path, n=9)
        loader = native_io.NativeBatchLoader(root, threads=2)
        rng = np.random.default_rng(1)
        seen = []
        for batch in loader.epoch(rng, batch_size=3):
            assert set(batch.keys()) == {"images", "poses", "adj"}
            assert batch["images"].shape == (3, 3, 6, 8, 3)
            seen.extend(batch["poses"][:, 0, 0].astype(int).tolist())
        assert sorted(seen) == list(range(9))
        loader.close()

    def test_batches_match_source(self, tmp_path):
        root, recs = make_packed(tmp_path, n=6)
        loader = native_io.NativeBatchLoader(root, threads=2)
        rng = np.random.default_rng(2)
        for batch in loader.epoch(rng, batch_size=2, shuffle=False):
            i0 = int(batch["poses"][0, 0, 0])
            np.testing.assert_array_equal(batch["adj"][0], recs[i0][2])
        loader.close()

    def test_no_drop_remainder(self, tmp_path):
        root, _ = make_packed(tmp_path, n=7)
        loader = native_io.NativeBatchLoader(root, threads=2)
        total = sum(len(b["poses"]) for b in loader.epoch(
            np.random.default_rng(0), batch_size=3, drop_remainder=False))
        assert total == 7
        loader.close()


class TestNativeBatchLoaderShrunkStore:
    def test_loader_respects_meta_num_graphs(self, tmp_path):
        """A shrunk store (skipped frames: meta num_graphs < memmap rows)
        must not feed the unwritten all-zero tail records."""
        import json
        import os.path as osp
        root, recs = make_packed(tmp_path, n=8)
        meta_path = osp.join(root, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["num_graphs"] = 5
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        loader = native_io.NativeBatchLoader(root)
        try:
            assert len(loader) == 5
            seen = []
            for b in loader.epoch(np.random.default_rng(0), batch_size=2,
                                  shuffle=True, drop_remainder=False):
                seen.extend(b["poses"][:, 0, 0].tolist())
            assert sorted(seen) == [0.0, 1.0, 2.0, 3.0, 4.0]
        finally:
            loader.close()


class TestNativePipelineIntegration:
    def test_native_data_iterator(self, tmp_path):
        from relpose_gnn_tpu.data.pipeline import native_data_iterator
        root, recs = make_packed(tmp_path, n=8)
        seen = []
        for batch in native_data_iterator(root, batch_size=4, epochs=2,
                                          shuffle=True, threads=2):
            assert batch["images"].shape[0] == 4
            seen.extend(batch["poses"][:, 0, 0].astype(int).tolist())
        assert len(seen) == 16  # 2 epochs x 8
        assert sorted(set(seen)) == list(range(8))


class TestNativeConcatDataset:
    def _two_stores(self, tmp_path):
        roots = []
        for j in range(2):
            root = str(tmp_path / f"s{j}")
            w = PackedGraphWriter(root, num_graphs=4, num_nodes=3, height=6,
                                  width=8, mean=[0.1 * j] * 3, std=[1] * 3)
            rng = np.random.default_rng(j)
            for i in range(4):
                w.add(rng.random((3, 6, 8, 3)).astype(np.float32),
                      np.full((3, 6), j * 10 + i, np.float32),
                      rng.random((3, 3)) < 0.5)
            w.finalize()
            roots.append(root)
        return roots

    def test_matches_concat_packed(self, tmp_path):
        from relpose_gnn_tpu.data.packed import (ConcatPackedDataset,
                                                 PackedGraphDataset)
        roots = self._two_stores(tmp_path)
        nat = native_io.NativeConcatDataset(roots)
        ref = ConcatPackedDataset([PackedGraphDataset(r) for r in roots])
        assert len(nat) == len(ref) == 8
        idx = np.array([6, 1, 3, 7, 0])
        got = nat.batch(idx)
        want = ref.batch(idx)
        # rows may come back grouped by store — compare as pose-keyed sets
        def keyed(b):
            return {float(b["poses"][i, 0, 0]):
                    (b["images"][i].tobytes(), b["adj"][i].tobytes())
                    for i in range(len(idx))}
        assert keyed(got) == keyed(want)
        np.testing.assert_allclose(nat.mean, ref.mean)
        nat.close()

    def test_respects_shrunk_store_header(self, tmp_path):
        """A store whose header says fewer graphs than its memmap rows must
        be truncated to the header count."""
        import json
        import os.path as osp
        roots = self._two_stores(tmp_path)
        meta_path = osp.join(roots[0], "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["num_graphs"] = 2
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        nat = native_io.NativeConcatDataset(roots)
        assert len(nat) == 6
        b = nat.batch(np.arange(6))
        # global index 2 now maps to store 1 record 0 (pose value 10)
        assert sorted(b["poses"][:, 0, 0].tolist()) == [0, 1, 10, 11, 12, 13]
        nat.close()

    def test_run_training_uses_native_feed(self, tmp_path):
        """Integration: run_training picks the native feed when available
        (log line) and trains normally."""
        import sys
        sys.path.insert(0, "tests")
        from test_data import write_7scenes_fixture
        from relpose_gnn_tpu.data.graph_builder import (GraphBuilderConfig,
                                                        build_graphs)
        from relpose_gnn_tpu.data.seven_scenes import SevenScenes
        from relpose_gnn_tpu.training.experiment import (ExperimentConfig,
                                                         run_training)
        raw = str(tmp_path / "raw")
        graphs = str(tmp_path / "graphs")
        write_7scenes_fixture(raw, scene="chess", n_seqs=1, n_frames=6,
                              train=True, size=(40, 32))
        ds = SevenScenes("chess", raw, train=True, image_size=32)
        build_graphs(ds, ds, graphs + "/chess_fc4_sp5_train",
                     GraphBuilderConfig(seq_len=4, retrieval_mode="RAND"),
                     height=32, width=40)
        build_graphs(ds, ds, graphs + "/chess_fc4_sp5_test",
                     GraphBuilderConfig(seq_len=4, retrieval_mode="RAND"),
                     height=32, width=40)
        cfg = ExperimentConfig(
            dataset="7Scenes", experiment=2, train_scene="chess",
            test_scene="chess", train_data_dir=graphs + "/",
            test_data_dir=graphs + "/", save_dir=str(tmp_path / "out"),
            exp_name="nat", model_name="R3", backbone="resnet18",
            feat_dim=32, batch_size=3, seq_len=4, max_epoch=1,
            dtype="float32", knn=2)
        out = run_training(cfg)
        assert int(out["state"].step) > 0
        log = (tmp_path / "out/7Scenes/chess/nat/logger.log").read_text()
        assert "native C++ graphio" in log
