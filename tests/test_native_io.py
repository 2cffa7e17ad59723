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
