"""Device-cache feed (data/device_cache.py): the HBM-pinned gather path
must be BITWISE identical to the host feed (data_iterator ->
device_prefetch) — shuffle order, normalization, everything — for both
single stores and multi-scene Concat stores with per-record stats."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.data.device_cache import DeviceCachedFeed
from relpose_gnn_tpu.data.packed import (ConcatPackedDataset,
                                         PackedGraphDataset,
                                         PackedGraphWriter)
from relpose_gnn_tpu.data.pipeline import data_iterator, device_prefetch


def _store(root, n, mean, std, seed=0, nodes=3, h=6, w=8):
    wr = PackedGraphWriter(str(root), num_graphs=n, num_nodes=nodes,
                           height=h, width=w, mean=mean, std=std)
    rng = np.random.default_rng(seed)
    for _ in range(n):
        wr.add(rng.random((nodes, h, w, 3)).astype(np.float32),
               rng.normal(size=(nodes, 6)).astype(np.float32),
               rng.random((nodes, nodes)) < 0.5)
    wr.finalize()
    return PackedGraphDataset(str(root))


@pytest.fixture(scope="module")
def stores(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache")
    a = _store(root / "a", 7, [0.45, 0.4, 0.38], [0.2, 0.22, 0.21], seed=1)
    b = _store(root / "b", 5, [0.5, 0.5, 0.5], [0.25, 0.24, 0.26], seed=2)
    return a, b


def _pairs(cached_iter, host_iter):
    pairs = list(zip(cached_iter, host_iter, strict=True))
    assert pairs
    return pairs


class TestBitwiseEquality:
    def test_single_store_epoch(self, stores):
        ds, _ = stores
        feed = DeviceCachedFeed(ds)
        it = data_iterator(ds, batch_size=3, seed=11, epochs=1)
        for got, want in _pairs(feed.epoch(seed=11, batch_size=3),
                                device_prefetch(it, ds.mean, ds.std)):
            for k in want:
                np.testing.assert_array_equal(np.asarray(got[k]),
                                              np.asarray(want[k]), err_msg=k)

    def test_concat_per_record_stats(self, stores):
        cat = ConcatPackedDataset(list(stores))
        feed = DeviceCachedFeed(cat)
        it = data_iterator(cat, batch_size=4, seed=5, epochs=1)
        for got, want in _pairs(feed.epoch(seed=5, batch_size=4),
                                device_prefetch(it, cat.mean, cat.std)):
            assert set(got) == set(want) == {"images", "poses", "adj"}
            for k in want:
                np.testing.assert_array_equal(np.asarray(got[k]),
                                              np.asarray(want[k]), err_msg=k)

    def test_eval_batches_cover_ragged_tail(self, stores):
        ds, _ = stores  # 7 graphs, batch 3 -> 3+3+1
        feed = DeviceCachedFeed(ds)
        out = list(feed.eval_batches(batch_size=3))
        assert [v for _, v in out] == [3, 3, 1]
        got = np.concatenate([np.asarray(b["poses"])[:v] for b, v in out])
        it = data_iterator(ds, batch_size=3, shuffle=False, epochs=1,
                           drop_remainder=False)
        want = np.concatenate([
            np.asarray(b["poses"])
            for b in device_prefetch(it, ds.mean, ds.std)])
        np.testing.assert_array_equal(got, want)


class TestTrainingIntegration:
    def test_run_training_cached_equals_host(self, stores, tmp_path):
        """The full driver (run_training) with device_cache=True must end
        at bitwise-identical params to the host-feed run."""
        from relpose_gnn_tpu.training.experiment import (ExperimentConfig,
                                                         run_training)
        a, _ = stores
        root = tmp_path / "data"
        root.mkdir()
        import shutil
        for s in ("chess", "fire", "heads", "office", "pumpkin",
                  "redkitchen", "stairs"):
            for split in ("train", "test"):
                shutil.copytree(a.root, root / f"{s}_fc3_sp5_{split}")

        def run(cache, out):
            cfg = ExperimentConfig(
                dataset="7Scenes", experiment=2, train_scene="chess",
                test_scene="chess", train_data_dir=str(root),
                test_data_dir=str(root), save_dir=str(tmp_path / out),
                exp_name="t", model_name="R3", batch_size=3, seq_len=3,
                max_epoch=2, eval_after_epoch=0, ckpt_epochs=(), knn=2,
                feat_dim=16, backbone="resnet18", droprate=0.0,
                dtype="float32", device_cache=cache)
            return run_training(cfg)

        host = run(False, "h")
        cached = run(True, "c")
        for x, y in zip(jax.tree.leaves(host["state"].params),
                        jax.tree.leaves(cached["state"].params),
                        strict=True):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert host["best"] == cached["best"]

    def test_mesh_rejects_device_cache(self, stores, tmp_path):
        from relpose_gnn_tpu.training.experiment import (ExperimentConfig,
                                                         run_training)
        a, _ = stores
        root = tmp_path / "d"
        root.mkdir()
        import shutil
        shutil.copytree(a.root, root / "chess_fc3_sp5_train")
        shutil.copytree(a.root, root / "chess_fc3_sp5_test")
        cfg = ExperimentConfig(
            dataset="7Scenes", experiment=2, train_scene="chess",
            test_scene="chess", train_data_dir=str(root),
            test_data_dir=str(root), save_dir=str(tmp_path / "o"),
            exp_name="t", batch_size=2, seq_len=3, max_epoch=1, knn=2,
            feat_dim=16, backbone="resnet18", dtype="float32",
            mesh_data=2, device_cache=True)
        with pytest.raises(ValueError, match="single-chip"):
            run_training(cfg)
        # regression: jax.set_mesh applies globally at CALL time, so a
        # rejection raised between creating the context manager and
        # entering it used to leak the 2x1 mesh into the process-global
        # abstract mesh, poisoning every later trace (the 4x2 mesh test
        # in test_experiment.py failed with a mesh-mismatch
        # ShardingTypeError).  run_training must not disturb the ambient
        # mesh on the error path.
        assert not jax.sharding.get_abstract_mesh().shape_tuple, \
            "run_training leaked a global mesh on the rejection path"
