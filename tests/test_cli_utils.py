"""CLI arg-parsing, profiling utils, NetVLAD index, preprocess_query."""

import os.path as osp
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "cli"))


class TestTrainCLI:
    def test_exp_name_schemes(self):
        import importlib
        train_cli = importlib.import_module("train")
        a = train_cli.parse_args(["--train-data-dir", "/d", "--test-data-dir",
                                  "/d", "--dataset", "7Scenes",
                                  "--experiment", "1", "--test-scene",
                                  "chess"])
        assert a.exp_name == "7Scenes_multi_wo_chess_w_test_chess_seed_0"
        b = train_cli.parse_args(["--train-data-dir", "/d", "--test-data-dir",
                                  "/d", "--experiment", "2",
                                  "--train-scene", "fire", "--test-scene",
                                  "fire", "--seed", "3"])
        assert b.exp_name == "Cambridge_single_w_fire_w_test_fire_seed_3"

    def test_defaults_match_reference(self):
        import importlib
        train_cli = importlib.import_module("train")
        a = train_cli.parse_args(["--train-data-dir", "/d",
                                  "--test-data-dir", "/d"])
        assert a.srq == -2.0 and a.saq == -2.0        # train.py:367-368
        assert a.knn == 4 and a.lr == 1e-4            # train.py:377-378
        assert a.lr_decay_step == 50                  # train.py:379
        assert a.max_epoch == 200 and a.droprate == 0.5

    def test_build_graphs_sp_defaults(self):
        import importlib
        bg = importlib.import_module("build_graphs")
        a = bg.parse_args(["chess", "train", "--data-path", "/d",
                           "--graph-data-path", "/g"])
        assert a.sampling_period is None  # resolved to 5/3 in main()


class TestProfilingUtils:
    def test_step_timer_window(self):
        from relpose_gnn_tpu.utils.profiling import StepTimer
        t = StepTimer(window=5)
        t.start()
        rates = []
        for _ in range(10):
            time.sleep(0.001)
            r = t.step()
            if r is not None:
                rates.append(r)
        assert len(rates) == 2
        assert all(r > 0 for r in rates)

    def test_trace_noop_and_real(self, tmp_path):
        from relpose_gnn_tpu.utils.profiling import trace
        with trace(None):
            pass
        with trace(str(tmp_path / "tr")):
            _ = jnp.ones(4) + 1
        # jax writes a plugins/profile dir
        assert any((tmp_path / "tr").rglob("*")), "no trace artifacts"

    def test_metrics_writer(self, tmp_path):
        import json
        from relpose_gnn_tpu.utils.logging import MetricsWriter
        w = MetricsWriter(str(tmp_path / "m.jsonl"))
        w.write(3, {"loss": jnp.asarray(1.5)}, epoch=0)
        rec = json.loads(open(str(tmp_path / "m.jsonl")).read())
        assert rec["step"] == 3 and rec["loss"] == 1.5


class TestNetVLADIndexSmall:
    def test_build_and_graph_neighbors(self):
        from relpose_gnn_tpu.retrieval.netvlad_index import NetVLADIndex
        idx = NetVLADIndex(batch_size=4, dtype=None, num_clusters=4,
                           image_hw=(32, 32))
        rng = np.random.default_rng(0)
        db = rng.random((10, 32, 32, 3)).astype(np.float32)
        idx.build(db)
        assert idx.descriptors.shape == (10, 4 * 512)
        q = idx.embed(db[3:4])
        scores, top = idx.topk(q, k=3)
        assert top[0, 0] == 3  # self is most similar
        nbrs = idx.graph_neighbors(q[0], k=4, sampling_period=1,
                                   rng=np.random.default_rng(1),
                                   invalid=np.eye(10, dtype=bool)[3])
        assert 3 not in nbrs.tolist()

    def test_add_appends(self):
        from relpose_gnn_tpu.retrieval.netvlad_index import NetVLADIndex
        idx = NetVLADIndex(batch_size=4, dtype=None, num_clusters=4,
                           image_hw=(32, 32))
        rng = np.random.default_rng(2)
        idx.build(rng.random((3, 32, 32, 3)).astype(np.float32))
        idx.add(rng.random((2, 32, 32, 3)).astype(np.float32))
        assert idx.descriptors.shape[0] == 5


class TestPreprocessQuery:
    def test_recenters_and_scales(self):
        from relpose_gnn_tpu.ops import camera
        import jax.numpy as jnp
        Tcw = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
        out = camera.preprocess_query(Tcw, K, jnp.asarray([1.0, 2.0, 3.0]),
                                      out_hw=(24, 32), in_hw=(48, 64))
        # camera at origin, centered on scene_center -> tcw = +center
        np.testing.assert_allclose(np.asarray(out["norm_Tcw"][:, 3]),
                                   [1.0, 2.0, 3.0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["K_scaled"][0, 0]), 50.0)
        np.testing.assert_allclose(np.asarray(out["K_scaled"][1, 2]), 12.0)


class TestSeeding:
    def test_seed_everything_reproducible(self):
        import random
        from relpose_gnn_tpu.utils.seeding import seed_everything, worker_rngs
        k1 = seed_everything(7)
        a = (random.random(), np.random.random())
        k2 = seed_everything(7)
        b = (random.random(), np.random.random())
        assert a == b
        assert np.array_equal(np.asarray(k1), np.asarray(k2))
        rngs = worker_rngs(3, 4)
        vals = [r.random() for r in rngs]
        assert len(set(vals)) == 4  # independent streams


class TestPoseStatsCLI:
    def test_compute_pose_stats(self, tmp_path):
        from test_data import write_cambridge_fixture
        import importlib
        write_cambridge_fixture(str(tmp_path), scene="ShopFacade", n=6)
        out = str(tmp_path / "stats.txt")
        cps = importlib.import_module("compute_pose_stats")
        cps.main(["--data-path", str(tmp_path), "--output", out,
                  "--scenes", "ShopFacade"])
        stats = np.loadtxt(out)
        assert stats.shape == (2, 3)
        assert (stats[1] > 0).all()  # std positive


class TestEvaluateDataset:
    def test_reduces_over_batches(self):
        from relpose_gnn_tpu.evaluation.evaluator import evaluate_dataset
        rng = np.random.default_rng(0)

        def fake_eval_step(state, batch):
            return {"pred": batch["poses"][:, 0] + 0.1,
                    "target": batch["poses"][:, 0]}

        batches = [{"poses": rng.normal(size=(4, 2, 6)).astype(np.float32)}
                   for _ in range(3)]
        err = evaluate_dataset(fake_eval_step, None, batches)
        # constant +0.1 offset on t -> L2 error = 0.1 * sqrt(3)
        np.testing.assert_allclose(err.median_t, 0.1 * np.sqrt(3),
                                   atol=1e-5)
        assert len(err.t_errors) == 12


class TestRetrievalKnob:
    def test_engine_selection(self):
        import importlib
        bg = importlib.import_module("build_graphs")
        assert bg.use_netvlad_for("auto", "7Scenes")
        assert not bg.use_netvlad_for("auto", "Cambridge")
        assert bg.use_netvlad_for("netvlad", "Cambridge")
        assert not bg.use_netvlad_for("vlad", "7Scenes")
        a = bg.parse_args(["chess", "train", "--data-path", "/d",
                           "--graph-data-path", "/g",
                           "--retrieval", "netvlad"])
        assert a.retrieval == "netvlad"


class TestTrainCLIEndToEnd:
    def test_main_runs_one_epoch(self, tmp_path):
        """cli/train.py main() end to end on fixture graph stores."""
        import importlib
        import os.path as osp
        from test_data import write_7scenes_fixture
        from relpose_gnn_tpu.data.graph_builder import (GraphBuilderConfig,
                                                        build_graphs)
        from relpose_gnn_tpu.data.seven_scenes import SevenScenes

        raw = str(tmp_path / "raw")
        graphs = str(tmp_path / "graphs")
        write_7scenes_fixture(raw, scene="fire", n_seqs=1, n_frames=10,
                              train=True, size=(40, 32))
        write_7scenes_fixture(raw, scene="fire", n_seqs=1, n_frames=10,
                              train=False, size=(40, 32))
        ds = SevenScenes("fire", raw, train=True, image_size=32)
        bcfg = GraphBuilderConfig(seq_len=8, retrieval_mode="RAND")
        for split in ("train", "test"):
            build_graphs(ds, ds, osp.join(graphs, f"fire_fc8_sp5_{split}"),
                         bcfg, height=32, width=40)

        train_cli = importlib.import_module("train")
        train_cli.main([
            "--dataset", "7Scenes", "--experiment", "2",
            "--train-scene", "fire", "--test-scene", "fire",
            "--train-data-dir", graphs + "/",
            "--test-data-dir", graphs + "/",
            "--save-dir", str(tmp_path / "out"),
            "--max-epoch", "1", "--batch-size", "3",
            "--backbone", "resnet18", "--feat-dim", "32",
            "--dtype", "float32", "--knn", "2"])
        assert osp.isdir(str(tmp_path / "out"))


class TestVladIndexAlignment:
    """cli/build_graphs._align_vlad_index: index rows (sorted-glob order,
    ORB-failure skips) must be joined to dataset order by path, never
    positionally (review finding: positional use attaches wrong
    images/poses to every graph when the orders differ)."""

    def _index(self, tmp_path, paths, desc):
        import pickle
        ipath = str(tmp_path / "idx.pkl")
        with open(ipath, "wb") as f:
            pickle.dump({"centers": np.zeros((2, 8), np.float32),
                         "descriptors": desc}, f)
        with open(ipath + ".paths.txt", "w") as f:
            f.write("\n".join(paths))
        return ipath

    def _ds(self, paths):
        class DS:
            c_imgs = paths

            def __len__(self):
                return len(self.c_imgs)
        return DS()

    def test_reorders_and_masks_missing(self, tmp_path):
        import importlib
        bg = importlib.import_module("build_graphs")
        from relpose_gnn_tpu.retrieval.vlad import VLADIndex

        desc = np.arange(6, dtype=np.float32).reshape(3, 2)
        # index in lexicographic order; dataset in txt order (reversed),
        # with one frame ('seq1/c.png') absent from the index
        ipath = self._index(tmp_path,
                            ["/x/seq1/a.png", "/x/seq1/b.png",
                             "/x/seq2/z.png"], desc)
        ds = self._ds(["/raw/seq2/z.png", "/raw/seq1/c.png",
                       "/raw/seq1/a.png"])
        aligned, missing = bg._align_vlad_index(VLADIndex.load(ipath),
                                                ipath, ds)
        np.testing.assert_array_equal(aligned[0], desc[2])  # seq2/z
        np.testing.assert_array_equal(aligned[2], desc[0])  # seq1/a
        np.testing.assert_array_equal(missing, [False, True, False])

    def test_stale_paths_file_rejected(self, tmp_path):
        import importlib

        import pytest
        bg = importlib.import_module("build_graphs")
        from relpose_gnn_tpu.retrieval.vlad import VLADIndex

        ipath = self._index(tmp_path, ["/x/seq1/a.png"],
                            np.zeros((2, 2), np.float32))
        with pytest.raises(ValueError, match="stale index"):
            bg._align_vlad_index(VLADIndex.load(ipath), ipath,
                                 self._ds(["/r/seq1/a.png"]))

    def test_legacy_index_without_paths_requires_length_match(
            self, tmp_path):
        import importlib
        import os

        import pytest
        bg = importlib.import_module("build_graphs")
        from relpose_gnn_tpu.retrieval.vlad import VLADIndex

        ipath = self._index(tmp_path, ["/x/seq1/a.png", "/x/seq1/b.png"],
                            np.zeros((2, 2), np.float32))
        os.remove(ipath + ".paths.txt")
        idx = VLADIndex.load(ipath)
        # matching length: passes through positionally with a warning
        aligned, missing = bg._align_vlad_index(
            idx, ipath, self._ds(["/r/seq1/a.png", "/r/seq1/b.png"]))
        assert aligned.shape == (2, 2) and not missing.any()
        with pytest.raises(ValueError, match="rebuild the index"):
            bg._align_vlad_index(idx, ipath, self._ds(["/r/seq1/a.png"]))
