"""Multi-host (multi-PROCESS) distributed execution, on two CPU processes.

parallel/multihost.py composes per-process local devices into one global
mesh (the DCN layer the reference lacks entirely, SURVEY.md §2.4).  The
end-to-end claim tested here: the SAME dp=8 `run_training` produces the
same per-epoch losses whether the 8 devices live in one process or are
split 4+4 across two OS processes joined by `jax.distributed` (gloo CPU
collectives) — i.e. multi-host assembly (`put_like`) + the sharded train
step + metric reads are process-count-invariant.

Unit tests cover the placement primitive itself on the in-process mesh
(where put_like must be exactly device_put).
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from test_data import write_7scenes_fixture

from relpose_gnn_tpu.data.graph_builder import (GraphBuilderConfig,
                                                build_graphs)
from relpose_gnn_tpu.data.seven_scenes import SevenScenes
from relpose_gnn_tpu.parallel.mesh import create_mesh
from relpose_gnn_tpu.parallel.multihost import host_read, put_like


class TestPutLikeSingleProcess:
    def test_matches_device_put_sharded_and_replicated(self):
        mesh = create_mesh(n_data=4, n_model=2)
        x = np.arange(8 * 6, dtype=np.float32).reshape(8, 6)
        for spec in (P(), P("data"), P(None, "model")):
            sh = NamedSharding(mesh, spec)
            a = put_like(x, sh)
            b = jax.device_put(x, sh)
            assert a.sharding == b.sharding
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_host_read_roundtrip(self):
        mesh = create_mesh(n_data=8, n_model=1)
        x = np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32)
        a = put_like(x, NamedSharding(mesh, P("data")))
        np.testing.assert_array_equal(host_read(a), x)

    def test_scalar_and_zero_dim(self):
        mesh = create_mesh(n_data=8, n_model=1)
        s = put_like(np.float32(3.5), NamedSharding(mesh, P()))
        assert float(s) == 3.5


class _FakeSharding:
    """Stub exposing only addressable_devices_indices_map, for driving
    _local_block's contiguity check with hand-built shard layouts."""

    def __init__(self, idx_map):
        self._idx_map = idx_map

    def addressable_devices_indices_map(self, global_shape):
        return self._idx_map


class TestLocalBlockContiguity:
    """_local_block must accept contiguous (incl. replicated) layouts and
    REJECT non-contiguous addressable shards — the vacuous min/max assert
    it replaced could never fire (review finding)."""

    def test_contiguous_block(self):
        from relpose_gnn_tpu.parallel.multihost import _local_block
        idx_map = {0: (slice(0, 2), slice(None)),
                   1: (slice(2, 4), slice(None))}
        assert _local_block(_FakeSharding(idx_map), (8, 6)) == \
            (slice(0, 4), slice(0, 6))

    def test_replicated_shards_dedup(self):
        from relpose_gnn_tpu.parallel.multihost import _local_block
        # two local devices replicate the same region: volumes dedup
        idx_map = {0: (slice(4, 6), slice(0, 6)),
                   1: (slice(4, 6), slice(0, 6))}
        assert _local_block(_FakeSharding(idx_map), (8, 6)) == \
            (slice(4, 6), slice(0, 6))

    def test_noncontiguous_rejected(self):
        from relpose_gnn_tpu.parallel.multihost import _local_block
        # rows 0-2 and 4-6: the bounding box (0-6) has a hole at 2-4
        idx_map = {0: (slice(0, 2), slice(None)),
                   1: (slice(4, 6), slice(None))}
        with pytest.raises(ValueError, match="contiguous"):
            _local_block(_FakeSharding(idx_map), (8, 6))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _losses(metrics_path: str) -> list:
    with open(metrics_path) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    # skip the per-scene eval-median records (no "loss" key)
    return [r["loss"] for r in recs if "loss" in r]


class TestTwoProcessTraining:
    @pytest.fixture(scope="class")
    def fixture_dirs(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("mh")
        raw, graphs = str(root / "raw"), str(root / "graphs")
        write_7scenes_fixture(raw, scene="chess", n_seqs=2, n_frames=5,
                              train=True, size=(40, 32))
        write_7scenes_fixture(raw, scene="chess", n_seqs=1, n_frames=4,
                              train=False, size=(40, 32))
        train_q = SevenScenes("chess", raw, train=True, image_size=32)
        test_q = SevenScenes("chess", raw, train=False, image_size=32)
        bcfg = GraphBuilderConfig(seq_len=8, retrieval_mode="RAND", seed=0)
        build_graphs(train_q, train_q,
                     osp.join(graphs, "chess_fc8_sp5_train"), bcfg,
                     height=32, width=40)
        build_graphs(test_q, train_q,
                     osp.join(graphs, "chess_fc8_sp5_test"), bcfg,
                     height=32, width=40)
        return root, graphs

    @pytest.mark.slow
    def test_two_process_losses_match_single_process(self, fixture_dirs,
                                                     tmp_path):
        """Both legs run as SUBPROCESSES (the pytest parent stays jax-idle:
        on a 1-core host a third loaded runtime starves the gloo
        rendezvous — measured, the pair then never finishes)."""
        root, graphs = fixture_dirs
        worker = osp.join(osp.dirname(osp.abspath(__file__)),
                          "multihost_worker.py")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS",)}
        env["JAX_PLATFORMS"] = "cpu"

        def run_procs(specs, timeout):
            procs = [subprocess.Popen(
                [sys.executable, worker] + [str(a) for a in args],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
                for args in specs]
            logs = []
            try:
                for p in procs:
                    out, _ = p.communicate(timeout=timeout)
                    logs.append(out.decode())
            finally:
                for p in procs:
                    if p.poll() is None:
                        p.kill()
            for i, p in enumerate(procs):
                assert p.returncode == 0, \
                    f"worker {i} failed:\n{logs[i][-3000:]}"
            best = []
            for log in logs:  # in-loop eval medians (host_read path)
                line = [ln for ln in log.splitlines()
                        if ln.startswith("BEST chess")][-1]
                best.append([float(v) for v in line.split()[2:]])
            return best

        # single-process reference: same dp=8 mesh, one process
        ref_dir = str(tmp_path / "ref")
        ref_ck = str(tmp_path / "ck_ref")
        ref_best = run_procs([(0, "none", graphs, ref_dir, 1, ref_ck)],
                             timeout=540)[0]
        ref_losses = _losses(osp.join(ref_dir, "7Scenes", "chess", "mh",
                                      "metrics.jsonl"))
        assert len(ref_losses) == 2

        # the same mesh split 4+4 across two gloo-joined processes; the
        # checkpoint dir is SHARED between them (each process writes its
        # own array shards, Orbax coordinates via the distributed client)
        coordinator = f"127.0.0.1:{_free_port()}"
        outs = [str(tmp_path / f"p{i}") for i in range(2)]
        pair_ck = str(tmp_path / "ck_pair")
        pair_best = run_procs(
            [(i, coordinator, graphs, outs[i], 2, pair_ck)
             for i in range(2)],
            timeout=540)
        for i in range(2):
            got = _losses(osp.join(outs[i], "7Scenes", "chess", "mh",
                                   "metrics.jsonl"))
            assert len(got) == len(ref_losses), (i, got, ref_losses)
            np.testing.assert_allclose(got, ref_losses, rtol=1e-5,
                                       err_msg=f"process {i} diverged")
            # in-loop eval medians flow through host_read
            # (process_allgather of the cross-process-sharded eval
            # outputs) — every process must see the reference medians
            np.testing.assert_allclose(pair_best[i], ref_best, rtol=1e-5,
                                       err_msg=f"process {i} eval diverged")

        # the MULTI-PROCESS checkpoint (each process wrote its shards to
        # the shared dir) must hold the same full state as the
        # single-process one
        import orbax.checkpoint as ocp
        ref_tree = ocp.CheckpointManager(ref_ck).restore(1)
        # the pair checkpoint's sharding metadata names devices of BOTH
        # processes; restore to host numpy via a template instead
        np_template = jax.tree.map(np.asarray, ref_tree)
        pair_tree = ocp.CheckpointManager(pair_ck).restore(
            1, args=ocp.args.StandardRestore(np_template))
        ref_leaves = jax.tree.leaves(ref_tree)
        pair_leaves = jax.tree.leaves(pair_tree)
        assert len(ref_leaves) == len(pair_leaves) > 10
        for a, b in zip(ref_leaves, pair_leaves):
            # element-wise identity is NOT the claim: gloo's cross-process
            # all-reduce sums in a different order than the intra-process
            # one, and that float32-ULP gradient drift is amplified by
            # Adam's eps-scaled division for individual near-zero-moment
            # weights (measured: worst single element ~1.6e-4 after two
            # steps, everything else <1e-5).  The trajectory claim is
            # carried by the exact loss/median equality above; here assert
            # the full state (params + both Adam moments + step) is the
            # same up to that bounded drift
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape and a.dtype == b.dtype
            assert np.max(np.abs(a - b)) < 1e-3, np.max(np.abs(a - b))

    @pytest.mark.slow
    def test_cross_process_tensor_parallel(self, fixture_dirs, tmp_path):
        """dp=1 x tp=8 split 4+4: the Megatron column/row GNN shards and
        their all-reduce CROSS the process boundary (DCN in production).
        put_like places each process's column/row blocks; losses must
        match the same pure-TP mesh in one process."""
        root, graphs = fixture_dirs
        worker = osp.join(osp.dirname(osp.abspath(__file__)),
                          "multihost_worker.py")
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS",)}
        env["JAX_PLATFORMS"] = "cpu"

        def run(args_list, timeout=540):
            procs = [subprocess.Popen(
                [sys.executable, worker] + [str(a) for a in args],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
                for args in args_list]
            logs = []
            try:
                for p in procs:
                    out, _ = p.communicate(timeout=timeout)
                    logs.append(out.decode())
            finally:
                for p in procs:
                    if p.poll() is None:
                        p.kill()
            for i, p in enumerate(procs):
                assert p.returncode == 0, \
                    f"worker {i} failed:\n{logs[i][-3000:]}"

        ref_dir = str(tmp_path / "tp_ref")
        run([(0, "none", graphs, ref_dir, 1, str(tmp_path / "tpck_r"),
              1, 8)])
        coordinator = f"127.0.0.1:{_free_port()}"
        outs = [str(tmp_path / f"tp{i}") for i in range(2)]
        ck = str(tmp_path / "tpck")  # shared: sharded saves need one dir
        run([(i, coordinator, graphs, outs[i], 2, ck, 1, 8)
             for i in range(2)])
        ref = _losses(osp.join(ref_dir, "7Scenes", "chess", "mh",
                               "metrics.jsonl"))
        for i in range(2):
            got = _losses(osp.join(outs[i], "7Scenes", "chess", "mh",
                                   "metrics.jsonl"))
            np.testing.assert_allclose(got, ref, rtol=1e-5,
                                       err_msg=f"process {i} diverged")
