"""Multi-host SERVING (cli/serve.py --coordinator/--mesh-data): the same
dp=8 mesh serve must produce per-item identical poses whether the 8
devices live in one process or are split 4+4 across two gloo-joined
processes (put_like shards each query batch, host_read gathers results).

NOTE the contract this test deliberately does NOT assert: mesh outputs vs
the SINGLE-DEVICE service — different shardings re-tile the convs and
flip near-tie retrieval rankings (tests/test_sharding.py docstring), so
only same-sharding/process-count comparisons are valid.

All legs run as SUBPROCESSES (pytest parent stays jax-idle: a third
loaded runtime on this 1-core host starves the gloo rendezvous —
tests/test_multihost.py)."""

import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
_SERVE = osp.join(_REPO, "cli", "serve.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _serve_args(tmp, out, extra):
    return [sys.executable, _SERVE, "--dataset", "7Scenes", "--scene",
            "chess", "--data-path", f"{tmp}/raw", "--stats-path",
            f"{tmp}/stats", "--backbone", "resnet18", "--feat-dim", "32",
            "--seq-len", "4", "--image-size", "32", "--batch-size", "8",
            "--dtype", "float32", "--retrieval-mode", "shared-trunk",
            "--out", out] + extra


def _run(cmds, timeout=500):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO
    procs = [subprocess.Popen(c, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env)
             for c in cmds]
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
        assert p.returncode == 0, f"leg {i} failed:\n{logs[i][-3000:]}"
    return logs


@pytest.mark.slow
def test_two_process_serving_matches_single_process(tmp_path):
    from relpose_gnn_tpu.data.synthetic_scenes import generate_scene

    tmp = str(tmp_path)
    generate_scene(f"{tmp}/raw", "chess", n_train_seqs=1, n_test_seqs=1,
                   frames_per_seq=10, height=32, width=43, seed=2,
                   stats_root=f"{tmp}/stats")

    # leg 1: one process, dp=8 virtual mesh
    _run([_serve_args(tmp, f"{tmp}/ref.npz",
                      ["--local-device-count", "8", "--mesh-data", "8"])])
    # leg 2: SAME dp=8 mesh split 4+4 across two gloo processes
    coord = f"127.0.0.1:{_free_port()}"
    _run([_serve_args(tmp, f"{tmp}/p{i}.npz",
                      ["--coordinator", coord, "--num-processes", "2",
                       "--process-id", str(i), "--local-device-count",
                       "4", "--mesh-data", "8"])
          for i in range(2)])

    ref = np.load(f"{tmp}/ref.npz")["pose6"]
    for i in range(2):
        got = np.load(f"{tmp}/p{i}.npz")["pose6"]
        assert got.shape == ref.shape == (10, 6)
        np.testing.assert_allclose(got, ref, atol=1e-5,
                                   err_msg=f"process {i} diverged")
