"""Probe: true eval-step cost on the attached TPU, tunnel-safe timing.

Timing method: accumulate every iteration's output into one scalar and
force a single device-to-host read at the end — the read cannot complete
until every chained execution has finished, so asynchronous dispatch and
any serving-layer caching of identical calls cannot fake the numbers.
Distinct inputs per iteration are derived on device (no tunnel uploads).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops


def measure_rtt():
    z = jnp.zeros(())
    float(z + 1.0)
    t0 = time.perf_counter()
    for _ in range(10):
        float(z + 1.0)
    return (time.perf_counter() - t0) / 10


def main():
    rtt = measure_rtt()
    print(f"rtt: {rtt * 1e3:.1f} ms", flush=True)

    cfg = RelPoseGNNConfig.preset("R3", dtype=jnp.bfloat16)
    model = RelPoseGNN(cfg)
    h, w, n = 256, 341, 8

    @jax.jit
    def eval_fn(variables, images, adj, poses):
        _, pred_rel, _, aux = model.apply(variables, images, adj,
                                          train=False)
        nbr = graph_ops.nearest_neighbor(aux["node_feats"], node=0)
        b = pred_rel.shape[0]
        return poses[jnp.arange(b), nbr] - pred_rel[jnp.arange(b), nbr, 0]

    variables = None
    for batch in (8, 32):
        key = jax.random.PRNGKey(batch)
        base = jax.random.normal(key, (batch, n, h, w, 3), jnp.float32)
        pool = [base * (1.0 + 0.01 * i) for i in range(3)]
        poses = jax.random.normal(key, (batch, n, 6), jnp.float32)
        adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(n),
                                          (batch, n, n)).copy())
        if variables is None:
            variables = model.init({"params": jax.random.PRNGKey(0)},
                                   pool[0][:1], adj[:1], train=False)
        print(f"B={batch}: compiling...", flush=True)
        float(jnp.sum(eval_fn(variables, pool[0], adj, poses)))
        print(f"B={batch}: warm, timing...", flush=True)
        iters = 10
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for i in range(iters):
            acc = acc + jnp.sum(eval_fn(variables, pool[i % 3], adj, poses))
        float(acc)
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"B={batch}: {dt * 1e3:.2f} ms/batch  {batch / dt:.0f} q/s",
              flush=True)


if __name__ == "__main__":
    main()
