"""Training-step throughput on the attached TPU (tunnel-safe timing).

Measures the full jitted train step (forward + loss + grads + Adam) of the
flagship R3 config at the reference's production shapes (batch 8 graphs of
8 nodes, 256x341, training/train.py:55-59), plus a larger batch.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops
from relpose_gnn_tpu.training.trainer import (TrainerConfig,
                                              create_train_state,
                                              make_train_step)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,16",
                    help="comma list of batch sizes (one compile each, "
                         "~4 min/compile through the tunnel)")
    args = ap.parse_args()
    z = jnp.zeros(())
    float(z + 1.0)
    t0 = time.perf_counter()
    for _ in range(10):
        float(z + 1.0)
    rtt = (time.perf_counter() - t0) / 10
    print(f"rtt: {rtt * 1e3:.1f} ms", flush=True)

    cfg = RelPoseGNNConfig.preset("R3", dtype=jnp.bfloat16)
    model = RelPoseGNN(cfg)
    tcfg = TrainerConfig(steps_per_epoch=100)
    h, w, n = 256, 341, 8

    for batch_size in [int(b) for b in args.batches.split(",")]:
        key = jax.random.PRNGKey(batch_size)
        images = jax.random.normal(key, (batch_size, n, h, w, 3),
                                   jnp.float32)
        poses = jax.random.normal(key, (batch_size, n, 6), jnp.float32)
        adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(n),
                                          (batch_size, n, n)).copy())
        batch = {"images": images, "poses": poses, "adj": adj}
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   images[:1], adj[:1])
        train_step = make_train_step(tcfg)
        rng = jax.random.PRNGKey(1)
        print(f"B={batch_size}: compiling...", flush=True)
        state, m = train_step(state, batch, rng)
        float(m["loss"])  # sync
        # second warm step: the first chained execution after compile pays
        # a one-time dispatch cost through the tunnel (see CLAUDE.md)
        state, m = train_step(state, batch, rng)
        float(m["loss"])
        iters = 20
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(iters):
            # state.step changes every iteration -> distinct executions;
            # chaining through the loss defeats async dispatch
            state, m = train_step(state, batch, rng)
            acc = acc + m["loss"]
        float(acc)
        dt = (time.perf_counter() - t0 - rtt) / iters
        print(f"B={batch_size}: {dt * 1e3:.1f} ms/step  "
              f"{batch_size / dt:.1f} graphs/s  "
              f"(loss finite: {bool(jnp.isfinite(m['loss']))})", flush=True)


if __name__ == "__main__":
    main()
