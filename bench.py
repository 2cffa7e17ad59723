"""Headline benchmark: relocalization queries/sec/chip on real TPU hardware.

Protocol
--------
Measures the flagship eval path (RelPoseGNN 'R3': ResNet34 + dense edge-GNN
on 8-node graphs, dynamic kNN-4, absolute-pose recovery) end to end:

  * baseline leg: the reference's eval protocol — batch_size=1 with a host
    sync per query (testing/test.py:184-258 runs DataLoader(bs=1) and pulls
    every output to numpy) — reproduced on this chip;
  * measured leg: our batched jitted eval step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup of the batched TPU-native path over the
reference-protocol leg on identical hardware (the reference publishes no
throughput numbers of its own, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def make_eval_fn(model):
    from relpose_gnn_tpu.ops import graph as graph_ops

    @jax.jit
    def eval_fn(variables, images, adj, poses):
        pred_abs, pred_rel, adj_out, aux = model.apply(
            variables, images, adj, train=False)
        nbr = graph_ops.nearest_neighbor(aux["node_feats"], node=0)
        b = pred_rel.shape[0]
        rp = pred_rel[jnp.arange(b), nbr, 0]
        pred_query = poses[jnp.arange(b), nbr] - rp
        return pred_query

    return eval_fn


def run(batch_size: int, iters: int, warmup: int, model, variables,
        images_np, adj_np, poses_np, sync_per_query: bool) -> float:
    """Returns queries/sec."""
    eval_fn = make_eval_fn(model)
    images = jnp.asarray(images_np[:batch_size])
    adj = jnp.asarray(adj_np[:batch_size])
    poses = jnp.asarray(poses_np[:batch_size])

    for _ in range(warmup):
        out = eval_fn(variables, images, adj, poses)
        np.asarray(out)  # sync

    t0 = time.perf_counter()
    if sync_per_query:
        for _ in range(iters):
            out = eval_fn(variables, images, adj, poses)
            np.asarray(out)  # reference protocol: D2H every query
    else:
        for _ in range(iters):
            out = eval_fn(variables, images, adj, poses)
        out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--baseline-iters", type=int, default=20)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=341)
    ap.add_argument("--nodes", type=int, default=8)
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=("bfloat16", "float32"))
    args = ap.parse_args()

    from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
    from relpose_gnn_tpu.ops import graph as graph_ops

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    cfg = RelPoseGNNConfig.preset("R3", num_nodes=args.nodes, dtype=dtype)
    model = RelPoseGNN(cfg)

    rng = np.random.default_rng(0)
    b, n = args.batch_size, args.nodes
    images = rng.normal(size=(b, n, args.height, args.width, 3)).astype(
        np.float32)
    poses = rng.normal(size=(b, n, 6)).astype(np.float32)
    adj = np.broadcast_to(graph_ops.fc_adjacency(n), (b, n, n)).copy()

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(images[:1]), jnp.asarray(adj[:1]),
                           train=False)

    qps_ref_protocol = run(1, args.baseline_iters, 3, model, variables,
                           images, adj, poses, sync_per_query=True)
    qps = run(args.batch_size, args.iters, 3, model, variables,
              images, adj, poses, sync_per_query=False)

    print(json.dumps({
        "metric": "relocalization queries/sec/chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / qps_ref_protocol, 2),
    }))


if __name__ == "__main__":
    main()
