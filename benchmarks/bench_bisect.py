"""Per-stage bisect of the cached-serving step on the real chip.

    python benchmarks/bench_bisect.py [--batch 512]

Times, with the tunnel-safe protocol (salted inputs, chained accumulator,
single D2H): (a) the full cached-serving step, (b) the query-pixels
backbone alone, (c) the post-backbone GNN + recovery alone (from cached
embeddings).  (b)+(c) vs (a) shows how much XLA overlaps across the
stage boundary; the larger of (b)/(c) is the next optimization target.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks._util import enable_compile_cache
enable_compile_cache()

from relpose_gnn_tpu.evaluation import serving
from relpose_gnn_tpu.models.fold_bn import fold_relpose_backbone
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops


from benchmarks._util import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    n, h, w = 8, 256, 341
    cfg = RelPoseGNNConfig.preset("R3", num_nodes=n, dtype=jnp.bfloat16)
    model = RelPoseGNN(cfg)
    img1 = jnp.zeros((1, n, h, w, 3), jnp.float32)
    adj1 = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(n),
                                       (1, n, n)).copy())
    variables = jax.jit(lambda k: model.init({"params": k}, img1, adj1,
                                             train=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    fcfg, fvars = fold_relpose_backbone(cfg, variables)
    fmodel = RelPoseGNN(fcfg)
    cached_step = serving.make_cached_eval_step(fmodel, ref_node=0)

    b = args.batch
    kq, ke, kp = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (b, h, w, 3), jnp.float32)
    emb = jax.random.normal(ke, (b, n - 1, cfg.feat_dim), jnp.float32)
    poses = jax.random.normal(kp, (b, n, 6), jnp.float32)
    adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(n),
                                      (b, n, n)).copy())

    @jax.jit
    def full(fv, q, emb, poses, adj, salt):
        qq = q * (1.0 + 1e-4 * salt)
        return jnp.sum(cached_step(fv, qq, emb, poses[:, 1:], adj)["pred"])

    @jax.jit
    def backbone_only(fv, q, salt):
        qq = q * (1.0 + 1e-4 * salt)
        f = fmodel.apply(fv, qq[:, None], train=False,
                         method=RelPoseGNN.encode_nodes)[:, 0]
        return jnp.sum(f.astype(jnp.float32))

    @jax.jit
    def gnn_only(fv, x0, emb, poses, adj, salt):
        x0s = x0 * (1.0 + 1e-4 * salt)
        x = jnp.concatenate([x0s[:, None], emb.astype(x0s.dtype)], axis=1)
        _, pred_rel, _, aux = fmodel.apply(
            fv, x, adj, train=False, method=RelPoseGNN.from_embeddings)
        nbr = graph_ops.nearest_neighbor(aux["node_feats"], node=0)
        bb = pred_rel.shape[0]
        return jnp.sum(poses[jnp.arange(bb), 1 + nbr - 1]
                       - pred_rel[jnp.arange(bb), nbr, 0])

    x0 = jax.random.normal(jax.random.PRNGKey(9), (b, cfg.feat_dim),
                           jnp.float32)

    t_full = bench(full, fvars, q, emb, poses, adj, iters=args.iters)
    t_bb = bench(backbone_only, fvars, q, iters=args.iters)
    t_gnn = bench(gnn_only, fvars, x0, emb, poses, adj, iters=args.iters)
    print(f"batch {b}: full {t_full:.2f} ms | backbone {t_bb:.2f} ms | "
          f"gnn+recovery {t_gnn:.2f} ms | bb+gnn {t_bb + t_gnn:.2f} ms "
          f"(overlap {(t_bb + t_gnn - t_full):+.2f} ms)")
    print(f"q/s: full {b / t_full * 1e3:.0f}")


if __name__ == "__main__":
    main()
