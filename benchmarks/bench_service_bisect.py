"""Per-stage bisect of the full relocalization service query path.

    python benchmarks/bench_service_bisect.py [--batch 128] [--db 4096]

The full service (bench_service.py) runs ~2.6x slower per query than the
cached-serving eval step (bench.py): this script times each stage of
RelocalizationService._make_query_fn in isolation, with the tunnel-safe
protocol (salted on-device inputs, chained accumulator, one D2H):

  netvlad   — resize 256x341 -> 192x256 + VGG16 trunk + VLAD pooling
  select    — cosine sims [B, M] + stochastic strided subsample
  encode    — folded ResNet34 on the query pixels (the bench.py stage)
  gnn       — compact edge-list GNN + pose recovery from embeddings
  full      — the composed query_fn

The database is synthesized DIRECTLY ON DEVICE (descriptors [M, 32768],
embeddings [M, D], poses) so `--db` can be production-sized without
paying the tunnel's ~15-25 MB/s upload for pixels that no stage reads.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks._util import bench, enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--db", type=int, default=4096,
                    help="database size M (sims + subsample scale with it)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", type=str, default="all",
                    help="comma list of full,netvlad,select,encode,gnn — "
                         "run a subset per invocation to stay inside the "
                         "tunnel's compile budget (the persistent cache "
                         "carries compiles across runs)")
    ap.add_argument("--json", type=str, default="",
                    help="write {batch, db, stage_ms} to this path "
                         "(merged into SERVICE_r05.json by bench_service "
                         "--bisect-json)")
    args = ap.parse_args()

    from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                    ServiceConfig)
    from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
    from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
    from relpose_gnn_tpu.ops import graph as graph_ops
    from relpose_gnn_tpu.retrieval.subsample import subsample_neighbors_batch

    b, m = args.batch, args.db
    n, h, w = 8, 256, 341
    mcfg = RelPoseGNNConfig.preset("R3", num_nodes=n, dtype=jnp.bfloat16)
    model = RelPoseGNN(mcfg)
    netvlad = NetVLADEncoder(dtype=jnp.bfloat16)
    print("initializing models (jitted)...", flush=True)
    model_vars = jax.jit(lambda k: model.init(
        k, jnp.ones((1, n, h, w, 3)), jnp.ones((1, n, n), bool),
        train=False))(jax.random.PRNGKey(0))
    nv_vars = jax.jit(lambda k: netvlad.init(
        k, jnp.ones((1, 192, 256, 3))))(jax.random.PRNGKey(1))
    jax.block_until_ready((model_vars, nv_vars))

    svc = RelocalizationService(model, model_vars, netvlad, nv_vars,
                                ServiceConfig())
    # device-synthesized database: no pixel upload, production-scale M
    kd, ke, kp, kq = jax.random.split(jax.random.PRNGKey(2), 4)
    feat = svc.model.cfg.feat_dim
    # f32: production descriptors are f32 even with a bf16 NetVLAD trunk
    # (the VLAD aggregation casts before its norms, models/netvlad.py) —
    # a bf16 table here would time a sim matmul production never runs
    svc.db_desc = jax.jit(lambda k: jax.random.normal(
        k, (m, 32768), jnp.float32))(kd)
    svc.db_emb = jax.jit(lambda k: jax.random.normal(
        k, (m, feat), jnp.bfloat16))(ke)
    svc.db_poses = jax.jit(lambda k: jax.random.normal(
        k, (m, 6), jnp.float32))(kp)
    q01 = jax.jit(lambda k: jax.random.uniform(
        k, (b, h, w, 3), jnp.float32))(kq)
    jax.block_until_ready((svc.db_desc, svc.db_emb, svc.db_poses, q01))

    def model_norm(x):
        return (x - 0.45) / 0.2

    # --- isolated stages (each salts its own input on device) ----------
    # NOTE: weights/database arrays are passed as ARGUMENTS, not closed
    # over — jit embeds closed-over arrays as HLO constants, and through
    # the axon tunnel a VGG16/ResNet34 worth of constants blows the
    # remote-compile request limit (HTTP 413; this is also the likeliest
    # culprit for the round-3 wedge this script caused).
    @jax.jit
    def st_netvlad(nv, q, salt):
        d = netvlad.apply(nv, svc._netvlad_input(q * (1 + 1e-4 * salt)))
        return jnp.sum(d.astype(jnp.float32))

    q_desc0 = jax.jit(lambda nv, q: netvlad.apply(
        nv, svc._netvlad_input(q)))(nv_vars, q01)

    @jax.jit
    def st_select(db_desc, qd, salt):
        sim = (qd * (1 + 1e-4 * salt)) @ db_desc.T
        invalid = jnp.zeros((m,), bool)
        nbrs = subsample_neighbors_batch(
            jax.random.PRNGKey(0), sim, invalid, n - 1, 5,
            candidates=svc.cfg.retrieval_candidates)
        return jnp.sum(nbrs)

    @jax.jit
    def st_encode(mv, q, salt):
        e = svc.model.apply(mv, model_norm(q * (1 + 1e-4 * salt))[:, None],
                            train=False, method=RelPoseGNN.encode_nodes)
        return jnp.sum(e.astype(jnp.float32))

    # modulo-tile the DB embeddings: b*(n-1) can exceed --db (e.g.
    # --batch 512 --db 1024), and a plain [:b*(n-1)] reshape would crash
    nbr_rows = jnp.arange(b * (n - 1)) % m
    x0 = jax.jit(lambda mv, q, db_emb: jnp.concatenate([
        svc.model.apply(mv, model_norm(q)[:, None],
                        train=False, method=RelPoseGNN.encode_nodes),
        db_emb[nbr_rows].reshape(b, n - 1, feat).astype(
            jnp.bfloat16)], axis=1))(svc.model_vars, q01, svc.db_emb)
    adj0 = jnp.asarray(np.broadcast_to(~np.eye(n, dtype=bool), (b, n, n)))

    @jax.jit
    def st_gnn(mv, x, adj, salt):
        _, pred_rel, _, aux = svc.model.apply(
            mv, x * (1 + 1e-4 * salt), adj, train=False,
            method=RelPoseGNN.from_embeddings)
        nbr = graph_ops.nearest_neighbor(aux["node_feats"], node=0)
        return jnp.sum(pred_rel[jnp.arange(b), nbr, 0])

    db_valid = jnp.ones((m,), bool)

    @jax.jit
    def st_full(mv, nv, db_desc, db_emb, db_poses, q, salt):
        out = svc._query_fn(model_norm, mv, nv, db_desc, db_emb, db_poses,
                            db_valid, q * (1 + 1e-4 * salt),
                            jax.random.PRNGKey(0))
        return jnp.sum(out["pose"])

    print(f"batch={b} db={m}", flush=True)
    stages = [("full", st_full, (svc.model_vars, nv_vars, svc.db_desc,
                                 svc.db_emb, svc.db_poses, q01)),
              ("netvlad", st_netvlad, (nv_vars, q01)),
              ("select", st_select, (svc.db_desc, q_desc0)),
              ("encode", st_encode, (svc.model_vars, q01)),
              ("gnn", st_gnn, (svc.model_vars, x0, adj0))]
    want = (None if args.stages == "all"
            else set(args.stages.split(",")))
    times = {}
    for name, f, a in stages:
        if want is not None and name not in want:
            continue
        ms = bench(f, *a, iters=args.iters)
        times[name] = ms
        print(f"{name:8s} {ms:8.2f} ms  ({b / ms * 1e3:7.0f} q/s)",
              flush=True)
    if want is None:
        parts = sum(times[k] for k in ("netvlad", "select", "encode",
                                       "gnn"))
        print(f"sum(stages) {parts:.2f} ms vs full {times['full']:.2f} ms "
              f"(overlap {parts - times['full']:+.2f} ms)", flush=True)
    if args.json:
        import json
        with open(args.json, "w") as f:
            json.dump({"batch": b, "db": m, "stage_ms":
                       {k: round(v, 3) for k, v in times.items()}}, f)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
