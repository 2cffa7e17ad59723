"""Microbenchmark: space-to-depth serving stem vs the 7x7/s2 stem.

    python benchmarks/bench_s2d.py [--batch 64] [--height 256] [--width 341]

Measures the FULL folded serving backbone (ResNet34, feat 2048, bf16) at
production resolution, once with the plain 7x7/s2 conv1 and once with the
checkpoint-equivalent space-to-depth form (models/fold_bn.py).  Uses the
tunnel-safe protocol (distinct salted inputs, chained accumulator, single
D2H; see bench.py).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.models.fold_bn import fold_relpose_backbone


from benchmarks._util import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=341)
    ap.add_argument("--backbone", type=str, default="resnet34")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--stem", type=str, default="both",
                    choices=("7x7", "s2d", "both"))
    args = ap.parse_args()

    cfg = RelPoseGNNConfig.preset("R3", num_nodes=2, knn=0,
                                  dtype=jnp.bfloat16,
                                  backbone=args.backbone)
    model = RelPoseGNN(cfg)
    b, h, w = args.batch, args.height, args.width

    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, 2, h, w, 3),
                           jnp.float32)
    import numpy as np
    from relpose_gnn_tpu.ops import graph as graph_ops
    adj1 = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(2),
                                       (1, 2, 2)).copy())
    import sys as _s, time as _tt
    _t0 = _tt.perf_counter()
    # jit the init: eager flax init dispatches hundreds of tiny ops, each
    # paying the ~30 ms tunnel RTT (~95 s measured); jitted it is one
    # program (~9 s)
    variables = jax.jit(lambda k: model.init({"params": k}, x1, adj1,
                                             train=False))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    print(f"init done in {_tt.perf_counter() - _t0:.1f} s",
          file=_s.stderr, flush=True)

    x = jax.random.normal(jax.random.PRNGKey(2), (b, h, w, 3), jnp.float32)

    results = {}
    variants = [("7x7", False), ("s2d", True)]
    if args.stem != "both":
        variants = [v for v in variants if v[0] == args.stem]
    for name, s2d in variants:
        fcfg, fvars = fold_relpose_backbone(cfg, variables, s2d_stem=s2d)
        enc = RelPoseGNN(fcfg)

        @jax.jit
        def step(fvars, x, salt):
            xs = (x * (1.0 + 1e-4 * salt)).astype(jnp.bfloat16)
            feats = enc.apply(fvars, xs[:, None], train=False,
                              method=RelPoseGNN.encode_nodes)[:, 0]
            return jnp.sum(feats.astype(jnp.float32))

        import sys, time as _t
        t0 = _t.perf_counter()
        lowered = step.lower(fvars, x, jnp.float32(0.0))
        compiled = lowered.compile()
        print(f"{name}: compiled in {_t.perf_counter() - t0:.1f} s",
              file=sys.stderr)
        cost = compiled.cost_analysis()
        flops = (cost[0] if isinstance(cost, list) else cost).get("flops", 0)
        print(f"{name}: timing...", file=sys.stderr, flush=True)
        ms = bench(lambda fv, xx, s: step(fv, xx, s), fvars, x,
                   iters=args.iters)
        results[name] = ms
        tput = b / (ms / 1e3)
        print(f"{name}: {ms:8.2f} ms/step  {tput_str(tput)}  "
              f"flops/step={flops:.3e}  eff_tflops={flops / ms / 1e9:.1f}")

    if len(results) == 2:
        speedup = results["7x7"] / results["s2d"]
        print(f"s2d speedup over 7x7 stem: {speedup:.3f}x")


def tput_str(tput):
    return f"{tput:8.1f} img/s"


if __name__ == "__main__":
    main()
