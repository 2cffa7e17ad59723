"""Microbenchmark: Pallas fused pair-MLP vs XLA on production + stretch shapes.

Run on the real chip:

    python benchmarks/bench_pallas_gnn.py            # N=8 production graphs
    python benchmarks/bench_pallas_gnn.py --nodes 32 # BASELINE configs[4]

Timing discipline (the chip sits behind an async tunnel — see bench.py):
each iteration consumes a *distinct* device-resident input batch, every
iteration's output folds into one scalar accumulator, and a single
device-to-host read at the end fences the whole chain; the tunnel RTT is
measured and subtracted once.  This defeats both async-dispatch overlap
and any serving-layer result caching of identical executions.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops.gnn_pallas import pair_mlp_apply


def measure_rtt() -> float:
    z = jnp.zeros(())
    float(z + 1.0)
    t0 = time.perf_counter()
    for _ in range(10):
        float(z + 1.0)
    return (time.perf_counter() - t0) / 10


def bench(step, inputs_pool, iters, rtt):
    """step(x, e) -> scalar; cycles the input pool, chains an accumulator."""
    acc = jnp.zeros(())
    acc = acc + step(*inputs_pool[0])  # compile/warm
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros(())
    for i in range(iters):
        x, e = inputs_pool[i % len(inputs_pool)]
        acc = acc + step(x, e)
    float(acc)  # single D2H fence for the whole chain
    return max(time.perf_counter() - t0 - rtt, 1e-9) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--nodes", type=int, default=8)
    ap.add_argument("--dims", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--pool", type=int, default=2)
    ap.add_argument("--blocks", type=str, default="",
                    help="comma list of BExBH pairs, e.g. 256x512,512x512")
    args = ap.parse_args()

    B, N, D = args.batch, args.nodes, args.dims
    De = H = D
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    e0 = jnp.asarray(rng.normal(size=(B, N, N, De)), jnp.float32)
    pool = [(x0 * (1.0 + 0.01 * i), e0 * (1.0 - 0.01 * i))
            for i in range(args.pool)]
    fc1k = jnp.asarray(rng.normal(size=(2 * D + De, H)) * 0.02, jnp.float32)
    fc1b = jnp.zeros(H)
    fc2k = jnp.asarray(rng.normal(size=(H, De)) * 0.02, jnp.float32)
    fc2b = jnp.zeros(De)

    @jax.jit
    def xla_ref(x, e):
        xs = jnp.broadcast_to(x[:, :, None, :], (B, N, N, D))
        xt = jnp.broadcast_to(x[:, None, :, :], (B, N, N, D))
        inp = jnp.concatenate([xs, xt, e], -1).astype(jnp.bfloat16)
        h = jnp.maximum(
            jnp.dot(inp, fc1k.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) + fc1b, 0)
        return jnp.dot(h.astype(jnp.bfloat16), fc2k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) + fc2b

    @jax.jit
    def xla_split(x, e):
        """Split-weight form (the production path, models/gnn.py::PairMLP2):
        node slabs once per node + broadcast-add; fewer FLOPs, no concat."""
        k = fc1k.astype(jnp.bfloat16)
        xb, eb = x.astype(jnp.bfloat16), e.astype(jnp.bfloat16)
        hs = jnp.dot(xb, k[:D])                       # [B, N, H]
        ht = jnp.dot(xb, k[D:2 * D])
        he = jnp.dot(eb, k[2 * D:])                   # [B, N, N, H]
        h = jnp.maximum(
            (hs[:, :, None] + ht[:, None, :] + he).astype(jnp.float32)
            + fc1b, 0)
        return jnp.dot(h.astype(jnp.bfloat16), fc2k.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) + fc2b

    # correctness first: pallas vs XLA bf16 at these shapes
    out_p = pair_mlp_apply(*pool[0], fc1k, fc1b, fc2k, fc2b, mode="edge",
                           dtype=jnp.bfloat16)
    out_x = xla_ref(*pool[0])
    diff = float(jnp.abs(out_p - out_x).max()
                 / (jnp.abs(out_x).max() + 1e-9))
    print(f"B={B} N={N} D={De}  rel max diff pallas vs XLA bf16: {diff:.2e}")

    rtt = measure_rtt()
    print(f"tunnel RTT: {rtt * 1e3:.1f} ms")
    flops = 2 * B * N * N * H * (3 * D + De)

    results = {}
    e_total = B * N * N
    default_blocks = [(256, 512), (512, 512), (1024, 512)]
    blocks = [tuple(map(int, s.split("x"))) for s in args.blocks.split(",")] \
        if args.blocks else default_blocks
    for be, bh in blocks:
        if e_total % be and be > e_total:
            continue
        step = jax.jit(lambda x, e, be=be, bh=bh: jnp.sum(pair_mlp_apply(
            x, e, fc1k, fc1b, fc2k, fc2b, mode="edge", dtype=jnp.bfloat16,
            block_e=be, block_h=bh)))
        try:
            t = bench(step, pool, args.iters, rtt)
        except Exception as exc:  # scoped-VMEM OOM at large tiles
            print(f"pallas be={be:4d} bh={bh:4d}: FAILED "
                  f"({str(exc).splitlines()[0][:90]})")
            continue
        results[f"pallas be={be} bh={bh}"] = t
        print(f"pallas be={be:4d} bh={bh:4d}: {t:8.3f} ms  "
              f"{flops / t / 1e9:7.1f} TFLOP/s")
    xla_step = jax.jit(lambda x, e: jnp.sum(xla_ref(x, e)))
    t = bench(xla_step, pool, args.iters, rtt)
    results["xla bf16"] = t
    print(f"xla concat bf16     : {t:8.3f} ms  {flops / t / 1e9:7.1f} TFLOP/s")
    split_step = jax.jit(lambda x, e: jnp.sum(xla_split(x, e)))
    ts = bench(split_step, pool, args.iters, rtt)
    results["xla split"] = ts
    print(f"xla split-weight    : {ts:8.3f} ms  (concat-form FLOPs "
          f"{flops / ts / 1e9:7.1f} TFLOP/s-equivalent)")

    best_p = min(v for k, v in results.items() if k.startswith("pallas"))
    best_x = min(t, ts)
    print(f"verdict: pallas best {best_p:.3f} ms vs xla best {best_x:.3f} ms"
          f"  ({'PALLAS WINS' if best_p < best_x else 'XLA WINS'} at N={N})")


if __name__ == "__main__":
    main()
