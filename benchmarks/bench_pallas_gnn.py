"""Microbenchmark: Pallas fused pair-MLP vs XLA on the production shapes.

Run on the real chip:  python benchmarks/bench_pallas_gnn.py
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops.gnn_pallas import pair_mlp_apply


def main():
    B, N, D, De, H = 16, 8, 2048, 2048, 2048
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(B, N, N, De)), jnp.float32)
    fc1k = jnp.asarray(rng.normal(size=(2 * D + De, H)) * 0.02, jnp.float32)
    fc1b = jnp.zeros(H)
    fc2k = jnp.asarray(rng.normal(size=(H, De)) * 0.02, jnp.float32)
    fc2b = jnp.zeros(De)

    out_p = pair_mlp_apply(x, e, fc1k, fc1b, fc2k, fc2b, mode="edge",
                           dtype=jnp.bfloat16)
    out_p.block_until_ready()

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

    out_x = xla_ref(x, e)
    out_x.block_until_ready()
    diff = float(jnp.abs(out_p - out_x).max()
                 / (jnp.abs(out_x).max() + 1e-9))
    print("rel max diff vs XLA bf16:", diff)

    def bench(f, *a, iters=50):
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters * 1e3

    flops = 2 * B * N * N * H * (3 * D + De)
    for be, bh in [(128, 256), (128, 512), (256, 256), (256, 512),
                   (512, 512)]:
        t = bench(lambda x, e, be=be, bh=bh: pair_mlp_apply(
            x, e, fc1k, fc1b, fc2k, fc2b, mode="edge", dtype=jnp.bfloat16,
            block_e=be, block_h=bh), x, e)
        print(f"pallas be={be} bh={bh}: {t:.3f} ms  "
              f"{flops / t / 1e9:.1f} TFLOP/s")
    t = bench(xla_ref, x, e)
    print(f"xla bf16: {t:.3f} ms  {flops / t / 1e9:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
