"""Microbenchmark: fused attention core (Pallas) vs XLA on the real chip.

    python benchmarks/bench_att_pallas.py [--e 16384] [--c 256]

Uses the tunnel-safe protocol (distinct salted inputs, chained
accumulator, single D2H; see bench.py).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops.att_pallas import attention_core, attention_core_xla


from benchmarks._util import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=16384)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    e, c = args.e, args.c

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    phi = jax.random.normal(k1, (e, c), jnp.float32)
    theta = jax.random.normal(k2, (e, c), jnp.float32)
    g = jax.random.normal(k3, (e, c), jnp.float32)

    @jax.jit
    def xla_f32(phi, theta, g, salt):
        return jnp.sum(attention_core_xla(phi * (1 + 1e-4 * salt), theta, g))

    @jax.jit
    def xla_bf16(phi, theta, g, salt):
        return jnp.sum(attention_core_xla(
            (phi * (1 + 1e-4 * salt)).astype(jnp.bfloat16),
            theta.astype(jnp.bfloat16), g.astype(jnp.bfloat16)))

    def make_pallas(be):
        @jax.jit
        def f(phi, theta, g, salt):
            return jnp.sum(attention_core(phi * (1 + 1e-4 * salt), theta, g,
                                          block_e=be))
        return f

    # parity first
    got = attention_core(phi, theta, g)
    want = attention_core_xla(phi, theta, g)
    rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    print(f"E={e} C={c}  kernel vs XLA f32 rel max diff: {rel:.2e}")

    print(f"xla f32 : {bench(xla_f32, phi, theta, g, iters=args.iters):8.3f} ms")
    print(f"xla bf16: {bench(xla_bf16, phi, theta, g, iters=args.iters):8.3f} ms")
    for be in (8, 16, 32):
        t = bench(make_pallas(be), phi, theta, g, iters=args.iters)
        print(f"pallas block_e={be:3d}: {t:8.3f} ms")


if __name__ == "__main__":
    main()
