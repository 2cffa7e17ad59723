"""Attention-core kernel variants: can the VPU exp cost be cut?

The production fused attention kernel (ops/att_pallas.py) is VPU-bound:
per logit it pays outer-mul, max-reduce, sub, exp, two sum-reduces and a
mul — with `exp` the expensive transcendental.  Candidate rewrites, all
EXACT (same math up to fp rounding):

  v1 exp2     : fold log2(e) into phi once per tile (O(C)) so the
                per-logit exp(f - m) becomes a raw exp2(f2 - m2) — if
                Mosaic lowers exp as `mul by log2e + pow2`, this deletes
                one VPU mul per logit.
  v2 mxu      : compute the two [T,C,C] sum-reductions (z and y) as one
                batched matmul w @ [g | 1] on the (otherwise idle) MXU,
                freeing the VPU of ~3 ops/logit (the mul by g + two
                adds).  Padded to 128 output lanes, so only worth it if
                VPU is the true bottleneck.
  v3 exp2+mxu : both.

Protocol: tunnel-safe (salted distinct inputs, chained accumulator,
single D2H — see bench.py docstring), 40 iterations.

Usage: python benchmarks/bench_att_variants.py [--e 32768] [--c 256]
       [--check-only]  (CPU interpret-mode correctness check)
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relpose_gnn_tpu.ops.att_pallas import attention_core, attention_core_xla

_LOG2E = 1.4426950408889634


def _kernel_exp2(phi_ref, theta_ref, g_ref, y_ref):
    phi = phi_ref[:].astype(jnp.float32) * _LOG2E   # [T, C] — O(C) extra
    theta = theta_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    f = phi[:, :, None] * theta[:, None, :]         # = log2e * logits
    m = jnp.max(f, axis=-1, keepdims=True)
    w = jnp.exp2(f - m)                             # == exp(logits - max)
    z = jnp.sum(w, axis=-1)
    y = jnp.sum(w * g[:, None, :], axis=-1)
    y_ref[:] = y / z


def _kernel_mxu(phi_ref, theta_ref, g_ref, y_ref, *, use_exp2: bool):
    phi = phi_ref[:].astype(jnp.float32)
    if use_exp2:
        phi = phi * _LOG2E
    theta = theta_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    f = phi[:, :, None] * theta[:, None, :]
    m = jnp.max(f, axis=-1, keepdims=True)
    w = (jnp.exp2 if use_exp2 else jnp.exp)(f - m)  # [T, C, C]
    # z and y in ONE batched matmul on the MXU: w @ [g | 1]  -> [T, C, 2]
    gz = jnp.stack([g, jnp.ones_like(g)], axis=-1)  # [T, C, 2]
    yz = jax.lax.dot_general(
        w, gz, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,        # f32 sums, like the VPU
        preferred_element_type=jnp.float32)         # [T, C, 2]
    y_ref[:] = yz[:, :, 0] / yz[:, :, 1]


_VARIANTS = {
    "v1_exp2": _kernel_exp2,
    "v2_mxu": functools.partial(_kernel_mxu, use_exp2=False),
    "v3_exp2_mxu": functools.partial(_kernel_mxu, use_exp2=True),
}


def variant_core(name: str, phi, theta, g, block_e: int = 16,
                 interpret: bool = False):
    e_total, c = phi.shape
    pad = (-e_total) % block_e
    if pad:
        phi = jnp.pad(phi, ((0, pad), (0, 0)))
        theta = jnp.pad(theta, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    n_e = e_total + pad
    out = pl.pallas_call(
        _VARIANTS[name],
        grid=(n_e // block_e,),
        in_specs=[pl.BlockSpec((block_e, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((block_e, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_e, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=3 * n_e * c * c,
            bytes_accessed=4 * n_e * c * 4,
            transcendentals=n_e * c * c),
        interpret=interpret,
    )(phi, theta, g)
    return out[:e_total]


from benchmarks._util import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=32768)  # serving batch 512
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--block-e", type=int, default=16)
    ap.add_argument("--check-only", action="store_true",
                    help="CPU interpret-mode correctness check only; "
                         "forces the cpu platform IN-PROCESS (the "
                         "JAX_PLATFORMS env var does not override this "
                         "session's axon plugin — CLAUDE.md)")
    args = ap.parse_args()
    if args.check_only:
        jax.config.update("jax_platforms", "cpu")
    else:
        from benchmarks._util import enable_compile_cache
        enable_compile_cache()
    e, c = args.e, args.c

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    phi = jax.random.normal(k1, (e, c), jnp.float32)
    theta = jax.random.normal(k2, (e, c), jnp.float32)
    g = jax.random.normal(k3, (e, c), jnp.float32)

    interp = jax.default_backend() != "tpu"
    # tight check vs the PRODUCTION kernel (the XLA oracle's einsum takes
    # the default-precision fast path, ~1e-3 — see tests/conftest.py)
    want = attention_core(phi[:256], theta[:256], g[:256],
                          interpret=interp)
    for name in _VARIANTS:
        got = variant_core(name, phi[:256], theta[:256], g[:256],
                           block_e=args.block_e, interpret=interp)
        rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
        print(f"{name:12s} vs production kernel rel max diff: {rel:.2e}")
        assert rel < 1e-5, (name, rel)
    if args.check_only:
        print("correctness OK (interpret mode)" if interp else "OK")
        return

    @jax.jit
    def baseline(phi, theta, g, salt):
        return jnp.sum(attention_core(phi * (1 + 1e-4 * salt), theta, g,
                                      block_e=args.block_e))

    def make_variant(name):
        @jax.jit
        def f(phi, theta, g, salt):
            return jnp.sum(variant_core(name, phi * (1 + 1e-4 * salt),
                                        theta, g, block_e=args.block_e))
        return f

    t0 = bench(baseline, phi, theta, g, iters=args.iters)
    print(f"E={e} C={c} block_e={args.block_e}")
    print(f"v0 current  : {t0:8.3f} ms")
    for name in _VARIANTS:
        t = bench(make_variant(name), phi, theta, g, iters=args.iters)
        print(f"{name:12s}: {t:8.3f} ms  ({t0 / t:.2f}x)")


if __name__ == "__main__":
    main()
