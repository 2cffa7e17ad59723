"""Probe: restructured attention-core kernels against the production one.

The fused core (ops/att_pallas.py) sweeps the [T, C, C] logit grid ~5
times in VMEM (materialize f, max pass, exp pass, two reduce passes).
Two exact restructurings:

  V1 analytic-max: m_i = maximum(phi_i * max(theta), phi_i * min(theta))
     — BIT-EXACT vs the plain max (the row max of a rank-1 grid is
     attained at max/min of theta, and phi_i*tmax is literally one of the
     grid's products, so rounding is identical).  Removes one full C^2
     pass and lets Mosaic fuse f into the exp pass.  (An earlier attempt
     used a where/broadcast mix and measured SLOWER — this form is two
     [T, C] muls + a maximum.)
  V2 analytic-max + j-chunked single pass: with m known up front, sweep
     theta/g in chunks of 128 lanes with running (z, y) accumulators —
     flash-attention-style, but with no rescaling needed.  One C^2 pass.

Run:  python benchmarks/bench_att_variants2.py

(Follow-up to bench_att_exp2.py, whose exp2-prescale variant measured a
wash — the exp multiply is not the bound.)

MEASURED (single v5e, warm cache, E=16384 C=256, block_e=16):
base 7.06 ms, v1 7.90 ms, v2 10.19 ms — BOTH restructurings LOSE.
v1 is bit-exact (0/16384 mismatched bit patterns) and v2 matches to
3.8e-7 (summation order), but Mosaic already schedules the straight
5-pass kernel better than either hand-restructuring: the analytic max
trades one fused C^2 max pass for extra [T, C] vector work and a worse
fusion pattern, and the j-chunked single pass doubles the broadcast
setup per chunk.  Together with the exp2 wash this closes the
attention-kernel lever list: the production kernel (ops/att_pallas.py)
stands as-is.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks._util import bench, enable_compile_cache


def _kernel_v1(phi_ref, theta_ref, g_ref, y_ref):
    phi = phi_ref[:].astype(jnp.float32)
    theta = theta_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    tmax = jnp.max(theta, axis=-1, keepdims=True)   # [T, 1]
    tmin = jnp.min(theta, axis=-1, keepdims=True)
    m = jnp.maximum(phi * tmax, phi * tmin)         # [T, C] row max, exact
    f = phi[:, :, None] * theta[:, None, :]
    w = jnp.exp(f - m[:, :, None])
    z = jnp.sum(w, axis=-1)
    y = jnp.sum(w * g[:, None, :], axis=-1)
    y_ref[:] = y / z


def _kernel_v2(phi_ref, theta_ref, g_ref, y_ref):
    phi = phi_ref[:].astype(jnp.float32)            # [T, C]
    theta = theta_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    t, c = phi.shape
    tmax = jnp.max(theta, axis=-1, keepdims=True)
    tmin = jnp.min(theta, axis=-1, keepdims=True)
    m = jnp.maximum(phi * tmax, phi * tmin)         # [T, C]
    chunk = 128

    # static unroll (Mosaic here has no dynamic_slice lowering; c is static)
    z = jnp.zeros((t, c), jnp.float32)
    y = jnp.zeros((t, c), jnp.float32)
    for j in range(c // chunk):
        th = theta[:, j * chunk:(j + 1) * chunk]
        gg = g[:, j * chunk:(j + 1) * chunk]
        w = jnp.exp(phi[:, :, None] * th[:, None, :] - m[:, :, None])
        z = z + jnp.sum(w, axis=-1)
        y = y + jnp.sum(w * gg[:, None, :], axis=-1)
    y_ref[:] = y / z


def _call(kernel, phi, theta, g, block_e):
    e, c = phi.shape
    return pl.pallas_call(
        kernel,
        grid=(e // block_e,),
        in_specs=[pl.BlockSpec((block_e, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((block_e, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=3 * e * c * c, bytes_accessed=4 * e * c * 4,
            transcendentals=e * c * c),
    )(phi, theta, g)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--exact", action="store_true",
                    help="run the tiny exactness check only")
    ap.add_argument("--kernel", choices=("base", "v1", "v2"))
    ap.add_argument("--block-e", type=int, default=16)
    args = ap.parse_args(argv)

    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    from relpose_gnn_tpu.ops.att_pallas import _kernel as kernel_base

    kernels = {"base": kernel_base, "v1": _kernel_v1, "v2": _kernel_v2}
    e_prod, c = 16384, 256

    @functools.partial(jax.jit, static_argnames=("kernel", "block_e", "e"))
    def step(kernel, e, block_e, salt):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        mk = lambda kk: jax.random.normal(kk, (e, c), jnp.float32) + salt * 1e-6
        phi, theta, g = (mk(kk) for kk in ks)
        return jnp.sum(_call(kernel, phi, theta, g, block_e))

    if args.exact:
        # exactness vs the production kernel (V1 must be BIT-exact)
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        phi, theta, g = (jax.random.normal(kk, (64, c)) * 3 for kk in ks)
        base = _call(kernel_base, phi, theta, g, 16)
        for name in ("v1", "v2"):
            got = _call(kernels[name], phi, theta, g, 16)
            bits = int(jnp.sum(got.view(jnp.int32) != base.view(jnp.int32)))
            err = float(jnp.max(jnp.abs(got - base)) / jnp.max(jnp.abs(base)))
            print(f"{name}: mismatched bit-patterns {bits}/{got.size}, "
                  f"max rel err vs base {err:.2e}", flush=True)
        return

    name = args.kernel or "base"
    t = bench(lambda s: step(kernels[name], e_prod, args.block_e, s))
    print(f"{name} block_e={args.block_e:3d}: {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
