"""Probe: exp vs exp2-with-prescaled-phi inside the attention kernel.

The fused attention core (ops/att_pallas.py) is VPU/exp-bound: E*(C)^2
transcendentals per call.  `jnp.exp(x)` lowers on TPU as
`exp2(x * log2(e))` — one extra vmul per element of the [T, C, C] logit
grid.  Because the logits are rank-1 (f_ij = phi_i * theta_j), that
multiply can be hoisted: scale phi by log2(e) ONCE per row ([T, C] work)
and call exp2 on the grid.  The row max computed from the scaled grid is
the scaled max (log2e > 0), so softmax stability is unchanged.

Run:  python benchmarks/bench_att_exp2.py  (foreground; ~1 min warm)

MEASURED (single v5e, warm cache, E=16384 C=256): a wash —
exp 6.71 ms vs exp2-prescaled 6.56 ms at block_e=8 (1.023x), and
6.36 vs 6.37 ms (0.999x) at block_e=16.  exp's internal log2(e) multiply is NOT the bound; the
kernel is VMEM-sweep bound over the [T, C, C] grid (see
bench_att_variants2.py for the restructurings that attack that).
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

_LOG2E = 1.4426950408889634


def _kernel_exp2(phi_ref, theta_ref, g_ref, y_ref):
    phi = phi_ref[:].astype(jnp.float32) * _LOG2E   # [T, C] — hoisted scale
    theta = theta_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    f = phi[:, :, None] * theta[:, None, :]         # [T, C, C] (scaled)
    m = jnp.max(f, axis=-1, keepdims=True)
    w = jnp.exp2(f - m)                             # [T, C, C]
    z = jnp.sum(w, axis=-1)
    y = jnp.sum(w * g[:, None, :], axis=-1)
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


def main():
    enable_compile_cache()
    # the XLA oracle's mixing einsum must not take the bf16 fast path
    jax.config.update("jax_default_matmul_precision", "highest")
    from relpose_gnn_tpu.ops.att_pallas import _kernel as kernel_exp
    from relpose_gnn_tpu.ops.att_pallas import attention_core_xla

    e_prod, c = 16384, 256   # production serving shape (B=256 graphs)

    @functools.partial(jax.jit, static_argnames=("kernel", "block_e", "e"))
    def step(kernel, e, block_e, salt):
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 3)
        mk = lambda kk: jax.random.normal(kk, (e, c), jnp.float32) + salt * 1e-6
        phi, theta, g = (mk(kk) for kk in ks)
        y = _call(kernel, phi, theta, g, block_e)
        return jnp.sum(y)

    # correctness first (tiny, also warms the small path)
    k = jax.random.PRNGKey(1)
    phi, theta, g = (jax.random.normal(kk, (64, c)) for kk in jax.random.split(k, 3))
    ref = attention_core_xla(phi, theta, g)
    got_exp = _call(kernel_exp, phi, theta, g, 16)
    got = _call(_kernel_exp2, phi, theta, g, 16)
    scale = float(jnp.max(jnp.abs(ref)))
    err_exp = float(jnp.max(jnp.abs(got_exp - ref))) / scale
    err = float(jnp.max(jnp.abs(got - ref))) / scale
    kk_err = float(jnp.max(jnp.abs(got - got_exp))) / scale
    print(f"rel err vs oracle  exp: {err_exp:.2e}  exp2: {err:.2e}  "
          f"kernel-vs-kernel: {kk_err:.2e}")
    assert err < 1e-5, err

    for block_e in (8, 16):
        t_exp = bench(lambda s, b=block_e: step(kernel_exp, e_prod, b, s))
        t_exp2 = bench(lambda s, b=block_e: step(_kernel_exp2, e_prod, b, s))
        print(f"block_e={block_e:3d}  exp: {t_exp:7.2f} ms   "
              f"exp2(prescaled): {t_exp2:7.2f} ms   ratio {t_exp/t_exp2:.3f}x")


if __name__ == "__main__":
    main()
