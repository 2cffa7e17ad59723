"""Pallas TPU kernel: fused pair-MLP for dense edge-featured message passing.

The GNN hot op applies a two-layer MLP to every ordered node pair
(SURVEY.md §7: "fuse edge-MLP + mean-aggregate + node-update ... into one
Pallas kernel"):

    out[p] = relu(xs[p] @ W1a + xt[p] @ W1b + e[p] @ W1c + b1) @ W2 + b2

This kernel:
  * never materializes the [E, 2D+De] concatenated input (the torch
    reference concatenates explicitly, my_gnn_layer.py:236-238) — the first
    layer is computed as three partial matmuls against weight slices;
  * never round-trips the [E, H] hidden activation through HBM — hidden
    tiles are produced, ReLU'd and immediately contracted against W2 inside
    VMEM, with a float32 accumulator in the output block;
  * streams weight tiles over a (edge-tile, hidden-tile) grid so the
    2048-wide production dims fit VMEM in bfloat16.

The aggregation/update stages stay in XLA (they are bandwidth-trivial at
N=8 and fuse well).

MEASURED STATUS — RETIRED from the production path after the round-2
showdown (v5e, bf16, cache-proof salted inputs + chained accumulator,
20 iters, tunnel RTT subtracted; benchmarks/bench_pallas_gnn.py).  The
round-1 numbers (17-20 ms pallas vs 1.1-1.9 ms XLA) were distorted by
per-launch tunnel dispatch (~5 ms/iter at 10 iters) and result caching
of the repeated XLA executions; the honest table:

    config                      pallas(best)   XLA concat   XLA split-wt
    B=16 N=8  D=H=2048 (prod)      0.375 ms      0.450 ms     0.132 ms
    B=16 N=32 D=H=2048 (stretch)   3.938 ms      3.271 ms     2.396 ms
                                  (139.6 TF/s)  (168.1 TF/s)  (winner)

So the kernel BEATS XLA's concat formulation at N=8 and runs a healthy
139 TFLOP/s at N=32 — but the split-weight reformulation in
models/gnn.py::PairMLP2 (node slabs hit the MXU once per node, only the
edge operand pays per-pair FLOPs) dominates both at every measured
config, because it deletes ~36% of the FLOPs rather than scheduling
them better.  A weight-outer grid variant that mis-accumulated on
hardware was deleted in round 1; block sizes >= (256, 512) at N=32
exceed the 16 MB scoped-VMEM limit (measured, skipped by the bench).
The kernel is retained as the validated interpret-tested custom-op path;
the Pallas win on this model is the attention core (ops/att_pallas.py),
where the op is HBM-bound and XLA cannot fuse.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xs_ref, xt_ref, e_ref, w1a_ref, w1b_ref, w1c_ref, b1_ref,
            w2_ref, b2_ref, out_ref):
    j = pl.program_id(1)

    # hidden tile for this (edge-tile, hidden-tile): [BE, BH]
    h = jnp.dot(xs_ref[:], w1a_ref[:], preferred_element_type=jnp.float32)
    h += jnp.dot(xt_ref[:], w1b_ref[:], preferred_element_type=jnp.float32)
    h += jnp.dot(e_ref[:], w1c_ref[:], preferred_element_type=jnp.float32)
    h += b1_ref[:]
    h = jnp.maximum(h, 0.0)

    # contract against the matching W2 rows; accumulate over hidden tiles
    # directly in the revisited (VMEM-resident) output block
    partial = jnp.dot(h.astype(w2_ref.dtype), w2_ref[:],
                      preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        out_ref[:] = partial + b2_ref[:]

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + partial


@functools.partial(jax.jit,
                   static_argnames=("block_e", "block_h", "interpret"))
def fused_pair_mlp(xs: jax.Array, xt: jax.Array, e: jax.Array,
                   w1a: jax.Array, w1b: jax.Array, w1c: jax.Array,
                   b1: jax.Array, w2: jax.Array, b2: jax.Array,
                   block_e: int = 128, block_h: int = 256,
                   interpret: bool = False) -> jax.Array:
    """relu(xs@w1a + xt@w1b + e@w1c + b1) @ w2 + b2 over flattened pairs.

    xs, xt: [E, D]; e: [E, De]; w1*: [., H]; w2: [H, Dout].
    E must be padded to a multiple of `block_e` and H to `block_h`
    (guaranteed by `pair_mlp_apply` below).  Returns float32 [E, Dout].
    """
    n_e, _ = xs.shape
    hidden = w1a.shape[1]
    d_out = w2.shape[1]
    assert n_e % block_e == 0 and hidden % block_h == 0, (n_e, hidden)
    grid = (n_e // block_e, hidden // block_h)  # hidden INNER: the output
    # block stays VMEM-resident across consecutive accumulation steps

    cdtype = w1a.dtype
    b1 = b1.reshape(1, hidden).astype(jnp.float32)
    b2 = b2.reshape(1, d_out).astype(jnp.float32)

    flops = 2 * n_e * hidden * (xs.shape[1] + xt.shape[1] + e.shape[1]
                                + d_out)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_e, xs.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, xt.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_e, e.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1a.shape[0], block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1b.shape[0], block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w1c.shape[0], block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, d_out), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_e, d_out), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_e, d_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(xs.size + xt.size + e.size) * cdtype.itemsize
            + (w1a.size * 3 + w2.size) * cdtype.itemsize
            + n_e * d_out * 4,
            transcendentals=0),
        interpret=interpret,
    )(xs.astype(cdtype), xt.astype(cdtype), e.astype(cdtype),
      w1a, w1b, w1c, b1, w2, b2)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pair_mlp_apply(x: jax.Array, e: jax.Array, fc1_kernel: jax.Array,
                   fc1_bias: jax.Array, fc2_kernel: jax.Array,
                   fc2_bias: jax.Array, mode: str = "edge",
                   dtype=jnp.bfloat16, block_e: int = 128,
                   block_h: int = 256, interpret: bool = False) -> jax.Array:
    """Dense-layer entry point: batch [B, N, D] nodes + [B, N, N, De] edges.

    mode='edge':  out[s,t] = MLP2([x_s, x_t, e_st])   (edge update)
    mode='msg':   out[s,t] = MLP2([x_s, e_st])        (message MLP)

    Splits the stored concat-layout fc1 kernel into per-operand slices,
    flattens pairs, pads E and H to tile multiples, and calls the kernel.
    """
    b, n, d = x.shape
    de = e.shape[-1]
    hidden = fc1_kernel.shape[1]
    n_pairs = b * n * n

    xs = jnp.broadcast_to(x[:, :, None, :], (b, n, n, d)).reshape(-1, d)
    xt = jnp.broadcast_to(x[:, None, :, :], (b, n, n, d)).reshape(-1, d)
    ef = e.reshape(-1, de)

    if mode == "edge":
        w1a = fc1_kernel[:d]
        w1b = fc1_kernel[d:2 * d]
        w1c = fc1_kernel[2 * d:]
    elif mode == "msg":
        w1a = fc1_kernel[:d]
        w1b = jnp.zeros((d, hidden), fc1_kernel.dtype)
        w1c = fc1_kernel[d:]
    else:
        raise ValueError(mode)

    e_pad = _round_up(n_pairs, block_e)
    h_pad = _round_up(hidden, block_h)
    if e_pad != n_pairs:
        pad = e_pad - n_pairs
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        xt = jnp.pad(xt, ((0, pad), (0, 0)))
        ef = jnp.pad(ef, ((0, pad), (0, 0)))
    if h_pad != hidden:
        hp = h_pad - hidden
        w1a = jnp.pad(w1a, ((0, 0), (0, hp)))
        w1b = jnp.pad(w1b, ((0, 0), (0, hp)))
        w1c = jnp.pad(w1c, ((0, 0), (0, hp)))
        fc1_bias = jnp.pad(fc1_bias, (0, hp))
        fc2_kernel = jnp.pad(fc2_kernel, ((0, hp), (0, 0)))

    out = fused_pair_mlp(
        xs, xt, ef,
        w1a.astype(dtype), w1b.astype(dtype), w1c.astype(dtype),
        fc1_bias, fc2_kernel.astype(dtype), fc2_bias,
        block_e=block_e, block_h=block_h, interpret=interpret)
    return out[:n_pairs].reshape(b, n, n, -1)
