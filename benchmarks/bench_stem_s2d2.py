"""Probe: 4x4-packed ("double space-to-depth") stem vs the plain 7x7/s2.

bench_backbone_stages measured the stem at 26 TF/s (13% of peak): the
3-input-channel conv starves the MXU contraction dim.  The round-3 s2d
stem (2x2 pack -> 4x4/s1 over 12ch) won 14% standalone at batch 256 but
LOST ~5% composed (models/fold_bn.py).  This probes the next rung up:

  pad the 7x7/s2 kernel to 8x8/s2, pack the input 4x4
  ([B, 64, 86, 48] for 256x341), and run a 3x3/s1 conv producing all
  2x2 output phases at once (256 = 2x2x64 channels), then
  depth-to-space back to [B, 128, 171, 64].

  K = 3x3x48 = 432 (vs 147 true taps -> 2.25x structural-zero FLOPs),
  N = 256 (vs 64).  Worth it iff the utilization gain beats the FLOP
  inflation; this probe times the SHAPE with random weights (the exact
  weight transform is only worth building if the standalone win is
  large enough to survive composition, which history says costs
  ~10-20%).

Timing includes the packing transpose, the depth-to-space, and the
same 3x3/s2 maxpool as the baseline stem measurement, so the numbers
are directly comparable to bench_backbone_stages --stage stem.

Run:  python benchmarks/bench_stem_s2d2.py [--batch 512]

MEASURED (single v5e, warm cache, batch 512): 15.73 ms vs the plain
stem's 8.04 ms — 2x SLOWER standalone, dead on arrival (the exact
weight transform was therefore never built).  The 2.25x structural-
zero FLOPs plus the two packing transposes cost far more than the
utilization gain returns; XLA's own lowering of the 7x7/s2 stem is
the best available form on this toolchain.
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import functools

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from benchmarks._util import bench, enable_compile_cache


def packed_stem(x, w, b):
    """x [B, H, W, 3] (H%4==0), w [3, 3, 48, 256], b [256]."""
    bsz, h, w_in, c = x.shape
    pw = (-w_in) % 4
    if pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pw), (0, 0)))
    w4 = (w_in + pw) // 4
    h4 = h // 4
    # pack 4x4 pixel blocks into channels: [B, h4, w4, 48]
    x = x.reshape(bsz, h4, 4, w4, 4, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(bsz, h4, w4, 16 * c)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    # depth-to-space: 256 = (2 phases_y) x (2 phases_x) x 64
    y = y.reshape(bsz, h4, w4, 2, 2, 64).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(bsz, h4 * 2, w4 * 2, 64)
    return y[:, : h // 2, : (w_in + 1) // 2, :]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()
    enable_compile_cache()

    bsz, h, w_in = args.batch, 256, 341
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(bsz, h, w_in, 3)), jnp.bfloat16)
    wk = jnp.asarray(rng.normal(size=(3, 3, 48, 256)) * 0.05, jnp.bfloat16)
    bk = jnp.asarray(rng.normal(size=(256,)) * 0.05, jnp.bfloat16)

    @functools.partial(jax.jit)
    def step(w, b, x, salt):
        y = packed_stem(x * (1 + salt.astype(jnp.bfloat16) * 1e-6), w, b)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return jnp.sum(y.astype(jnp.float32))

    # shape sanity
    y = packed_stem(x0[:2], wk, bk)
    assert y.shape == (2, 128, 171, 64), y.shape

    t_ms = bench(lambda salt: step(wk, bk, x0, salt))
    gf_true = 2 * (h // 2) * ((w_in + 1) // 2) * 147 * 64 * bsz / 1e9
    print(f"packed 4x4 stem: {t_ms:7.2f} ms  (true-tap {gf_true:.1f} GFLOP "
          f"-> {gf_true / t_ms:.1f} effective TF/s; baseline stem "
          f"8.04 ms / 26.1 TF/s at batch 512)", flush=True)


if __name__ == "__main__":
    main()
