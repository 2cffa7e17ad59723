"""Per-stage roofline probe for the serving backbone (folded ResNet34).

The composed serving step runs the backbone at ~65% of bf16 peak
(DESIGN.md batch-512 bisect); the stem and the pipelined-retrieval
levers are measured dead ends.  This probe times each stage of the
folded ResNet34 in ISOLATION at the production serving shape
(256x341, bf16, batch 512 default) to find which stage(s) sit below
peak — the conv tail (8x11 spatial at 512 channels) is the suspect.

Each stage runs as its own jitted program with device-resident inputs
and the salted chained-accumulator protocol (benchmarks/_util.bench).
Run ONE stage per invocation to stay inside the tunnel-safe window:

    python benchmarks/bench_backbone_stages.py --stage stem  [--batch 512]
    python benchmarks/bench_backbone_stages.py --stage layer3 ...

Stage shapes at 256x341 (NHWC, after the 7x7/s2 stem + 3x3/s2 maxpool):
    stem    [B, 256, 341, 3]  -> [B, 64, 86, 64]
    layer1  [B, 64, 86, 64]   -> same            (3 blocks)
    layer2  [B, 64, 86, 64]   -> [B, 32, 43, 128] (4 blocks, s2 entry)
    layer3  [B, 32, 43, 128]  -> [B, 16, 22, 256] (6 blocks, s2 entry)
    layer4  [B, 16, 22, 256]  -> [B, 8, 11, 512]  (3 blocks, s2 entry)
    head    [B, 8, 11, 512]   -> [B, 2048]        (f32 mean + fc)

MEASURED (single v5e, warm cache, batch 512, bf16, isolated stages —
each stage pays its own salted-input materialization, so the SUM runs
slightly over the composed bisect's 48.5 ms backbone figure; the
per-stage ratios are the signal):

    stage   time-ms   GFLOP    TF/s   %peak
    stem      8.04     209.6    26.1    13%   <- 3-in-channel conv
    layer1   11.22    1246.6   111.1    56%   <- Cout=64 at 64x86
    layer2   10.17    1569.8   154.3    78%
    layer3   14.23    2345.1   164.8    84%
    layer4    7.13    1181.1   165.7    84%
    head      1.55       1.1     0.7     —    (dispatch/HBM floor; tiny)

Reading: the conv TAIL hypothesis is dead — layer3/4 run at 84% of
peak, as healthy as a conv net gets here.  The budget sits in the
high-resolution low-channel FRONT (stem 13%, layer1 56%), whose
ceilings are shape-architectural (3 input channels; 64 output
channels).  Every exact restructuring of that front has now been
measured and lost: 2x2 s2d stem (wins 14% standalone at b256, loses
~5% composed — models/fold_bn.py), 4x4 packed stem (2x SLOWER even
standalone — bench_stem_s2d2.py).  The backbone stands at its
XLA-practical roofline.
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
from relpose_gnn_tpu.models.resnet import BasicBlock

# (in_ch, spatial_in, blocks, out_ch) per stage at 256x341
_STAGES = {
    "stem":   dict(shape=(256, 341, 3)),
    "layer1": dict(shape=(64, 86, 64),  blocks=3, filters=64,  stride=1),
    "layer2": dict(shape=(64, 86, 64),  blocks=4, filters=128, stride=2),
    "layer3": dict(shape=(32, 43, 128), blocks=6, filters=256, stride=2),
    "layer4": dict(shape=(16, 22, 256), blocks=3, filters=512, stride=2),
    "head":   dict(shape=(8, 11, 512)),
}


class _Stem(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=True,
                    dtype=jnp.bfloat16, name="conv1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)))


class _Stage(nn.Module):
    blocks: int
    filters: int
    stride: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.blocks):
            x = BasicBlock(self.filters, stride=self.stride if i == 0 else 1,
                           dtype=jnp.bfloat16, folded=True,
                           name=f"b{i}")(x, train=False)
        return x


class _Head(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(2048, name="fc")(x)


def _conv_flops(h, w, cin, cout, k, stride):
    return 2 * (h // stride) * (w // stride) * cin * cout * k * k


def stage_flops(name, batch):
    s = _STAGES[name]
    h, w, c = s["shape"]
    if name == "stem":
        return batch * _conv_flops(h, w, 3, 64, 7, 2)
    if name == "head":
        return batch * 2 * 512 * 2048
    f = 0
    filters, stride = s["filters"], s["stride"]
    for i in range(s["blocks"]):
        st = stride if i == 0 else 1
        f += _conv_flops(h, w, c, filters, 3, st)          # conv1
        f += _conv_flops(h // st, w // st, filters, filters, 3, 1)  # conv2
        if i == 0 and (c != filters or stride != 1):
            f += _conv_flops(h, w, c, filters, 1, stride)  # downsample
        h, w, c = h // st, w // st, filters
    return batch * f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=sorted(_STAGES), required=True)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    enable_compile_cache()
    s = _STAGES[args.stage]
    h, w, c = s["shape"]
    if args.stage == "stem":
        mod = _Stem()
    elif args.stage == "head":
        mod = _Head()
    else:
        mod = _Stage(blocks=s["blocks"], filters=s["filters"],
                     stride=s["stride"])
    variables = jax.jit(lambda k: mod.init(
        k, jnp.zeros((1, h, w, c), jnp.bfloat16)))(jax.random.PRNGKey(0))
    x0 = jnp.asarray(
        np.random.default_rng(0).normal(size=(args.batch, h, w, c)),
        jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=())
    def step(v, x, salt):
        y = mod.apply(v, x * (1 + salt.astype(jnp.bfloat16) * 1e-6))
        return jnp.sum(y.astype(jnp.float32))

    t_ms = bench(lambda salt: step(variables, x0, salt))
    gf = stage_flops(args.stage, args.batch) / 1e9
    tfs = gf / t_ms
    print(f"{args.stage}: {t_ms:7.2f} ms   {gf:8.1f} GFLOP   "
          f"{tfs:6.1f} TF/s   {100 * tfs / 197:4.1f}% of v5e bf16 peak",
          flush=True)


if __name__ == "__main__":
    main()
