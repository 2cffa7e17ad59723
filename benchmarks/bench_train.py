"""Training-step throughput + MFU on the attached TPU (tunnel-safe).

Measures the full jitted train step (forward + masked homoscedastic L1 +
grads + Adam) of the flagship R3 config at the reference's production
shapes (graphs of 8 nodes at 256x341; the reference trains batch 8,
training/train.py:55-59), across a batch ladder and the memory knobs:

    python benchmarks/bench_train.py --batches 8,16,32
    python benchmarks/bench_train.py --batches 64 --remat
    python benchmarks/bench_train.py --batches 32 --grad-accum 2

MFU comes from the SAME AOT-compiled executable that is timed (XLA cost
analysis over the chip's dense-bf16 peak).  Each row prints as it lands
and the run ends with ONE JSON line ({"train": [rows...]}) so the numbers
are versionable artifacts (VERDICT r3 weak #5: the round-2 "~330
graphs/s, at its roofline" claim had no round-3 measurement behind it).

Protocol notes (CLAUDE.md): persistent compile cache on (cold compiles
are minutes through the tunnel — warm runs seconds); distinct per-step
executions come free because state.step advances and Adam moments
change; chaining the loss into an accumulator defeats async dispatch;
two warm steps before timing (the first chained execution pays a
one-time dispatch cost).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks._util import (chip_peak_flops, compiled_flops,
                              enable_compile_cache)
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops
from relpose_gnn_tpu.training.trainer import (TrainerConfig,
                                              create_train_state,
                                              make_train_step)

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="8,16",
                    help="comma list of batch sizes (one compile each, "
                         "~minutes cold / seconds warm through the tunnel)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the backbone (rematerialization: "
                         "recompute activations in backward, trading FLOPs "
                         "for HBM — the B=64 enabler)")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="optax.MultiSteps micro-batching (k accumulation "
                         "steps per optimizer update)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--model-name", default="R3")
    ap.add_argument("--compile-only", action="store_true",
                    help="populate the persistent compile cache and exit "
                         "(cold compiles are minutes through the tunnel; "
                         "run once with this, then time in a second "
                         "invocation that stays inside its timeout)")
    args = ap.parse_args()

    z = jnp.zeros(())
    float(z + 1.0)
    t0 = time.perf_counter()
    for _ in range(10):
        float(z + 1.0)
    rtt = (time.perf_counter() - t0) / 10
    print(f"rtt: {rtt * 1e3:.1f} ms  device: "
          f"{jax.devices()[0].device_kind}", flush=True)

    cfg = RelPoseGNNConfig.preset(args.model_name, dtype=jnp.bfloat16,
                                  remat=args.remat)
    model = RelPoseGNN(cfg)
    tcfg = TrainerConfig(steps_per_epoch=100, grad_accum=args.grad_accum)
    h, w, n = 256, 341, cfg.num_nodes
    peak = chip_peak_flops()

    rows = []
    for batch_size in [int(b) for b in args.batches.split(",")]:
        key = jax.random.PRNGKey(batch_size)
        images = jax.random.normal(key, (batch_size, n, h, w, 3),
                                   jnp.float32)
        poses = jax.random.normal(key, (batch_size, n, 6), jnp.float32)
        adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(n),
                                          (batch_size, n, n)).copy())
        batch = {"images": images, "poses": poses, "adj": adj}
        # jitted init: eager flax init pays ~30 ms RTT per param
        # initializer through the tunnel (~95 s for ResNet34)
        t0 = time.perf_counter()
        variables = jax.jit(
            lambda k: model.init({"params": k, "dropout": k},
                                 images[:1], adj[:1], train=False)
        )(jax.random.PRNGKey(0))
        print(f"B={batch_size}: init {time.perf_counter() - t0:.0f}s",
              flush=True)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   images[:1], adj[:1],
                                   variables=variables)
        train_step = make_train_step(tcfg)
        rng = jax.random.PRNGKey(1)
        print(f"B={batch_size}: compiling...", flush=True)
        # AOT: one compile reused for cost analysis AND the timed loop
        # (donated state arg means the executable is the same program the
        # jitted path runs)
        t0 = time.perf_counter()
        compiled = train_step.lower(state, batch, rng).compile()
        print(f"B={batch_size}: compiled in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        if args.compile_only:
            continue
        flops = compiled_flops(compiled)
        # two warm steps: executable warm-up + the one-time chained-
        # execution dispatch cost (CLAUDE.md)
        state, m = compiled(state, batch, rng)
        float(m["loss"])
        state, m = compiled(state, batch, rng)
        float(m["loss"])
        t0 = time.perf_counter()
        acc = jnp.zeros(())
        for _ in range(args.iters):
            # state.step advances every iteration -> distinct executions;
            # chaining through the loss defeats async dispatch
            state, m = compiled(state, batch, rng)
            acc = acc + m["loss"]
        float(acc)
        dt = (time.perf_counter() - t0 - rtt) / args.iters
        mfu = (flops / dt / peak) if (peak and flops) else None
        row = {"batch": batch_size, "remat": bool(args.remat),
               "grad_accum": args.grad_accum,
               "ms_per_step": round(dt * 1e3, 2),
               "graphs_per_s": round(batch_size / dt, 1),
               "flops_per_step": flops,
               "mfu": round(mfu, 3) if mfu is not None else None}
        rows.append(row)
        print(f"B={batch_size}: {dt * 1e3:.1f} ms/step  "
              f"{batch_size / dt:.1f} graphs/s  mfu={row['mfu']}  "
              f"(loss finite: {bool(jnp.isfinite(m['loss']))})",
              flush=True)
    print(json.dumps({"train": rows,
                      "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
