"""Full-scale training smoke on the real TPU: the R3 flagship must learn
the synthetic pose-from-pixels task, reducing actual relocalization error.

(The CPU test suite proves this on a tiny model; this script demonstrates
the production config learning on hardware.)

Measured (v5e): held-out median_t 1.68 -> 0.21 over 1000 steps (~99 s).
Note the corrected per-message attention math (round-2 parity fix,
ADVICE r1 #1) learns this task more slowly than round 1's erroneous
identity-reduced attention did (which hit 0.61 by step 300): eval error
rises transiently (~2.0 around step 300, mostly homoscedastic-weight
calibration) before dropping. Same trajectory with the attention compute
forced to the XLA path — the Pallas kernel + custom VJP is not a factor
(A/B measured 2026-08).
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.data.synthetic import make_device_batch_fn
from relpose_gnn_tpu.evaluation.evaluator import compute_pose_errors
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.training.trainer import (TrainerConfig,
                                              create_train_state,
                                              make_eval_step,
                                              make_train_step)


def main(steps: int = 1000):
    cfg = RelPoseGNNConfig.preset("R3", dtype=jnp.bfloat16)
    model = RelPoseGNN(cfg)
    tcfg = TrainerConfig(lr=3e-4, steps_per_epoch=1000, weight_decay=0.0)

    h, w = 256, 341
    gen_train = make_device_batch_fn(16, 8, h, w)     # fresh batch per step
    gen_test = make_device_batch_fn(32, 8, h, w)
    test_batch = gen_test(jax.random.PRNGKey(999))    # held out

    state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                               test_batch["images"][:1],
                               test_batch["adj"][:1])
    train_step = make_train_step(tcfg)
    eval_step = make_eval_step()

    def median_t(state):
        out = eval_step(state, test_batch)
        return compute_pose_errors(np.asarray(out["pred"]),
                                   np.asarray(out["target"])).median_t

    before = median_t(state)
    print(f"before: median_t={before:.3f}", flush=True)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(steps):
        batch = gen_train(jax.random.fold_in(key, i))  # new data every step
        state, m = train_step(state, batch, key)
        if (i + 1) % 100 == 0:
            print(f"step {i + 1}: loss={float(m['loss']):.4f} "
                  f"median_t={median_t(state):.3f}", flush=True)
    dt = time.perf_counter() - t0
    after = median_t(state)
    print(f"after {steps} steps ({dt:.0f}s): median_t {before:.3f} -> "
          f"{after:.3f}  ({'LEARNED' if after < before * 0.5 else 'weak'})",
          flush=True)


if __name__ == "__main__":
    main()
