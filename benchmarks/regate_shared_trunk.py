"""Re-gate the shared-trunk retrieval knob with TRAINED weights
(VERDICT r4 weak #1 / next-round #6): round 4 justified the 2.55x knob
with a neighbor-overlap number measured at RANDOM init — noise-level
plausibility, not evidence.  This driver runs the gate the right way
round, using the convergence campaign's trained checkpoint (ACC_r05):

  per scene, DB = the scene's TRAIN frames (raw 7-Scenes-layout images +
  pose6), queries = its TEST frames, through the REAL serving path
  (RelocalizationService.query at production dims 256x341), once per
  retrieval mode:

    netvlad      — the reference protocol (VGG16+NetVLAD descriptors)
    shared-trunk — rank on the trained backbone embeddings the query
                   step already computes (ServiceConfig.retrieval)

  and reports the END-TASK absolute-pose medians (median_t m / median_q
  deg vs GT, evaluation/evaluator.compute_pose_errors — the same math as
  cli/test.py) plus the neighbor-set overlap between the two modes.

The campaign data is synthetic (no egress), so the netvlad side runs
untrained VGG16 weights — the honest comparison is therefore END-TASK
medians (both modes feed the same trained GNN; only neighbor selection
differs), not descriptor quality in the abstract.  Results land in
REGATE_r05.json and gate ServiceConfig.retrieval's documentation.

    python benchmarks/regate_shared_trunk.py \
        --ckpt /root/campaign/out/7Scenes/multi/acc_r05/ckpt \
        --data-root /root/campaign/raw --stats-root /root/campaign/stats \
        --out REGATE_r05.json
"""

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json

import numpy as np
import jax
import jax.numpy as jnp

from benchmarks._util import enable_compile_cache
enable_compile_cache()

SCENES = ("chess", "fire", "heads", "office", "pumpkin", "redkitchen",
          "stairs")


def load_frames(data_root: str, scene: str, train: bool):
    """Raw frames in [0,1] (NO stats normalization — the service applies
    model_norm on device) + pose6 rows, via the same loader/resize the
    graph builder uses (data/seven_scenes.py)."""
    from relpose_gnn_tpu.data.seven_scenes import SevenScenes
    ds = SevenScenes(scene=scene, data_path=data_root, train=train)
    imgs, poses = [], []
    for i in range(len(ds)):
        img, pose, _ = ds[i]
        imgs.append(img)
        poses.append(pose)
    return (np.stack(imgs).astype(np.float32),
            np.stack(poses).astype(np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="Orbax checkpoint manager dir (latest step wins)")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--stats-root", required=True)
    ap.add_argument("--scenes", default=",".join(SCENES))
    ap.add_argument("--out", default="REGATE_r05.json")
    ap.add_argument("--db-batch", type=int, default=16)
    args = ap.parse_args()

    from relpose_gnn_tpu.data.seven_scenes import load_scene_stats
    from relpose_gnn_tpu.evaluation.evaluator import compute_pose_errors
    from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                    ServiceConfig)
    from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
    from relpose_gnn_tpu.training import checkpoints as ckpt_lib
    from relpose_gnn_tpu.training.experiment import (ExperimentConfig,
                                                     _jit_init, build_model)
    from relpose_gnn_tpu.training.trainer import (TrainerConfig,
                                                  create_train_state)

    # same architecture the campaign trained (cli/train.py defaults: R3,
    # seq_len 8, knn 4, bf16 compute / f32 params)
    cfg = ExperimentConfig()
    model = build_model(cfg)
    sample = {"images": np.zeros((1, cfg.seq_len, 256, 341, 3), np.float32),
              "adj": ~np.eye(cfg.seq_len, dtype=bool)[None]}
    state = create_train_state(
        jax.random.PRNGKey(0), model, TrainerConfig(),
        jnp.asarray(sample["images"]), jnp.asarray(sample["adj"]),
        variables=_jit_init(model, cfg, sample))
    state = ckpt_lib.restore_checkpoint(args.ckpt, state)
    print(f"restored step {int(state.step)} from {args.ckpt}", flush=True)
    model_vars = {"params": state.params["model"],
                  "batch_stats": state.batch_stats}

    netvlad = NetVLADEncoder(dtype=jnp.bfloat16)
    nv_vars = jax.jit(lambda k: netvlad.init(
        k, jnp.ones((1, 192, 256, 3))))(jax.random.PRNGKey(1))

    results = {"ckpt": args.ckpt, "step": int(state.step), "scenes": {},
               "protocol": "serving-path A/B: DB=train frames, "
                           "queries=test frames, deterministic strided "
                           "retrieval, trained R3 GNN on both sides; "
                           "netvlad trunk weights are UNTRAINED (no "
                           "egress) — compare END-TASK medians"}
    for scene in args.scenes.split(","):
        mean, std = load_scene_stats(args.stats_root, scene)
        mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

        def model_norm(x):
            return (x - mean_j) / std_j

        db_imgs, db_poses = load_frames(args.data_root, scene, train=True)
        q_imgs, q_poses = load_frames(args.data_root, scene, train=False)
        row = {}
        nbr_sets = {}
        for mode in ("netvlad", "shared-trunk"):
            svc = RelocalizationService(
                model, model_vars,
                None if mode == "shared-trunk" else netvlad,
                None if mode == "shared-trunk" else nv_vars,
                ServiceConfig(retrieval=mode, deterministic=True))
            svc.build(db_imgs, db_poses, model_norm, batch=args.db_batch)
            out = svc.query(q_imgs, model_norm, jax.random.PRNGKey(0))
            pred = np.asarray(out["pose"], np.float64)
            err = compute_pose_errors(pred, q_poses)
            nbr_sets[mode] = np.asarray(out["neighbors"])
            row[mode] = {"median_t": round(err.median_t, 4),
                         "median_q": round(err.median_q, 3),
                         "mean_t": round(err.mean_t, 4),
                         "mean_q": round(err.mean_q, 3)}
            print(f"[{scene}] {mode}: median_t {err.median_t:.3f} m  "
                  f"median_q {err.median_q:.2f} deg", flush=True)
        k = nbr_sets["netvlad"].shape[1]
        row["neighbor_overlap"] = round(float(np.mean(
            [len(set(a) & set(b)) / k
             for a, b in zip(nbr_sets["netvlad"],
                             nbr_sets["shared-trunk"])])), 4)
        print(f"[{scene}] neighbor overlap: {row['neighbor_overlap']}",
              flush=True)
        results["scenes"][scene] = row

    meds = {m: {"median_t": round(float(np.median(
                    [r[m]["median_t"] for r in results["scenes"].values()]
                )), 4),
                "median_q": round(float(np.median(
                    [r[m]["median_q"] for r in results["scenes"].values()]
                )), 3)}
            for m in ("netvlad", "shared-trunk")}
    results["across_scenes"] = meds
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {args.out}: {json.dumps(meds)}", flush=True)


if __name__ == "__main__":
    main()
