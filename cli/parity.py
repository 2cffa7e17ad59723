#!/usr/bin/env python
"""Turnkey accuracy-parity harness against the reference's released
artifacts.

Given the released checkpoint (e.g. `relpose_gnn__multi_39.pth.tar`,
README.md:47-121) and the preprocessed test-graph directories (either the
reference's torch-geometric `processed/data_*.pt` tars — read WITHOUT
torch-geometric via data/pyg_import.py — or this repo's packed stores),
converts the weights, evaluates every scene with the reference protocol
(testing/test.py:180-286: knn-4 dynamic graph, anchor on the first kNN edge
into node 0, qexp, float64 medians), and prints per-scene medians with the
diff against the published table.

Example (the moment real artifacts are on disk):
    python cli/parity.py \
      --weights /data/relpose_gnn__multi_39.pth.tar \
      --graph-data-dir /data/7Scenes_graphs/ \
      --dataset-dir /data/7Scenes/            # optional: TestSplit check

No new code is needed when artifacts arrive; `tests/test_parity_cli.py`
runs this end-to-end on a synthetic stand-in today.
"""

import argparse
import sys
from pathlib import Path

# published 7-Scenes multi-scene results (README.md:47-121, filenames of the
# released prediction npz files, = paper Table 1)
PUBLISHED_7SCENES = {
    "chess": (0.09, 2.9),
    "fire": (0.23, 7.4),
    "heads": (0.13, 8.5),
    "office": (0.15, 4.1),
    "pumpkin": (0.17, 3.3),
    "redkitchen": (0.20, 3.6),
    "stairs": (0.23, 6.4),
}


def parse_args(argv):
    p = argparse.ArgumentParser("relpose_gnn_tpu parity")
    p.add_argument("--weights", required=True,
                   help="released .pth.tar checkpoint")
    p.add_argument("--graph-data-dir", required=True,
                   help="root containing <scene>_fc8_sp5_test dirs "
                        "(reference processed/*.pt or packed stores)")
    p.add_argument("--dataset", default="7Scenes",
                   choices=("7Scenes", "Cambridge"))
    p.add_argument("--scenes", default=None,
                   help="comma list; default = all scenes with published "
                        "numbers")
    p.add_argument("--dataset-dir", default=None,
                   help="raw dataset root; enables the TestSplit.txt "
                        "filename-count assertion (testing/test.py:115-121)")
    p.add_argument("--pose-stat-path", default="",
                   help="Cambridge translation stats file")
    p.add_argument("--model-name", default="R3")
    p.add_argument("--backbone", default="resnet34")
    p.add_argument("--seq-len", type=int, default=8)
    p.add_argument("--knn", type=int, default=4)
    p.add_argument("--img-height", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--save-dir", default=None,
                   help="export npz predictions here (reference convention)")
    return p.parse_args(argv)


def _scene_graph_dir(root: Path, scene: str, dataset: str,
                     seq_len: int, single_scene: bool = False) -> Path:
    """Resolve a scene's graph store.  The bare `root` fallback (pointing
    --graph-data-dir directly at one store) is only legal when evaluating
    a SINGLE scene — with several scenes it would silently evaluate the
    same store for every row of the parity table."""
    sp = 3 if dataset == "Cambridge" else 5
    cands = [root / f"{scene}_fc{seq_len}_sp{sp}_test", root / scene]
    if single_scene:
        cands.append(root)
    for cand in cands:
        if cand.is_dir() and (
                (cand / "meta.json").is_file()
                or (cand / "processed").is_dir()
                or list(cand.glob("data_*.pt"))):
            return cand
    raise FileNotFoundError(
        f"no graph store for {scene} under {root} (expected "
        f"{cands[0].name}/ or {scene}/"
        + (" or the root itself" if single_scene else "") + ")")


def _make_state(model, params, stats):
    import jax.numpy as jnp

    from relpose_gnn_tpu.training.trainer import TrainState

    return TrainState(step=jnp.zeros((), jnp.int32),
                      params={"model": params}, batch_stats=stats,
                      opt_state=(), tx=None, apply_fn=model.apply)


def _eval_pyg_dir(eval_step, state, gdir, img_height, batch_size):
    import numpy as np

    from relpose_gnn_tpu.data.pyg_import import iter_pyg_dir

    preds, targs, buf = [], [], []

    def flush():
        import jax.numpy as jnp
        if not buf:
            return
        batch = {k: jnp.asarray(np.stack([g[k] for g in buf]))
                 for k in ("images", "poses", "adj")}
        out = eval_step(state, batch)
        preds.append(np.asarray(out["pred"]))
        targs.append(np.asarray(out["target"]))
        buf.clear()

    count = 0
    for _, g in iter_pyg_dir(gdir, img_height):
        buf.append(g)
        count += 1
        if len(buf) == batch_size:
            flush()
    flush()
    return np.concatenate(preds), np.concatenate(targs), count


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    import numpy as np
    import jax
    import jax.numpy as jnp

    from relpose_gnn_tpu.data.packed import PackedGraphDataset
    from relpose_gnn_tpu.data.pipeline import data_iterator, device_prefetch
    from relpose_gnn_tpu.evaluation.evaluator import (compute_pose_errors,
                                                      save_poses)
    from relpose_gnn_tpu.models import convert
    from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
    from relpose_gnn_tpu.ops.graph import fc_edge_index, first_edge_anchor
    from relpose_gnn_tpu.training.trainer import make_eval_step

    if args.scenes:
        scenes = args.scenes.split(",")
    elif args.dataset == "7Scenes":
        scenes = list(PUBLISHED_7SCENES)
    else:
        # Cambridge publishes no in-repo table (BASELINE.md: paper Table 3
        # only) — default to all scenes rather than silently evaluating none
        from relpose_gnn_tpu.data.cambridge import CAMBRIDGE_SCENES
        scenes = list(CAMBRIDGE_SCENES)
    published = PUBLISHED_7SCENES if args.dataset == "7Scenes" else {}

    # --- model + converted released weights -------------------------------
    stage_sizes = {"resnet34": (3, 4, 6, 3),
                   "resnet18": (2, 2, 2, 2)}[args.backbone]
    sd = convert.load_torch_state_dict(args.weights)
    params, stats = convert.convert_relpose_gnn(sd, stage_sizes=stage_sizes)
    feat_dim = params["proj_edge"]["kernel"].shape[0] // 2  # infer from ckpt
    cfg = RelPoseGNNConfig.preset(
        args.model_name if args.model_name in ("R1", "R2", "R3") else "R3",
        num_nodes=args.seq_len, knn=args.knn, droprate=0.0,
        backbone=args.backbone, feat_dim=feat_dim, edge_dim=feat_dim,
        node_dim=feat_dim,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
    model = RelPoseGNN(cfg)
    state = _make_state(model, params, stats)

    static_anchor = (None if args.knn > 0
                     else first_edge_anchor(fc_edge_index(args.seq_len)))
    eval_step = make_eval_step(ref_node=0, static_anchor=static_anchor)

    mean_t, std_t = np.zeros(3), np.ones(3)
    if args.dataset == "Cambridge" and args.pose_stat_path:
        mean_t, std_t = np.loadtxt(args.pose_stat_path)

    # --- per-scene evaluation ---------------------------------------------
    root = Path(args.graph_data_dir)
    rows = []
    for scene in scenes:
        gdir = _scene_graph_dir(root, scene, args.dataset, args.seq_len,
                                single_scene=len(scenes) == 1)
        if (gdir / "meta.json").is_file():  # packed store
            ds = PackedGraphDataset(str(gdir))
            preds, targs = [], []
            it = data_iterator(ds, batch_size=args.batch_size,
                               shuffle=False, epochs=1,
                               drop_remainder=False)
            for batch in device_prefetch(it, ds.mean, ds.std):
                out = eval_step(state, batch)
                preds.append(np.asarray(out["pred"]))
                targs.append(np.asarray(out["target"]))
            preds, targs = np.concatenate(preds), np.concatenate(targs)
            count = len(ds)
        else:  # reference torch-geometric pickles
            preds, targs, count = _eval_pyg_dir(
                eval_step, state, gdir, args.img_height, args.batch_size)

        if args.dataset_dir and args.dataset == "7Scenes":
            from relpose_gnn_tpu.data.seven_scenes import test_split_rgb_paths
            test_split_rgb_paths(args.dataset_dir, scene,
                                 expected_count=count)

        err = compute_pose_errors(preds, targs, pose_mean=mean_t,
                                  pose_std=std_t)
        pub = published.get(scene)
        rows.append((scene, err, pub))
        if args.save_dir:
            save_poses(args.save_dir, scene, err)

    # --- report ------------------------------------------------------------
    print(f"{'scene':<12} {'med t':>7} {'med rot':>8}"
          f" {'pub t':>7} {'pub rot':>8} {'d t':>7} {'d rot':>7}")
    for scene, err, pub in rows:
        if pub:
            print(f"{scene:<12} {err.median_t:7.3f} {err.median_q:8.2f}"
                  f" {pub[0]:7.2f} {pub[1]:8.1f}"
                  f" {err.median_t - pub[0]:+7.3f}"
                  f" {err.median_q - pub[1]:+7.2f}")
        else:
            print(f"{scene:<12} {err.median_t:7.3f} {err.median_q:8.2f}"
                  f" {'-':>7} {'-':>8} {'-':>7} {'-':>7}")
    return rows


if __name__ == "__main__":
    main()
