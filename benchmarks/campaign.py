"""Offline convergence campaign through the FULL driver protocol
(VERDICT r4 next-round #1).

Real 7-Scenes data is unreachable here (no egress), so the campaign runs
the complete reference protocol — raw scenes -> cli/build_graphs.py ->
cli/train.py (epoch loop, in-loop per-scene eval, ckpt at 149/199) ->
cli/test.py -> npz — on the synthetic multi-scene generator
(data/synthetic_scenes.py), at the production config: R3 preset
(ResNet34, 2048-dim GNN), 256x341 images, fc8 graphs, batch 8, 200
epochs, the reference's lr/decay schedule.  What it proves: THIS training
stack (driver, sharded/AOT steps, homoscedastic loss, eval protocol,
checkpointing) trains the flagship model to convergence end-to-end; what
it cannot prove offline: medians on the real scenes (BASELINE.md) — that
still needs the released datasets, for which cli/parity.py stays the
turnkey path.

Subcommands:
  prepare  — write raw scenes + stats, build the 14 packed graph stores
  report   — fold <logdir>/metrics.jsonl (+ final npz medians) into
             ACC_r05.json: per-epoch loss curve, per-scene median curves,
             best/final medians, config, wall-clock, reproduction lines

The training itself is plain cli/train.py (chunked with --ckpt-every +
--resume around the dev tunnel's foreground budget); report embeds the
exact command lines.
"""

import argparse
import json
import os
import os.path as osp
import subprocess
import sys
import time

_REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, _REPO)

SCENES = ("chess", "fire", "heads", "office", "pumpkin", "redkitchen",
          "stairs")

TRAIN_CMD = ("python cli/train.py --dataset 7Scenes --experiment 0 "
             "--test-scene multi --train-data-dir {graphs} "
             "--test-data-dir {graphs} --save-dir {out} --exp-name acc_r05 "
             "--model-name R3 --batch-size 8 --seq-len 8 --max-epoch 200 "
             "--eval-after-epoch 100 --ckpt-every 10 --device-cache "
             "--resume --seed 0")
TEST_CMD = ("python cli/test.py --dataset 7Scenes --test-scene multi "
            "--test-data-dir {graphs} --save-dir {out} "
            "--weights-filename {ckpt} --batch-size 8 --seq-len 8")


def prepare(root: str, frames_per_seq: int, train_seqs: int,
            test_seqs: int, height: int, width: int, seq_len: int) -> None:
    from relpose_gnn_tpu.data.synthetic_scenes import generate_dataset

    raw = osp.join(root, "raw")
    stats = osp.join(root, "stats")
    graphs = osp.join(root, "graphs")
    t0 = time.time()
    generate_dataset(raw, SCENES, stats, n_train_seqs=train_seqs,
                     n_test_seqs=test_seqs, frames_per_seq=frames_per_seq,
                     height=height, width=width, seed=0)
    print(f"raw scenes written ({time.time() - t0:.0f}s)", flush=True)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=_REPO)
    for mode in ("train", "test"):
        cmd = [sys.executable, osp.join(_REPO, "cli", "build_graphs.py"),
               "multi", mode, "--data-path", raw, "--graph-data-path",
               graphs, "--stats-path", stats, "--sampling-method", "RAND",
               "--seq-len", str(seq_len)]
        print(" ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, env=env)
    print(f"prepare done ({time.time() - t0:.0f}s)")


def report(logdir: str, out_path: str, graphs: str, out_root: str,
           eval_dir: str | None = None, wall_s: float | None = None
           ) -> None:
    metrics = osp.join(logdir, "metrics.jsonl")
    loss_curve, eval_curves = [], {}
    with open(metrics) as f:
        for line in f:
            rec = json.loads(line)
            if "scene" in rec:
                eval_curves.setdefault(rec["scene"], []).append(
                    {"epoch": rec["epoch"],
                     "median_t": round(rec["median_t"], 4),
                     "median_q": round(rec["median_q"], 3)})
            elif "loss" in rec:
                loss_curve.append({"epoch": rec["epoch"],
                                   "loss": round(rec["loss"], 4)})
    # dedupe epochs (resume can re-log a boundary epoch); last record wins
    loss_curve = list({r["epoch"]: r for r in loss_curve}.values())
    eval_curves = {s: list({r["epoch"]: r for r in c}.values())
                   for s, c in eval_curves.items()}
    best = {s: {"median_t": min(r["median_t"] for r in c),
                "median_q": min(r["median_q"] for r in c)}
            for s, c in eval_curves.items()}
    final = {s: c[-1] for s, c in eval_curves.items()}

    npz_files = []
    if eval_dir and osp.isdir(eval_dir):
        for dirpath, _, names in os.walk(eval_dir):
            npz_files += [osp.relpath(osp.join(dirpath, n), eval_dir)
                          for n in names if n.endswith(".npz")]

    doc = {
        "protocol": "full driver: synthetic scenes -> cli/build_graphs.py "
                    "-> cli/train.py (200 epochs, in-loop eval > 100, "
                    "ckpt 149/199) -> cli/test.py -> npz",
        "config": {"model": "R3 (ResNet34, 2048-dim GNN)", "dims": "256x341",
                   "graph": "fc8", "batch_size": 8, "epochs": 200,
                   "lr": 1e-4, "lr_decay_step": 50, "retrieval": "RAND",
                   "data": "data/synthetic_scenes.py (7 scenes)"},
        "reproduce": {
            "prepare": f"python benchmarks/campaign.py prepare --root <R>",
            "train": TRAIN_CMD.format(graphs=graphs, out=out_root),
            "test": TEST_CMD.format(graphs=graphs, out=out_root,
                                    ckpt=osp.join(logdir, "ckpt")),
        },
        "loss_curve": loss_curve,
        "eval_curves": eval_curves,
        "best_medians": best,
        "final_medians": final,
        "npz_exports": sorted(npz_files),
    }
    if wall_s is not None:
        doc["wall_clock_s"] = round(wall_s, 1)
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {out_path}: final medians "
          + ", ".join(f"{s}={v['median_t']:.3f}m/{v['median_q']:.1f}deg"
                      for s, v in sorted(final.items())))


def main(argv=None):
    p = argparse.ArgumentParser("convergence campaign")
    sub = p.add_subparsers(dest="cmd", required=True)
    pp = sub.add_parser("prepare")
    pp.add_argument("--root", required=True)
    pp.add_argument("--frames-per-seq", type=int, default=32)
    pp.add_argument("--train-seqs", type=int, default=2)
    pp.add_argument("--test-seqs", type=int, default=1)
    pp.add_argument("--height", type=int, default=256)
    pp.add_argument("--width", type=int, default=341)
    pp.add_argument("--seq-len", type=int, default=8)
    pr = sub.add_parser("report")
    pr.add_argument("--logdir", required=True,
                    help="<save-dir>/7Scenes/multi/acc_r05")
    pr.add_argument("--out", default=osp.join(_REPO, "ACC_r05.json"))
    pr.add_argument("--graphs", default="<root>/graphs")
    pr.add_argument("--out-root", default="<root>/out")
    pr.add_argument("--eval-dir", default=None,
                    help="save-dir tree holding cli/test.py npz exports")
    pr.add_argument("--wall-s", type=float, default=None)
    args = p.parse_args(argv)
    if args.cmd == "prepare":
        prepare(args.root, args.frames_per_seq, args.train_seqs,
                args.test_seqs, args.height, args.width, args.seq_len)
    else:
        report(args.logdir, args.out, args.graphs, args.out_root,
               eval_dir=args.eval_dir, wall_s=args.wall_s)


if __name__ == "__main__":
    main()
