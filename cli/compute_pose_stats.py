#!/usr/bin/env python
"""Compute Cambridge multi-scene translation statistics.

Equivalent of the stats-generation block in the reference
(datasets/cambridge_landmark.py:196-230: concatenate the training poses of
the four stats scenes, save mean/std of the translations).  The published
constants are bundled at relpose_gnn_tpu/data/stats/Cambridge/; use this to
regenerate them for a custom scene set.
"""

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("relpose_gnn_tpu compute_pose_stats")
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--scenes", nargs="+",
                   default=["ShopFacade", "StMarysChurch", "KingsCollege",
                            "OldHospital"],
                   help="scenes whose train poses define the stats "
                        "(reference uses these four)")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from relpose_gnn_tpu.data.cambridge import CambridgeLandmark

    poses = []
    for scene in args.scenes:
        ds = CambridgeLandmark(scene, args.data_path, train=True,
                               normalize_translation=False)
        poses.append(ds.poses)
        print(f"{scene}: {len(ds)} poses")
    cat = np.concatenate(poses)
    mean_t = cat[:, :3].mean(axis=0)
    std_t = cat[:, :3].std(axis=0)
    np.savetxt(args.output, np.vstack([mean_t, std_t]), fmt="%8.7f")
    print(f"saved {args.output}: mean={mean_t}, std={std_t}")


if __name__ == "__main__":
    main()
