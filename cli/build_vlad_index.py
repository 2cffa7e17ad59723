#!/usr/bin/env python
"""Classical VLAD offline pipeline CLI (Cambridge retrieval).

Collapses the reference's four-script chain — describe.py,
visualDictionary.py, vladDescriptors.py, indexBallTree.py
(external/VLAD/, SURVEY.md §2.2 E8) — into one command: extract ORB
descriptors for every database image, fit the KMeans visual dictionary,
aggregate per-image VLAD vectors, and save the dense index that
cli/build_graphs.py queries with an on-device top-k.
"""

import argparse
import glob
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("relpose_gnn_tpu build_vlad_index")
    p.add_argument("--image-glob", type=str, required=True,
                   help="e.g. '/data/Cambridge/ShopFacade/seq*/*.png'")
    p.add_argument("--output", type=str, required=True,
                   help="output index pickle path")
    p.add_argument("--clusters", type=int, default=16,
                   help="visual dictionary size (reference default: 16)")
    p.add_argument("--orb-features", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from PIL import Image

    from relpose_gnn_tpu.retrieval.vlad import (VLADIndex,
                                                fit_visual_dictionary,
                                                orb_descriptors)

    paths = sorted(glob.glob(args.image_glob))
    assert paths, f"no images match {args.image_glob}"
    per_image = []
    kept_paths = []
    for path in paths:
        img = np.asarray(Image.open(path).convert("RGB"))
        desc = orb_descriptors(img, args.orb_features)
        if desc is None or len(desc) == 0:
            print(f"no ORB features: {path} (skipped)")
            continue
        per_image.append(np.asarray(desc, np.float32))
        kept_paths.append(path)

    all_desc = np.concatenate(per_image)
    print(f"{len(kept_paths)} images, {len(all_desc)} descriptors; "
          f"fitting {args.clusters}-word dictionary...")
    centers = fit_visual_dictionary(all_desc, args.clusters, args.seed)
    index = VLADIndex(centers=centers)
    index.build(per_image)
    index.save(args.output)
    with open(args.output + ".paths.txt", "w") as f:
        f.write("\n".join(kept_paths))
    print(f"index saved: {args.output} ({len(kept_paths)} entries)")


if __name__ == "__main__":
    main()
