#!/usr/bin/env python
"""VLAD index analysis/export CLI.

One command covering the reference's three standalone descriptor-analysis
scripts (external/VLAD/, SURVEY.md §2.2 E8):

  * ``--format distances`` — pairwise Euclidean distance matrix of all
    database descriptors, written as a comma-delimited text file
    (pairwiseDistace.py:43-49).  Computed on device as one
    ||a||²+||b||²-2ab matmul (precision=HIGHEST) instead of sklearn's
    host loop.
  * ``--format csv`` — one ``imageID,f0,f1,...`` row per descriptor
    (VLADtoCSV.py:35-40).
  * ``--format prj`` — the DY/.prj layout: header lines ``DY``, count,
    dim, ``0;1;...;d`` then ``name.txt;f0;...;fd;0.0`` rows, with
    optional min-max feature scaling to [0,1] (VLADtoPRJ.py:44-67).

(The fourth script, vladDescriptorsPerPDF.py, aggregates over PDF page
renders — document-retrieval leftovers with no role in the
relocalization pipeline; not ported.)

Input is a cli/build_vlad_index.py index pickle; image IDs come from its
sidecar ``<index>.paths.txt`` (falling back to row numbers).
"""

import argparse
import os.path as osp
import sys

import numpy as np


def pairwise_euclidean(V: np.ndarray) -> np.ndarray:
    """All-pairs Euclidean distances [M, M] in one device op."""
    import jax
    import jax.numpy as jnp

    v = jnp.asarray(V, jnp.float32)
    sq = jnp.sum(v * v, axis=1)
    # HIGHEST: the f32 fast-path's ~1e-3 relative error is visible in
    # near-duplicate rows of a distance matrix (CLAUDE.md numerics note)
    g = jnp.matmul(v, v.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * g, 0.0)
    return np.asarray(jnp.sqrt(d2))


def main(argv=None):
    p = argparse.ArgumentParser("relpose_gnn_tpu vlad_export")
    p.add_argument("--index", type=str, required=True,
                   help="index pickle from cli/build_vlad_index.py")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--format", type=str, required=True,
                   choices=("distances", "csv", "prj"))
    p.add_argument("--scale", action="store_true",
                   help="prj only: min-max scale features to [0,1] "
                        "(VLADtoPRJ.py:44-47)")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from relpose_gnn_tpu.retrieval.vlad import VLADIndex

    index = VLADIndex.load(args.index)
    assert index.descriptors is not None, "index has no descriptors"
    V = np.asarray(index.descriptors, np.float64)
    m, d = V.shape
    paths_file = args.index + ".paths.txt"
    if osp.exists(paths_file):
        with open(paths_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        assert len(ids) == m, (len(ids), m)
    else:
        ids = [str(i) for i in range(m)]

    if args.format == "distances":
        # reference writes `output + ".txt"` (pairwiseDistace.py:46-49)
        out = args.output if args.output.endswith(".txt") \
            else args.output + ".txt"
        np.savetxt(out, pairwise_euclidean(V), delimiter=",")
    elif args.format == "csv":
        out = args.output
        with open(out, "w") as f:
            for i in range(m):
                f.write("%s,%s\n" % (ids[i],
                                     ",".join(str(x) for x in V[i])))
    else:  # prj
        out = args.output
        if args.scale:
            lo, hi = V.min(axis=0), V.max(axis=0)
            V = (V - lo) / np.where(hi > lo, hi - lo, 1.0)
        with open(out, "w") as f:
            f.write("DY\n%d\n%d\n" % (m, d))
            f.write(";".join(str(i) for i in range(d + 1)) + "\n")
            for i in range(m):
                f.write("%s;%s;0.0\n" % (
                    str(ids[i]) + ".txt",
                    ";".join(str(x) for x in V[i])))
    print(f"wrote {args.format} export: {out} ({m} x {d})")


if __name__ == "__main__":
    main()
