#!/usr/bin/env python
"""7-Scenes → sequence-metadata preprocessing CLI.

Reference CLI parity (scenes2seq.py:109-216, the README §II
preprocessing step): for one scene directory, writes per-sequence
`seq.json` / `K.txt` / TUM-format `rgb.txt`+`depth.txt`+
`groundtruth.txt`, then the split-concatenated `train_frames.bin` /
`test_frames.bin` pickles the sequence-preproc dataset (E2,
data/sequences.py::load_frames_bin) consumes.

    python cli/scenes2seq.py /data/7Scenes/chess [--dst-dir out/chess]
"""

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser("relpose_gnn_tpu scenes2seq")
    p.add_argument("seq_dir", help="scene directory (contains seq-NN/, "
                                   "TrainSplit.txt, TestSplit.txt)")
    p.add_argument("--dst-dir", default=None,
                   help="output directory (default: in place)")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from relpose_gnn_tpu.data.sequences import scenes_to_sequences

    out = scenes_to_sequences(args.seq_dir, args.dst_dir)
    for split, path in out.items():
        print(f"{split}: {path}")


if __name__ == "__main__":
    main()
