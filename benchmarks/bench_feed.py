#!/usr/bin/env python
"""Training-feed microbenchmark: numpy memmap batch gather vs the native
C++ graphio runtime (NativeConcatDataset), at production graph shapes.

Writes two small multi-scene stores, then times shuffled-batch assembly
(the host side of the training feed; device transfer/normalize excluded).
Results are quoted in docs/DESIGN.md.
"""

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from relpose_gnn_tpu.data import native_io
from relpose_gnn_tpu.data.packed import (ConcatPackedDataset,
                                         PackedGraphDataset,
                                         PackedGraphWriter)


def make_store(root, n, nodes=8, h=256, w=341):
    wtr = PackedGraphWriter(root, num_graphs=n, num_nodes=nodes, height=h,
                            width=w, mean=[0.5] * 3, std=[0.25] * 3)
    img = np.zeros((nodes, h, w, 3), np.float32)
    adj = np.ones((nodes, nodes), bool)
    for i in range(n):
        img[:] = (i % 7) / 7.0
        wtr.add(img, np.full((nodes, 6), i, np.float32), adj)
    wtr.finalize()
    return root


def timeit(ds, batch_size, n_batches, seed=0):
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(ds))
    # warm (page cache + any lazy init)
    ds.batch(order[:batch_size])
    t0 = time.perf_counter()
    done = 0
    while done < n_batches:
        for i in range(0, len(ds) - batch_size, batch_size):
            ds.batch(order[i:i + batch_size])
            done += 1
            if done >= n_batches:
                break
        order = rng.permutation(len(ds))
    dt = time.perf_counter() - t0
    return n_batches / dt


def main():
    n_per, batch, n_batches = 48, 8, 40
    with tempfile.TemporaryDirectory() as tmp:
        roots = [make_store(f"{tmp}/s{j}", n_per) for j in range(2)]
        mb = batch * 8 * 256 * 341 * 3 / 1e6

        cat = ConcatPackedDataset([PackedGraphDataset(r) for r in roots])
        numpy_rate = timeit(cat, batch, n_batches)
        print(f"numpy memmap : {numpy_rate:6.1f} batches/s "
              f"({numpy_rate * mb / 1e3:.2f} GB/s)")

        if native_io.available():
            nat = native_io.NativeConcatDataset(roots)
            for threads in (1, 2, 4):
                nat.threads = threads
                rate = timeit(nat, batch, n_batches)
                print(f"native t={threads}  : {rate:6.1f} batches/s "
                      f"({rate * mb / 1e3:.2f} GB/s, "
                      f"{rate / numpy_rate:.2f}x numpy)")
            nat.close()
        else:
            print("native graphio unavailable")


if __name__ == "__main__":
    main()
