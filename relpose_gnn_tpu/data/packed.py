"""Packed graph dataset: contiguous memmapped arrays instead of 26k pickles.

The reference materializes one `data_NNNNNN.pt` pickle per query graph
(dataset_7Scenes_multi.py:437-447) and pays a file open + unpickle per item.
Here a scene-split is three memmapped arrays plus a JSON header:

    meta.json     {num_graphs, num_nodes, height, width, dtype, mean, std}
    images.npy    [M, N, H, W, 3]  uint8 (resized, un-normalized) or float16
    poses.npy     [M, N, 6]        float32 pose6 targets (query at node 0)
    adj.npy       [M, N, N]        bool static graph structure

uint8 storage + on-device normalization cuts feed bandwidth 4x vs the
reference's float32 tensors (SURVEY.md §7 input-pipeline note); `mean`/`std`
in the header are the per-scene stats the device pipeline applies.
"""

from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp

import numpy as np


@dataclasses.dataclass
class PackedGraphDataset:
    root: str
    mode: str = "r"

    def __post_init__(self):
        with open(osp.join(self.root, "meta.json")) as f:
            self.meta = json.load(f)
        m = self.meta
        shape_img = (m["num_graphs"], m["num_nodes"], m["height"],
                     m["width"], 3)
        self.images = np.load(osp.join(self.root, "images.npy"),
                              mmap_mode=self.mode)
        self.poses = np.load(osp.join(self.root, "poses.npy"),
                             mmap_mode=self.mode)
        self.adj = np.load(osp.join(self.root, "adj.npy"),
                           mmap_mode=self.mode)
        # optional: database indices of each graph's neighbor nodes
        # (enables the cached-embedding serving path, evaluation/serving.py)
        nbr_path = osp.join(self.root, "nbr_idx.npy")
        self.nbr_idx = (np.load(nbr_path, mmap_mode=self.mode)
                        if osp.isfile(nbr_path) else None)
        assert self.images.shape == shape_img, (self.images.shape, shape_img)
        self.mean = np.asarray(m["mean"], np.float32)
        self.std = np.asarray(m["std"], np.float32)

    def __len__(self) -> int:
        return self.meta["num_graphs"]

    def batch(self, indices: np.ndarray, with_nbr_idx: bool = False) -> dict:
        """Raw (un-normalized) batch; device pipeline normalizes."""
        out = {"images": np.ascontiguousarray(self.images[indices]),
               "poses": np.ascontiguousarray(self.poses[indices]),
               "adj": np.ascontiguousarray(self.adj[indices])}
        if with_nbr_idx and self.nbr_idx is not None:
            out["nbr_idx"] = np.ascontiguousarray(self.nbr_idx[indices])
        return out


class PackedGraphWriter:
    """Streaming writer: preallocates the memmaps, fills record by record."""

    def __init__(self, root: str, num_graphs: int, num_nodes: int,
                 height: int, width: int, mean, std,
                 dtype: str = "uint8"):
        os.makedirs(root, exist_ok=True)
        self.root = root
        self.meta = {"num_graphs": num_graphs, "num_nodes": num_nodes,
                     "height": height, "width": width, "dtype": dtype,
                     "mean": np.asarray(mean, np.float64).tolist(),
                     "std": np.asarray(std, np.float64).tolist()}
        np_dtype = np.uint8 if dtype == "uint8" else np.float16
        self.images = np.lib.format.open_memmap(
            osp.join(root, "images.npy"), mode="w+", dtype=np_dtype,
            shape=(num_graphs, num_nodes, height, width, 3))
        self.poses = np.lib.format.open_memmap(
            osp.join(root, "poses.npy"), mode="w+", dtype=np.float32,
            shape=(num_graphs, num_nodes, 6))
        self.adj = np.lib.format.open_memmap(
            osp.join(root, "adj.npy"), mode="w+", dtype=bool,
            shape=(num_graphs, num_nodes, num_nodes))
        self.nbr_idx = np.lib.format.open_memmap(
            osp.join(root, "nbr_idx.npy"), mode="w+", dtype=np.int32,
            shape=(num_graphs, num_nodes - 1))
        self._count = 0

    def add(self, images_01: np.ndarray, poses: np.ndarray,
            adj: np.ndarray, nbr_idx: np.ndarray | None = None) -> None:
        """images_01: [N, H, W, 3] float RGB in [0,1] (pre-normalization)."""
        i = self._count
        if self.meta["dtype"] == "uint8":
            self.images[i] = np.clip(images_01 * 255.0 + 0.5, 0,
                                     255).astype(np.uint8)
        else:
            self.images[i] = images_01.astype(np.float16)
        self.poses[i] = poses
        self.adj[i] = adj
        if nbr_idx is not None:
            self.nbr_idx[i] = nbr_idx
        else:
            self.nbr_idx[i] = -1
        self._count += 1

    def finalize(self) -> None:
        assert self._count == self.meta["num_graphs"], (
            self._count, self.meta["num_graphs"])
        self.images.flush()
        self.poses.flush()
        self.adj.flush()
        self.nbr_idx.flush()
        with open(osp.join(self.root, "meta.json"), "w") as f:
            json.dump(self.meta, f, indent=1)


class ConcatPackedDataset:
    """ConcatDataset over multiple scene splits (train.py:129)."""

    def __init__(self, datasets: list[PackedGraphDataset]):
        self.datasets = datasets
        self._sizes = np.array([len(d) for d in datasets])
        self._offsets = np.concatenate([[0], np.cumsum(self._sizes)])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def batch(self, indices: np.ndarray) -> dict:
        indices = np.asarray(indices)
        which = np.searchsorted(self._offsets, indices, side="right") - 1
        parts = {"images": [], "poses": [], "adj": []}
        for ds_idx, local, orig_pos in sorted(
                zip(which, indices - self._offsets[which],
                    range(len(indices)))):
            rec = self.datasets[ds_idx].batch(np.asarray([local]))
            for k in parts:
                parts[k].append((orig_pos, rec[k][0]))
        out = {}
        for k, lst in parts.items():
            lst.sort(key=lambda t: t[0])
            out[k] = np.stack([a for _, a in lst])
        return out

    @property
    def mean(self):
        return self.datasets[0].mean

    @property
    def std(self):
        return self.datasets[0].std
