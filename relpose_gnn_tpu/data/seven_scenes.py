"""7-Scenes dataset parser.

Re-implementation of `SevenScenes` (datasets/seven_scenes.py:17-174):
  * splits from `TrainSplit.txt` / `TestSplit.txt` ("sequenceN" lines,
    comments skipped);
  * per-frame 4x4 pose files `frame-%06d.pose.txt` (first 12 values of the
    flattened matrix);
  * tolerates both flat `seq-NN/` layouts and the `rgb/ depth/ poses/`
    sub-layout (:61-73);
  * poses converted to pose6 `[t, logq]` via `process_poses`;
  * corrupt images: `load_image` -> None with skip-forward handled by the
    caller/pipeline (the reference loops forward inside __getitem__,
    :126-144);
  * `real=True` SLAM/VO mode: per-sequence `<vo_lib>_poses/seq-NN.txt`
    pose tables + `<vo_lib>_vo_stats.pkl` Sim(3) alignment, with `gt_idx`
    mapping served frames back to ground-truth rows (:79-101).

Scene constants mirror train.py:88 / dataset_7Scenes_multi.py:80-110.
"""

from __future__ import annotations

import dataclasses
import os
import os.path as osp
from pathlib import Path

import numpy as np

from relpose_gnn_tpu.data import transforms as T
from relpose_gnn_tpu.ops.pose import process_poses

SEVEN_SCENES = ("heads", "chess", "redkitchen", "pumpkin", "office", "fire",
                "stairs")

# leave-one-out file-index ranges of the prebuilt multi-scene graph store
# (dataset_7Scenes_multi.py:80-110)
SCENE_FILE_INDEX_RANGES = {
    "heads": (-1, 1000),
    "chess": (999, 5000),
    "redkitchen": (4999, 12000),
    "pumpkin": (11999, 16000),
    "office": (15999, 22000),
    "fire": (21999, 24000),
    "stairs": (23999, 26000),
}


@dataclasses.dataclass
class SevenScenes:
    """Lazy image/pose dataset for one scene."""

    scene: str
    data_path: str
    train: bool
    image_size: int = 256
    mean: np.ndarray | None = None  # per-scene stats normalization
    std: np.ndarray | None = None
    mode: int = 0  # 0: RGB, 1: depth, 2: (RGB, depth) — seven_scenes.py:29
    real: bool = False  # True: SLAM/VO poses + per-seq alignment stats
    #                     (seven_scenes.py:79-99); feeds the MapNet/PGO
    #                     experiment family
    vo_lib: str = "orbslam"  # '<vo_lib>_poses/seq-NN.txt' + per-seq
    #                          '<vo_lib>_vo_stats.pkl'; 'libviso2' frame
    #                          indices are 1-based (seven_scenes.py:83-85)

    def __post_init__(self):
        base = osp.join(osp.expanduser(str(self.data_path)), self.scene)
        split = "TrainSplit.txt" if self.train else "TestSplit.txt"
        with open(osp.join(base, split)) as f:
            seqs = [int(line.split("sequence")[-1]) for line in f
                    if not line.startswith("#")]

        self.c_imgs: list[str] = []
        self.d_imgs: list[str] = []
        # frame index into the GROUND-TRUTH pose stream for each served
        # frame: with real=False it is arange(n); with real=True only
        # frames the VO/SLAM system tracked appear, and gt_idx maps each
        # back to its GT row (seven_scenes.py:56,100-101) — the eval
        # protocol uses it to fetch matching GT poses
        self.gt_idx = np.empty((0,), np.int64)
        # per-frame source-sequence number (for the cross-connect
        # same-sequence exclusion, dataset_7Scenes_multi.py:245-252)
        self.seq_id = np.empty((0,), np.int32)
        gt_offset = 0
        pose_blocks: list[np.ndarray] = []
        for seq in seqs:
            seq_dir = osp.join(base, f"seq-{seq:02d}")
            if not osp.isfile(osp.join(seq_dir, "frame-000000.color.png")):
                pose_dir = osp.join(seq_dir, "poses")
                rgb_dir = osp.join(seq_dir, "rgb")
                depth_dir = osp.join(seq_dir, "depth")
            else:
                pose_dir = rgb_dir = depth_dir = seq_dir
            n_frames = len([n for n in os.listdir(pose_dir)
                            if "pose.txt" in n])
            if self.real:
                # VO/SLAM pose table: rows [frame_idx, R|t flattened(12)]
                # (seven_scenes.py:79-86); alignment Sim(3) from the
                # per-sequence vo_stats pickle {'R','t','s'} (:87-92).
                # (The reference reads these via an un-expanduser'd
                # duplicate of base_dir, :44 — not replicated.)
                pss = np.loadtxt(osp.join(base, f"{self.vo_lib}_poses",
                                          f"seq-{seq:02d}.txt"), ndmin=2)
                frame_idx = pss[:, 0].astype(np.int64)
                if self.vo_lib == "libviso2":
                    frame_idx = frame_idx - 1
                raw = pss[:, 1:13]
                import pickle
                with open(osp.join(seq_dir,
                                   f"{self.vo_lib}_vo_stats.pkl"),
                          "rb") as f:
                    vo = pickle.load(f)
                align_R = np.asarray(vo["R"], np.float64)
                align_t = np.asarray(vo["t"], np.float64).reshape(3)
                align_s = float(vo["s"])
            else:
                frame_idx = np.arange(n_frames)
                raw = np.asarray([
                    np.loadtxt(osp.join(
                        pose_dir, f"frame-{i:06d}.pose.txt")).flatten()[:12]
                    for i in frame_idx])
                align_R, align_t, align_s = np.eye(3), np.zeros(3), 1.0
            self.gt_idx = np.hstack([self.gt_idx, gt_offset + frame_idx])
            self.seq_id = np.hstack([
                self.seq_id, np.full(len(frame_idx), seq, np.int32)])
            gt_offset += n_frames
            for i in frame_idx:
                self.c_imgs.append(
                    osp.join(rgb_dir, f"frame-{i:06d}.color.png"))
                self.d_imgs.append(
                    osp.join(depth_dir, f"frame-{i:06d}.depth.png"))
            # per-sequence alignment, no translation normalization
            # (seven_scenes.py:112-124)
            pose_blocks.append(process_poses(
                raw, np.zeros(3), np.ones(3), align_R, align_t, align_s))
        self.poses = np.vstack(pose_blocks).astype(np.float32)

    def __len__(self) -> int:
        return len(self.poses)

    def load_image(self, index: int) -> np.ndarray | None:
        return T.load_and_preprocess(self.c_imgs[index], self.image_size,
                                     self.mean, self.std)

    def rel_path(self, index: int) -> str:
        """Image path relative to the dataset root (the reference embeds
        these in its npz prediction export, testing/test.py:38-42)."""
        return str(Path(self.c_imgs[index]).relative_to(
            osp.expanduser(str(self.data_path))))

    def load_depth(self, index: int) -> np.ndarray | None:
        """Depth frame in metres [H, W] (mm with 65535 = invalid -> 0,
        seven_scene_manual_dataset.py:15-18), resized like the RGB."""
        from PIL import Image
        try:
            img = Image.open(self.d_imgs[index])
        except (IOError, OSError):
            return None
        img = T.resize_short_side(img, self.image_size)
        d = np.asarray(img, np.float32)
        d[np.asarray(img) == 65535] = 0.0
        return d / 1000.0

    def _load_mode(self, index: int):
        if self.mode == 0:
            return self.load_image(index)
        if self.mode == 1:
            return self.load_depth(index)
        if self.mode == 2:
            c, d = self.load_image(index), self.load_depth(index)
            return None if (c is None or d is None) else (c, d)
        raise ValueError(f"bad mode {self.mode}")

    def __getitem__(self, index: int):
        """(image(s), pose6 [6], relative path); skips forward over corrupt
        images like the reference (:131-144)."""
        img = None
        while img is None:
            img = self._load_mode(index)
            pose = self.poses[index]
            path = self.c_imgs[index]
            index += 1
        # same expanduser'd base as rel_path() above (c_imgs are built
        # from the expanded path; a tilde base would raise ValueError)
        rel = str(Path(path).relative_to(
            osp.expanduser(str(self.data_path))))
        return img, pose, rel


def test_split_rgb_paths(data_path: str, scene: str,
                         expected_count: int | None = None) -> list[str]:
    """RGB filenames of a scene's TestSplit sequences, in the reference's
    linear order (testing/test.py:101-121): parse `TestSplit.txt`, then for
    each sequence take `sorted(seq-NN/*.color.*)` with an `rgb/` sub-layout
    fallback.  With `expected_count`, asserts the graph-store/filename
    count invariant the reference enforces (test.py:115-121)."""
    import re

    base = Path(osp.expanduser(str(data_path))) / scene
    filenames: list[str] = []
    with open(base / "TestSplit.txt") as f:
        for line in f:
            hit = re.search(r"[\d]+$", line.strip())
            if hit is None:
                continue
            seq_dir = base / f"seq-{int(hit.group()):02d}"
            rgbs = sorted(seq_dir.glob("*.color.*"))
            if not rgbs:
                rgbs = sorted((seq_dir / "rgb").glob("*.color.*"))
            filenames.extend(str(p) for p in rgbs)
    if expected_count is not None and len(filenames) != expected_count:
        raise IOError(
            f"Not the same number of filenames as test graph files! "
            f"{len(filenames)} filenames != {expected_count} graphs")
    return filenames


def leave_one_out_file_mask(file_indices: np.ndarray,
                            excluded_scenes) -> np.ndarray:
    """Keep-mask over a prebuilt multi-scene graph store's file indices.

    The reference's combined 26k-graph store encodes scenes by file-index
    ranges and drops an excluded scene's files for leave-one-out training
    (dataset_7Scenes_multi.py:80-110, ranges in SCENE_FILE_INDEX_RANGES).
    Returns True for files to KEEP.
    """
    if isinstance(excluded_scenes, str):
        excluded_scenes = (excluded_scenes,)
    idx = np.asarray(file_indices)
    keep = np.ones(len(idx), bool)
    for scene in excluded_scenes or ():
        lo, hi = SCENE_FILE_INDEX_RANGES[scene]
        keep &= ~((idx > lo) & (idx < hi))
    return keep


BUNDLED_STATS_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "stats",
                             "7scenes")
BUNDLED_CAMBRIDGE_POSE_STATS = osp.join(
    osp.dirname(osp.abspath(__file__)), "stats", "Cambridge",
    "Cambridge_pose_stats.txt")


def load_scene_stats(stats_dir: str | None, scene: str
                     ) -> tuple[np.ndarray, np.ndarray]:
    """Per-scene RGB stats file 'stats.txt' (mean row, var row) ->
    (mean, std=sqrt(var)) as used at dataset_7Scenes_multi.py:290-298.

    With stats_dir=None, uses the bundled published statistics (the
    reference ships these constants under data/7scenes/<scene>/stats.txt)."""
    stats_dir = stats_dir or BUNDLED_STATS_DIR
    stats = np.loadtxt(osp.join(stats_dir, scene, "stats.txt"))
    return stats[0].astype(np.float32), np.sqrt(stats[1]).astype(np.float32)
