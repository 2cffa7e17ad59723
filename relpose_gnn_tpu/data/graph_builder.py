"""Offline graph construction: retrieval + subsampling -> packed arrays.

Re-design of the `process()` pipelines in dataset_7Scenes_multi.py:266-447
and dataset_Cambridge_multi.py:138-298:

  for each query frame:
    1. rank database frames by descriptor similarity (NetVLAD for 7-Scenes,
       classical VLAD for Cambridge) — or RAND mode;
    2. subsample neighbors (random 50% drop + random-offset stride + top-K);
    3. assemble the graph: node 0 = query, nodes 1..N-1 = neighbors;
    4. record images (resized, pre-normalization), pose6 targets, and the
       static edge structure.

Output is the packed memmap format (data/packed.py).  Edge targets are NOT
stored: they are recomputed on device from the stored poses as
`y_R[s, t] = y[s] - y[t]` (ops/graph.relative_pose_targets — the training
convention, `compute_RP` at modules/posenet.py:1021-1031).  The reference
materializes per-graph `edge_attr` with the OPPOSITE sign
(y[target]-y[source], dataset_7Scenes_multi.py:424-429), but that tensor is
dead for the production path: training targets come from compute_RP, and
edge_attr is only touched by the no-op edge-dropout quirk (train.py:244-247).
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Callable

import numpy as np

from relpose_gnn_tpu.data.packed import PackedGraphWriter
from relpose_gnn_tpu.ops import graph as graph_ops
from relpose_gnn_tpu.retrieval import subsample


@dataclasses.dataclass
class GraphBuilderConfig:
    seq_len: int = 8
    graph_structure: str = "fc"
    sampling_period: int = 5       # 7-Scenes: 5, Cambridge: 3 (train.py:112)
    retrieval_mode: str = "IR"     # 'IR' | 'RAND'
    cross_connect: bool = False
    database_is_query_set: bool = True
    seed: int = 0


def build_graphs(query_dataset, database_dataset, out_root: str,
                 cfg: GraphBuilderConfig,
                 similarity_fn: Callable[[int], np.ndarray] | None = None,
                 invalid_fn: Callable[[int], np.ndarray] | None = None,
                 mean=None, std=None,
                 height: int = 256, width: int = 341) -> int:
    """Materialize one scene-split of query graphs.

    query_dataset / database_dataset expose `__len__`, `poses` [M, 6] and
    `load_image(i) -> [H, W, 3] float in [0, 1] or None`.
    similarity_fn(query_index) -> [M] similarity over the database; None
    implies RAND mode.  invalid_fn(query_index) -> bool mask of excluded
    database entries (self/same-sequence, dataset_7Scenes_multi.py:245-253).
    Returns the number of graphs written.
    """
    rng = np.random.default_rng(cfg.seed)
    n = cfg.seq_len
    n_query = len(query_dataset)
    mean = np.zeros(3) if mean is None else mean
    std = np.ones(3) if std is None else std

    edge_index = graph_ops.build_edge_index(cfg.graph_structure, n)
    adj = (graph_ops.edge_index_to_adj(edge_index, n)
           if edge_index is not None else np.zeros((n, n), bool))

    writer = PackedGraphWriter(out_root, num_graphs=n_query, num_nodes=n,
                               height=height, width=width, mean=mean,
                               std=std)
    written = 0
    n_db = len(database_dataset)
    for qi in range(n_query):
        if cfg.retrieval_mode == "RAND" or similarity_fn is None:
            nbrs = rng.choice(n_db, size=n - 1,
                              replace=n_db < n - 1)  # tiny-DB fallback
        else:
            sim = similarity_fn(qi)
            invalid = (invalid_fn(qi) if invalid_fn is not None
                       else np.zeros(n_db, bool))
            order = subsample.rank_and_filter_numpy(sim, invalid)
            nbrs = subsample.subsample_ranked_numpy(
                order, n - 1, cfg.sampling_period, rng)
            if len(nbrs) < n - 1:  # degenerate: pad with best-ranked
                pad = [i for i in order if i not in set(nbrs.tolist())]
                nbrs = np.concatenate([nbrs, pad[:n - 1 - len(nbrs)]])
            if len(nbrs) < n - 1:
                # the FILTERED ranking itself has < n-1 entries (tiny DB
                # or heavy exclusion): cycle what we have rather than
                # crash writer.add with a short nbr_idx row.  An EMPTY
                # ranking means every candidate is excluded (order lists
                # all valid frames) — there is no legal neighbor, so skip
                # the query like a corrupt frame instead of silently
                # writing a graph whose neighbors violate the exclusion
                # mask (e.g. the query itself, or same-sequence frames
                # under --cross-connect).
                if not len(nbrs):
                    warnings.warn(
                        f"query {qi}: every database frame is excluded "
                        "by the retrieval mask; skipping this graph")
                    continue
                nbrs = np.resize(nbrs, n - 1)

        images = np.zeros((n, height, width, 3), np.float32)
        poses = np.zeros((n, 6), np.float32)
        img0 = query_dataset.load_image(qi)
        if img0 is None:
            continue
        images[0] = _fit(img0, height, width)
        poses[0] = query_dataset.poses[qi]
        ok = True
        for j, dbi in enumerate(nbrs[:n - 1]):
            img = database_dataset.load_image(int(dbi))
            if img is None:
                ok = False
                break
            images[j + 1] = _fit(img, height, width)
            poses[j + 1] = database_dataset.poses[int(dbi)]
        if not ok:
            continue
        rel_fn = getattr(query_dataset, "rel_path", None)
        writer.add(images, poses, adj,
                   nbr_idx=np.asarray(nbrs[:n - 1], np.int32),
                   rel_path=rel_fn(qi) if rel_fn is not None else None)
        written += 1

    # finalize() shrinks the header to the number actually written (skipped
    # frames, dataset_Cambridge_multi.py:196-199); the loader slices the
    # preallocated memmaps down to that count.
    writer.finalize()
    return written


def _fit(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Center-crop/pad an [H', W', 3] image to exactly [height, width]."""
    h, w = img.shape[:2]
    out = np.zeros((height, width, 3), np.float32)
    ch, cw = min(h, height), min(w, width)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    oy, ox = (height - ch) // 2, (width - cw) // 2
    out[oy:oy + ch, ox:ox + cw] = img[y0:y0 + ch, x0:x0 + cw]
    return out


def self_exclusion_mask(n_db: int, query_index: int,
                        database_is_query_set: bool,
                        cross_connect: bool = False,
                        group_len: int | None = None,
                        seq_ids: np.ndarray | None = None,
                        query_seq: int | None = None) -> np.ndarray:
    """Invalid-candidate mask (dataset_7Scenes_multi.py:245-253): exclude
    the query itself, or — when cross-connecting — its whole source
    sequence, so training graphs connect across sequences only.

    Cross-connect group identity, in preference order:
      * `seq_ids` [n_db] + `query_seq` — the datasets' per-frame source
        sequence (SevenScenes/CambridgeLandmark `.seq_id`), robust to
        skipped frames and ragged sequences;
      * `group_len` — the reference's fixed-block arithmetic
        (`index // scene_seq_len`, dataset_7Scenes_multi.py:249-250),
        only valid when every sequence has exactly group_len frames.

    The reference's 'heads' exception (`if seq != 'heads'`, :247 —
    heads' single training sequence would otherwise exclude everything)
    is the CALLER's to apply, since only it knows the scene name
    (cli/build_graphs.py does)."""
    mask = np.zeros(n_db, bool)
    if not database_is_query_set:
        return mask
    if cross_connect and seq_ids is not None:
        assert query_seq is not None
        mask |= np.asarray(seq_ids) == query_seq
    elif cross_connect and group_len:
        g = query_index // group_len
        mask[g * group_len:(g + 1) * group_len] = True
    if query_index < n_db:
        mask[query_index] = True
    return mask
