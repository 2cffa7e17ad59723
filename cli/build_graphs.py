#!/usr/bin/env python
"""Graph-construction CLI — the packed-array equivalent of
`dataset_7Scenes_multi.py --scene ... --mode ...` (its main at :458-523) and
`dataset_Cambridge_multi.py` (:309-343).

For 7-Scenes, neighbors come from NetVLAD descriptor similarity (weights via
--netvlad-checkpoint, converted from the released netvlad_vgg16.tar) or RAND
mode.  For Cambridge, from classical ORB-VLAD (--vlad-index pickle built by
cli/build_vlad_index.py) or RAND mode.
"""

import argparse
import os.path as osp
import sys

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser("relpose_gnn_tpu build_graphs")
    p.add_argument("scene_name", type=str)
    p.add_argument("mode", type=str, choices=("train", "test"))
    p.add_argument("--dataset", type=str, default="7Scenes",
                   choices=("7Scenes", "Cambridge"))
    p.add_argument("--data-path", type=str, required=True,
                   help="raw dataset root")
    p.add_argument("--graph-data-path", type=str, required=True,
                   help="output root for packed graph stores")
    p.add_argument("--stats-path", type=str, default="",
                   help="7-Scenes per-scene stats dir (data/7scenes)")
    p.add_argument("--pose-stat-path", type=str, default="",
                   help="Cambridge translation stats file")
    p.add_argument("--seq-len", type=int, default=8)
    p.add_argument("--sampling-period", "--sp", dest="sampling_period",
                   type=int, default=None)
    p.add_argument("--sampling-method", type=str, default="IR",
                   choices=("IR", "RAND"))
    p.add_argument("--cross-connect", action="store_true")
    p.add_argument("--netvlad-checkpoint", type=str, default="")
    p.add_argument("--retrieval", type=str, default="auto",
                   choices=("auto", "netvlad", "vlad"),
                   help="descriptor engine: auto = NetVLAD for 7-Scenes, "
                        "classical ORB-VLAD for Cambridge (reference "
                        "behavior); 'netvlad' unifies both datasets on the "
                        "NetVLAD path (SURVEY.md §7 parity knob)")
    p.add_argument("--vlad-index", type=str, default="")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.sampling_period is None:
        args.sampling_period = 3 if args.dataset == "Cambridge" else 5

    from relpose_gnn_tpu.data.graph_builder import (GraphBuilderConfig,
                                                    build_graphs,
                                                    self_exclusion_mask)
    from relpose_gnn_tpu.data.seven_scenes import (SEVEN_SCENES, SevenScenes,
                                                   load_scene_stats)
    from relpose_gnn_tpu.data.cambridge import (CAMBRIDGE_SCENES,
                                                CambridgeLandmark)

    if args.scene_name == "multi":
        scenes = (SEVEN_SCENES if args.dataset == "7Scenes"
                  else CAMBRIDGE_SCENES)
    else:
        scenes = (args.scene_name,)

    train = args.mode == "train"
    total = 0
    for scene in scenes:
        # datasets for the builder load RAW [0,1] pixels; the per-scene
        # normalization stats go into the packed header and are applied on
        # device by the pipeline (data/packed.py design)
        if args.dataset == "7Scenes":
            # bundled published per-scene stats by default
            mean, std = load_scene_stats(args.stats_path or None, scene)
            query = SevenScenes(scene, args.data_path, train=train)
            database = (query if train else
                        SevenScenes(scene, args.data_path, train=True))
            width = 341  # 640x480 -> Resize(256)
        else:
            query = CambridgeLandmark(
                scene, args.data_path, train=train,
                pose_stats_file=args.pose_stat_path, color_jitter=train,
                normalize_images=False)
            database = (query if train else CambridgeLandmark(
                scene, args.data_path, train=True,
                pose_stats_file=args.pose_stat_path, color_jitter=train,
                normalize_images=False))
            mean, std = query.mean, query.std  # Normalize(0.5, 0.25)
            width = 455  # 1920x1080 -> Resize(256)

        sim_fn = invalid_fn = None
        if args.sampling_method == "IR":
            sim_fn, invalid_fn = _retrieval_fns(args, scene, query, database)

        out = osp.join(
            args.graph_data_path,
            f"{scene}_fc{args.seq_len}_sp{args.sampling_period}_"
            f"{args.mode}")
        cfg = GraphBuilderConfig(
            seq_len=args.seq_len, sampling_period=args.sampling_period,
            retrieval_mode=args.sampling_method,
            cross_connect=args.cross_connect,
            database_is_query_set=train, seed=args.seed)
        n = build_graphs(query, database, out, cfg, similarity_fn=sim_fn,
                         invalid_fn=invalid_fn, mean=mean, std=std,
                         width=width)
        print(f"{scene}: wrote {n} graphs -> {out}")
        total += n
    print(f"total graphs: {total}")


def use_netvlad_for(retrieval: str, dataset: str) -> bool:
    """Descriptor-engine selection: reference behavior is NetVLAD for
    7-Scenes and classical ORB-VLAD for Cambridge; 'netvlad' overrides."""
    return retrieval == "netvlad" or (retrieval == "auto"
                                      and dataset == "7Scenes")


def _align_vlad_index(index, index_path: str, database_ds):
    """Re-order VLAD index rows to database_ds frame order by joining on
    '<seqdir>/<filename>' path suffixes (build_vlad_index.py writes the
    per-row path list).  Returns (descriptors [n_db, D], missing [n_db]
    bool — frames with no index row, to be masked invalid)."""
    import os.path as osp

    n_db = len(database_ds)
    desc = index.descriptors
    missing = np.zeros(n_db, bool)
    paths_file = index_path + ".paths.txt"

    def key(p):
        parts = p.replace("\\", "/").rstrip("/").split("/")
        return "/".join(parts[-2:])

    if osp.isfile(paths_file):
        with open(paths_file) as f:
            idx_paths = [ln.strip() for ln in f if ln.strip()]
        if len(idx_paths) != len(desc):
            raise ValueError(
                f"{paths_file}: {len(idx_paths)} paths vs "
                f"{len(desc)} index rows — stale index?")
        row_by_key = {key(p): r for r, p in enumerate(idx_paths)}
        aligned = np.zeros((n_db, desc.shape[1]), desc.dtype)
        for i in range(n_db):
            r = row_by_key.get(key(database_ds.c_imgs[i]))
            if r is None:
                missing[i] = True
            else:
                aligned[i] = desc[r]
        if missing.any():
            print(f"WARNING: {int(missing.sum())}/{n_db} database frames "
                  f"have no VLAD index row (no ORB features at build "
                  f"time?); they will never be retrieved")
        return aligned, missing
    # legacy index without a paths file: row order must already equal
    # dataset order — at least enforce the length
    if len(desc) != n_db:
        raise ValueError(
            f"VLAD index has {len(desc)} rows but the database split has "
            f"{n_db} frames and {paths_file} is missing — rebuild the "
            f"index with cli/build_vlad_index.py (writes the path list "
            f"used to align the two orders)")
    print(f"WARNING: {paths_file} missing; assuming index row order == "
          f"dataset_train.txt order")
    return desc, missing


def _retrieval_fns(args, scene, query_ds, database_ds):
    """Build similarity/invalid callbacks for IR mode."""
    n_db = len(database_ds)
    db_is_q = args.mode == "train"
    extra_invalid = None  # e.g. frames absent from the VLAD index

    if use_netvlad_for(args.retrieval, args.dataset):
        from PIL import Image

        from relpose_gnn_tpu.retrieval.netvlad_index import (
            NetVLADIndex, netvlad_preprocess_7scenes)
        variables = None
        if args.netvlad_checkpoint:
            from relpose_gnn_tpu.models import convert
            sd = convert.load_torch_state_dict(args.netvlad_checkpoint)
            variables = {"params": convert.convert_netvlad(sd)}
        index = NetVLADIndex(variables=variables)

        def embed_all(ds):
            # reference geometry: raw 640x480 frame -> depth-intrinsics
            # crop -> 192x256 (seven_scene_manual_dataset.py:34-61)
            imgs = []
            for i in range(len(ds)):
                raw = Image.open(ds.c_imgs[i]).convert("RGB")
                x = np.asarray(raw, np.float32) / 255.0
                imgs.append(netvlad_preprocess_7scenes(x))
            return index.embed(np.stack(imgs))

        db_desc = embed_all(database_ds)
        q_desc = db_desc if db_is_q else embed_all(query_ds)

        def sim_fn(qi):
            return db_desc @ q_desc[qi]
    else:
        import os.path as osp

        from relpose_gnn_tpu.retrieval.vlad import (VLADIndex,
                                                    orb_descriptors)
        index = VLADIndex.load(args.vlad_index)
        # Align index rows to database_ds order BY PATH: the index is
        # built from sorted(glob) minus ORB-failure skips, the dataset
        # from dataset_train.txt order minus outlier-pose skips — the two
        # orders are NOT the same on real data, and treating index rows
        # as dataset indices would silently attach wrong images/poses to
        # every graph.  build_vlad_index.py writes <index>.paths.txt for
        # exactly this join; rows with no match (or dataset frames absent
        # from the index) are masked invalid, never retrieved.
        db_desc_vlad, vlad_missing = _align_vlad_index(
            index, args.vlad_index, database_ds)
        if vlad_missing.any():
            extra_invalid = vlad_missing

        def sim_fn(qi):
            from PIL import Image
            img = np.asarray(Image.open(query_ds.c_imgs[qi]).convert("RGB"))
            desc = orb_descriptors(img)
            if desc is None:
                return np.zeros(n_db)
            q = index.describe(np.asarray(desc, np.float32))
            return db_desc_vlad @ q

    # cross-connect: exclude the query's whole source sequence via the
    # datasets' per-frame seq_id; the reference skips the exclusion for
    # 'heads' (single training sequence — excluding it would leave no
    # candidates, dataset_7Scenes_multi.py:247)
    cross = (args.cross_connect and db_is_q and scene != "heads"
             and hasattr(database_ds, "seq_id")
             and hasattr(query_ds, "seq_id"))

    def invalid_fn(qi):
        mask = self_exclusion_mask(
            n_db, qi, db_is_q, cross_connect=cross,
            seq_ids=database_ds.seq_id if cross else None,
            query_seq=int(query_ds.seq_id[qi]) if cross else None)
        if extra_invalid is not None:
            mask |= extra_invalid
        return mask

    return sim_fn, invalid_fn



if __name__ == "__main__":
    main()
