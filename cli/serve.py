#!/usr/bin/env python
"""On-device relocalization service CLI.

Builds the device-resident database (NetVLAD descriptors + backbone
embeddings + poses) for one scene's train split, then serves the scene's
query split through the single jitted query path
(evaluation/service.py): retrieval matmul -> strided neighbor subsample ->
cached-embedding graph assembly -> GNN -> absolute pose.

This closes the loop the reference leaves split across an offline
preprocessing pipeline and a separate eval script (SURVEY.md §3.2-3.3) —
there is no reference analog; errors are reported with the standard
per-scene median protocol when ground truth is available.

Passing SEVERAL scenes serves them all through ONE compiled query
executable (evaluation/multiscene.py::MultiSceneService): every scene's
database pads to a shared capacity and its pixel normalization rides as
runtime arrays, so adding scenes never recompiles — the reference's
one-model-all-scenes protocol (training/train.py:87-106,
testing/test.py:350-353) without S compiles of the same program.  The
CLI logs the compile count as proof.

Example:
    python cli/serve.py --dataset 7Scenes --scene chess \
      --data-path /data/7Scenes --weights epoch_199.ckpt \
      --netvlad-checkpoint netvlad_vgg16.tar --batch-size 64
    python cli/serve.py --dataset 7Scenes \
      --scene chess fire heads office pumpkin redkitchen stairs ...
"""

import argparse
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser("relpose_gnn_tpu serve")
    p.add_argument("--dataset", default="7Scenes",
                   choices=("7Scenes", "Cambridge"))
    p.add_argument("--scene", required=True, nargs="+",
                   help="one scene, or several — several scenes share a "
                        "single compiled query program (MultiSceneService)")
    p.add_argument("--data-path", required=True, help="raw dataset root")
    p.add_argument("--weights", default="",
                   help=".pth.tar (converted) or Orbax ckpt dir; empty = "
                        "random init (pipeline smoke only)")
    p.add_argument("--netvlad-checkpoint", default="",
                   help="netvlad_vgg16.tar; empty = random init (retrieval "
                        "quality will be meaningless)")
    p.add_argument("--pose-stat-path", type=str, default="",
                   help="Cambridge translation stats file (required for "
                        "pose-stat-normalized Cambridge checkpoints; "
                        "without it translations stay raw meters)")
    p.add_argument("--stats-path", default=None,
                   help="7-Scenes per-scene stats dir (default: bundled)")
    p.add_argument("--model-name", default="R3")
    p.add_argument("--backbone", default="resnet34")
    p.add_argument("--feat-dim", type=int, default=0)
    p.add_argument("--seq-len", type=int, default=8)
    p.add_argument("--sampling-period", type=int, default=None,
                   help="default: 5 (7-Scenes) / 3 (Cambridge)")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--deterministic", action="store_true",
                   help="plain strided top-k (no stochastic drop/offset)")
    p.add_argument("--no-fold-bn", action="store_true")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--out", default=None, help="npz output for poses")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--retrieval-hw", type=int, nargs=2, default=(192, 256),
                   metavar=("H", "W"),
                   help="NetVLAD input size (smoke tests use smaller)")
    p.add_argument("--retrieval-mode", default="netvlad",
                   choices=("netvlad", "shared-trunk"),
                   help="'netvlad': reference protocol (separate "
                        "VGG16+NetVLAD descriptor pass, 62%% of the query "
                        "step at B=512); 'shared-trunk': rank neighbors by "
                        "cosine over the backbone embeddings the GNN "
                        "already computes — deletes the retrieval trunk. "
                        "SEMANTIC knob: neighbor sets change; validate "
                        "ranking quality per scene (tests/test_service.py "
                        "measures synthetic-scene overlap)")
    p.add_argument("--rank-dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="descriptor-TABLE dtype for similarity ranking: "
                        "bfloat16 halves the bandwidth-bound rank "
                        "matmul's table reads AND the table's HBM "
                        "footprint; similarities still accumulate in "
                        "f32.  SEMANTIC knob — exact iff the database's "
                        "top-k cosine gaps exceed ~1e-4 (see "
                        "ServiceConfig.rank_dtype)")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="query batches kept in flight (query_stream); "
                        "host decode + upload overlap device compute")
    p.add_argument("--netvlad-clusters", type=int, default=64,
                   help="NetVLAD clusters (reference: 64)")
    p.add_argument("--trace-dir", default=None,
                   help="capture a jax.profiler trace of the serving loop "
                        "(XLA timeline, viewable in TensorBoard/Perfetto; "
                        "utils/profiling.py)")
    p.add_argument("--capacity", type=int, default=None,
                   help="pre-allocate the device database to this many "
                        "frames so RelocalizationService.add_frames can "
                        "grow it online without recompiling the query "
                        "program (padded slots are masked from retrieval)")
    p.add_argument("--save-db", default=None, metavar="NPZ",
                   help="persist the built database (descriptors + "
                        "embeddings + poses) after building")
    p.add_argument("--load-db", default=None, metavar="NPZ",
                   help="restore a --save-db snapshot instead of "
                        "embedding the training split (config must match)")
    # multi-process serving (one process per host, parallel/multihost.py):
    # weights + database replicate onto the GLOBAL mesh; each query batch
    # shards over `data` via put_like (every process uploads only its
    # rows) and results gather back with host_read.  Same flag contract
    # as cli/train.py.
    p.add_argument("--coordinator", type=str, default="",
                   help="host:port of process 0 (enables multi-process)")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--local-device-count", type=int, default=0,
                   help="virtual devices per process (CPU test rigs only)")
    p.add_argument("--mesh-data", type=int, default=0,
                   help=">0: shard query batches over a data-axis mesh of "
                        "this many GLOBAL devices (single- or multi-"
                        "process); --batch-size must divide it")
    return p.parse_args(argv)


def _load_split(args, scene: str, train: bool):
    if args.dataset == "7Scenes":
        from relpose_gnn_tpu.data.seven_scenes import SevenScenes
        return SevenScenes(scene, args.data_path, train=train,
                           image_size=args.image_size)
    from relpose_gnn_tpu.data.cambridge import CambridgeLandmark
    if not args.pose_stat_path:
        print("WARNING: Cambridge without --pose-stat-path: translations "
              "stay raw meters (checkpoints trained on normalized "
              "translations will NOT relocalize correctly)")
    return CambridgeLandmark(scene, args.data_path, train=train,
                             image_size=args.image_size,
                             pose_stats_file=args.pose_stat_path or None,
                             normalize_translation=bool(args.pose_stat_path),
                             normalize_images=False)


def _scene_stats(args, scene: str):
    """Per-scene pixel normalization stats (7-Scenes stats.txt values;
    Cambridge's fixed Normalize(0.5/0.25))."""
    import numpy as np
    if args.dataset == "7Scenes":
        from relpose_gnn_tpu.data.seven_scenes import load_scene_stats
        return load_scene_stats(args.stats_path, scene)
    return np.full(3, 0.5, np.float32), np.full(3, 0.25, np.float32)


def _make_query_batches(q, args, h: int, w: int):
    """uint8 query batch generator over a query split + the list that
    records which frame index each served row came from (corrupt frames
    are substituted skip-forward, the reference contract
    seven_scenes.py:131-144 — not served as all-black garbage).

    Every yielded batch has the FULL --batch-size rows: a ragged tail is
    padded by repeating its last frame, so the whole run (and, for
    several scenes, the whole deployment) hits ONE compiled query
    program instead of one per distinct tail shape.  Padded rows are not
    recorded in `src_indices`; callers trim outputs to its length."""
    import numpy as np
    from relpose_gnn_tpu.data.graph_builder import _fit

    src_indices: list[int] = []

    def _load_skip_forward(idx):
        j = idx
        while j < len(q):
            img = q.load_image(j)
            if img is not None:
                return j, img
            j += 1
        j = idx - 1  # tail corruption: scan backward
        while j >= 0:
            img = q.load_image(j)
            if img is not None:
                return j, img
            j -= 1
        raise ValueError("query split has no readable frames")

    def gen():
        for i in range(0, len(q), args.batch_size):
            n = min(args.batch_size, len(q) - i)
            # uint8 on the wire: 4x less host->device traffic; the
            # service converts + normalizes on device (matches the packed
            # stores' uint8 quantization: serving == training data parity)
            batch = np.zeros((args.batch_size, h, w, 3), np.uint8)
            for j in range(n):
                src, img = _load_skip_forward(i + j)
                src_indices.append(src)
                # same quantization rule as the packed stores and the
                # database loader (floor(x*255 + 0.5): data/packed.py,
                # training/experiment.py::load_database_images) —
                # np.round's half-to-even would differ by 1 LSB at
                # exact halves
                batch[j] = np.clip(_fit(img, h, w) * 255.0 + 0.5,
                                   0, 255).astype(np.uint8)
            batch[n:] = batch[n - 1]  # static-shape tail padding
            yield batch

    return gen, src_indices


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.coordinator or args.local_device_count:
        from relpose_gnn_tpu.parallel.multihost import initialize
        initialize(args.coordinator, args.num_processes, args.process_id,
                   local_device_count=args.local_device_count or None)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                    ServiceConfig)
    from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
    from relpose_gnn_tpu.training.experiment import (ExperimentConfig,
                                                     _enable_compile_cache,
                                                     build_model)
    _enable_compile_cache()
    from relpose_gnn_tpu.training import checkpoints as ckpt
    from relpose_gnn_tpu.training.trainer import (TrainerConfig,
                                                  create_train_state)

    # --- model + weights ---------------------------------------------------
    ecfg = ExperimentConfig(dataset=args.dataset, model_name=args.model_name,
                            backbone=args.backbone, feat_dim=args.feat_dim,
                            seq_len=args.seq_len, knn=args.seq_len // 2,
                            droprate=0.0, dtype=args.dtype)
    model = build_model(ecfg)
    h = args.image_size
    # serve at the same aspect the graph builder stores: 7-Scenes 640x480
    # (4:3 -> 256x341), Cambridge 1920x1080 (16:9 -> 256x455) — a model
    # trained on 455-wide Cambridge stores must NOT be served 341-wide
    # center crops (cli/build_graphs.py widths)
    aspect = 4 / 3 if args.dataset == "7Scenes" else 16 / 9
    w = int(round(h * aspect))
    state = create_train_state(
        jax.random.PRNGKey(args.seed), model, TrainerConfig(),
        jnp.ones((1, args.seq_len, h, w, 3)),
        jnp.ones((1, args.seq_len, args.seq_len), bool))
    if args.weights:
        if args.weights.endswith((".pth", ".pth.tar", ".tar")):
            state = ckpt.load_torch_weights(state, args.weights)
        else:
            state = ckpt.restore_checkpoint(args.weights, state)
        print(f"loaded model weights: {args.weights}")
    else:
        print("WARNING: random model weights (smoke mode)")
    model_vars = {"params": state.params["model"],
                  "batch_stats": state.batch_stats}

    # --- NetVLAD -----------------------------------------------------------
    # the retrieval trunk follows --dtype like the pose model: it is ~60%
    # of the query step (benchmarks/bench_service_bisect.py), and an f32
    # VGG16 would halve the stage's MXU rate while the benches measure
    # bf16 (params stay f32 either way; dtype is the compute dtype)
    rhw = tuple(args.retrieval_hw)
    if args.retrieval_mode == "shared-trunk":
        # neighbors rank by cosine over the backbone embeddings — no
        # NetVLAD encoder exists in this deployment at all
        netvlad, nv_vars = None, None
        if args.netvlad_checkpoint:
            print("NOTE: --netvlad-checkpoint is unused with "
                  "--retrieval-mode shared-trunk")
    else:
        netvlad = NetVLADEncoder(
            num_clusters=args.netvlad_clusters,
            dtype=jnp.bfloat16 if args.dtype == "bfloat16" else None)
        if args.netvlad_checkpoint:
            from relpose_gnn_tpu.models.convert import (convert_netvlad,
                                                        load_torch_state_dict)
            nv_params = convert_netvlad(
                load_torch_state_dict(args.netvlad_checkpoint))
            nv_vars = {"params": nv_params}
            print(f"loaded NetVLAD: {args.netvlad_checkpoint}")
        else:
            nv_vars = netvlad.init(jax.random.PRNGKey(1),
                                   jnp.ones((1,) + rhw + (3,)))
            print("WARNING: random NetVLAD weights (smoke mode)")

    # --- several scenes: one shared executable (MultiSceneService) ---------
    sp = args.sampling_period or (3 if args.dataset == "Cambridge" else 5)
    if len(args.scene) > 1:
        if args.mesh_data > 0:
            raise SystemExit("--mesh-data currently serves ONE scene "
                             "(MultiSceneService mesh serving is a "
                             "follow-up); pass a single --scene")
        return _serve_multiscene(args, model, model_vars, netvlad, nv_vars,
                                 h, w, rhw, sp)

    # --- scene normalization ----------------------------------------------
    scene = args.scene[0]
    mean, std = _scene_stats(args, scene)
    mean_j, std_j = jnp.asarray(mean), jnp.asarray(std)

    def model_norm(x01):
        return (x01 - mean_j) / std_j

    # --- database ----------------------------------------------------------
    svc = RelocalizationService(
        model, model_vars, netvlad, nv_vars,
        ServiceConfig(seq_len=args.seq_len, sampling_period=sp,
                      retrieval_hw=rhw,
                      deterministic=args.deterministic,
                      capacity=args.capacity,
                      retrieval=args.retrieval_mode,
                      rank_dtype=args.rank_dtype),
        fold_bn=not args.no_fold_bn)

    if args.load_db:
        t0 = time.perf_counter()
        svc.load_database(args.load_db)
        jax.block_until_ready(svc.db_desc)
        print(f"database restored from {args.load_db} "
              f"({svc.db_count} frames, {time.perf_counter() - t0:.1f}s; "
              "no re-embedding)")
    else:
        db = _load_split(args, scene, train=True)
        print(f"building database: {len(db)} frames ...")
        # uint8 (4x less host RAM than float32 for multi-thousand-frame
        # splits) with the reference's corrupt-frame skip-forward contract
        from relpose_gnn_tpu.training.experiment import load_database_images
        imgs = load_database_images(db, h, w)
        t0 = time.perf_counter()
        svc.build(imgs, db.poses, model_norm, batch=args.batch_size)
        jax.block_until_ready(svc.db_desc)
        print(f"database built in {time.perf_counter() - t0:.1f}s")
    if args.save_db:
        svc.save_database(args.save_db)
        print(f"database saved to {args.save_db}")

    # --- serve the query split --------------------------------------------
    q = _load_split(args, scene, train=False)
    print(f"serving {len(q)} queries (batch {args.batch_size}, "
          f"pipeline depth {args.pipeline_depth}) ...")

    query_batches, src_indices = _make_query_batches(q, args, h, w)

    from relpose_gnn_tpu.utils.profiling import trace
    if args.mesh_data > 0:
        poses_out, t_serve = _serve_mesh(args, svc, model_norm,
                                         query_batches)
    else:
        # pipelined: while batch i computes on device, the host decodes
        # and uploads batch i+1..i+depth (service.py::query_stream)
        t0 = time.perf_counter()
        with trace(args.trace_dir):
            poses_out = [out["pose"] for out in svc.query_stream(
                query_batches(), model_norm, depth=args.pipeline_depth,
                rng=jax.random.PRNGKey(args.seed))]
        t_serve = time.perf_counter() - t0
    # trim the static-shape tail padding (see _make_query_batches)
    poses_out = np.concatenate(poses_out)[:len(src_indices)]
    served = len(poses_out)
    print(f"served {served} queries in {t_serve:.2f}s "
          f"({served / max(t_serve, 1e-9):.0f} q/s incl. retrieval AND "
          f"host image decode, pipelined)")

    err = _report_scene(args, q, poses_out, src_indices, args.out)
    return err


def _serve_mesh(args, svc, model_norm, query_batches):
    """Mesh serving loop (--mesh-data): weights + database replicate onto
    the global mesh (multi-process aware), each query batch shards over
    `data`, and every process reads back the full result (host_read =
    process_allgather across hosts).  One batch in flight: host_read is
    the per-batch sync point, which on multi-process rigs also keeps
    collective programs from interleaving (CLAUDE.md XLA:CPU rendezvous
    note); pipelining across hosts is a pod-scale follow-up."""
    import time

    import numpy as np
    import jax

    from relpose_gnn_tpu.parallel.mesh import create_mesh
    from relpose_gnn_tpu.parallel.multihost import host_read, put_like
    from relpose_gnn_tpu.parallel.sharding import batch_sharding

    if args.batch_size % args.mesh_data != 0:
        raise ValueError(f"--batch-size {args.batch_size} must divide "
                         f"--mesh-data {args.mesh_data}")
    mesh = create_mesh(n_data=args.mesh_data, n_model=1)
    svc.replicate_over(mesh)
    shard = batch_sharding(mesh, 4)
    print(f"mesh serving: {dict(zip(mesh.axis_names, mesh.devices.shape))}"
          f" across {jax.process_count()} process(es)")
    rng = jax.random.PRNGKey(args.seed)
    poses_out = []
    t0 = time.perf_counter()
    with jax.set_mesh(mesh):
        for batch in query_batches():
            out = svc.query(put_like(batch, shard), model_norm, rng)
            poses_out.append(host_read(out["pose"]))
    return poses_out, time.perf_counter() - t0


def _report_scene(args, q, poses_out, src_indices, out_path):
    """Per-scene error report + optional npz export (shared by the
    single-scene and multi-scene paths)."""
    import numpy as np

    from relpose_gnn_tpu.evaluation.evaluator import compute_pose_errors

    pose_mean = pose_std = None
    if args.dataset == "Cambridge" and args.pose_stat_path:
        from relpose_gnn_tpu.data.cambridge import load_pose_stats
        pose_mean, pose_std = load_pose_stats(args.pose_stat_path)
    targ = q.poses[np.asarray(src_indices[:len(poses_out)])]
    err = compute_pose_errors(poses_out, targ,
                              pose_mean=pose_mean, pose_std=pose_std)
    print(err)
    if out_path:
        np.savez(out_path, pose6=poses_out,
                 abs_t=err.pred_poses[:, :3], abs_q=err.pred_poses[:, 3:],
                 targ_t=err.targ_poses[:, :3], targ_q=err.targ_poses[:, 3:])
        print(f"wrote {out_path}")
    return err


def _serve_multiscene(args, model, model_vars, netvlad, nv_vars,
                      h, w, rhw, sp):
    """Serve several scenes through ONE compiled query executable
    (evaluation/multiscene.py).  Databases pad to a common capacity and
    each scene's normalization rides as runtime arrays, so the compile
    count printed at the end is 1 no matter how many scenes run."""
    import numpy as np
    import jax

    from relpose_gnn_tpu.evaluation.multiscene import MultiSceneService
    from relpose_gnn_tpu.evaluation.service import ServiceConfig
    from relpose_gnn_tpu.training.experiment import load_database_images

    scenes = args.scene
    databases = {}
    capacity = args.capacity
    if not args.load_db:
        databases = {s: _load_split(args, s, train=True) for s in scenes}
        if capacity is None:
            capacity = max(len(db) for db in databases.values())
    elif capacity is None:
        raise SystemExit("--load-db with several scenes needs --capacity "
                         "(array sizes are baked into the snapshot)")

    ms = MultiSceneService(
        model, model_vars, netvlad, nv_vars,
        ServiceConfig(seq_len=args.seq_len, sampling_period=sp,
                      retrieval_hw=rhw, deterministic=args.deterministic,
                      capacity=capacity, retrieval=args.retrieval_mode,
                      rank_dtype=args.rank_dtype),
        fold_bn=not args.no_fold_bn)

    if args.load_db:
        t0 = time.perf_counter()
        ms.load_database(args.load_db)
        missing = [s for s in scenes if s not in ms.scenes()]
        if missing:
            # fail BEFORE serving: a KeyError mid-run would throw away
            # every earlier scene's served results
            raise SystemExit(
                f"--load-db snapshot {args.load_db} has no database for "
                f"scene(s) {missing}; it holds {ms.scenes()}")
        print(f"databases restored from {args.load_db} "
              f"({', '.join(ms.scenes())}; "
              f"{time.perf_counter() - t0:.1f}s, no re-embedding)")
    else:
        for s in scenes:
            db = databases[s]
            print(f"[{s}] building database: {len(db)} frames "
                  f"(capacity {capacity}) ...")
            imgs = load_database_images(db, h, w)
            mean, std = _scene_stats(args, s)
            t0 = time.perf_counter()
            ms.add_scene(s, imgs, db.poses, mean, std,
                         batch=args.batch_size)
            print(f"[{s}] built in {time.perf_counter() - t0:.1f}s")
    if args.save_db:
        ms.save_database(args.save_db)
        print(f"databases saved to {args.save_db}")

    from relpose_gnn_tpu.utils.profiling import trace
    results = {}
    with trace(args.trace_dir):
        for s in scenes:
            q = _load_split(args, s, train=False)
            print(f"[{s}] serving {len(q)} queries (batch "
                  f"{args.batch_size}) ...")
            query_batches, src_indices = _make_query_batches(q, args, h, w)
            t0 = time.perf_counter()
            poses_out = [out["pose"] for out in ms.query_stream(
                s, query_batches(), depth=args.pipeline_depth,
                rng=jax.random.PRNGKey(args.seed))]
            t_serve = time.perf_counter() - t0
            poses_out = np.concatenate(poses_out)[:len(src_indices)]
            print(f"[{s}] served {len(poses_out)} queries in "
                  f"{t_serve:.2f}s "
                  f"({len(poses_out) / max(t_serve, 1e-9):.0f} q/s)")
            out_path = (f"{args.out.rsplit('.npz', 1)[0]}_{s}.npz"
                        if args.out else None)
            results[s] = _report_scene(args, q, poses_out, src_indices,
                                       out_path)
    # the proof line the single-executable contract is judged by
    print(f"query program compiles: {ms.query_compiles()} "
          f"(one shared executable across {len(scenes)} scenes)")
    return results


if __name__ == "__main__":
    main()
