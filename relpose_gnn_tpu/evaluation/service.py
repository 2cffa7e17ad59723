"""End-to-end on-device relocalization service.

The BASELINE.json north star realized: "NetVLAD retrieval plus strided
neighbor subsampling become an on-device batched descriptor top-k that
assembles fixed-size fully-connected image graphs".  The reference splits
this across an offline CUDA/sklearn preprocessing pipeline and a separate
eval script (SURVEY.md §3.2-3.3); here one jitted program serves a query
batch end to end:

    query image  -> NetVLAD descriptor                (on device)
                 -> cosine similarities vs the DB      (one matmul)
                 -> stochastic strided neighbor subsample
                    (rank -> 50% drop -> strided -> top-K,
                     retrieval/subsample.py, jittable)
                 -> gather cached neighbor node embeddings + poses
                 -> dense edge-GNN relative-pose regression
                 -> absolute pose from the nearest-neighbor anchor

State held on device: retrieval descriptors (NetVLAD [M, 32768], or the
L2-normalized backbone embeddings under ``retrieval='shared-trunk'``),
backbone node embeddings [M, D], pose6 [M, 6] for every database frame
(built once).

Incremental growth (`ServiceConfig.capacity` + `add_frames`): XLA
programs are shape-specialized, so a database that grows row by row
would recompile the query program per size.  Instead the device arrays
are pre-allocated at `capacity` with a validity mask; `add_frames`
embeds new frames into the free slots with donated in-place updates and
flips their mask bits — the query program never recompiles, and padded
slots are excluded from retrieval on both selection branches (masked
-inf in deterministic mode; the invalid mask of
`subsample_neighbors_batch` in stochastic mode).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
from relpose_gnn_tpu.models.posenet import RelPoseGNN
from relpose_gnn_tpu.ops import graph as graph_ops
from relpose_gnn_tpu.retrieval.netvlad_index import (IMAGENET_MEAN,
                                                     IMAGENET_STD)
from relpose_gnn_tpu.retrieval.subsample import subsample_neighbors_batch


def _pipelined_stream(query_fn, batches, depth: int,
                      rng: jax.Array | None):
    """The pipelined-serving schedule shared by
    RelocalizationService.query_stream and MultiSceneService.query_stream:
    keep up to `depth` async-dispatched batches in flight so batch i+1's
    upload/launch overhead overlaps batch i's on-chip compute; yield one
    fetched-to-numpy result dict per input batch, in order (the host read
    is the pipeline's only sync point)."""
    from collections import deque

    assert depth >= 1
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    inflight: deque = deque()

    def fetch(out):
        return {k: np.asarray(v) for k, v in out.items()}

    for i, q in enumerate(batches):
        inflight.append(query_fn(q, jax.random.fold_in(rng, i)))
        if len(inflight) >= depth:
            yield fetch(inflight.popleft())
    while inflight:
        yield fetch(inflight.popleft())


def _grow_rows(desc: jax.Array, emb: jax.Array, embed_chunk, images01,
               batch: int, count: int):
    """Chunked embed + donated in-place row updates into the free
    capacity slots starting at `count` (shared by both services'
    add_frames; a fresh copy of the 32768-wide descriptor table per add
    would double its HBM footprint)."""
    for i in range(0, len(images01), batch):
        chunk = jnp.asarray(images01[i:i + batch])
        if chunk.dtype == jnp.uint8:
            chunk = _to_float01(chunk)
        d, e = embed_chunk(chunk)
        start = jnp.int32(count + i)
        desc = _update_rows(desc, d.astype(desc.dtype), start)
        emb = _update_rows(emb, e.astype(emb.dtype), start)
    return desc, emb


def _pose_rows(poses, n: int, what: str) -> jax.Array:
    """Validate-and-convert a pose batch riding with an n-image batch:
    must be [n, 6] float32.  A silent length mismatch is worse than it
    looks: short poses leave valid-marked slots holding stale/zero poses,
    and LONG poses make the donated `dynamic_update_slice` row write
    CLAMP its start index (XLA semantics) and overwrite earlier live
    rows — both corrupt query results with no error."""
    arr = jnp.asarray(poses, jnp.float32)
    if arr.shape != (n, 6):
        raise ValueError(
            f"{what}: poses shape {tuple(arr.shape)} does not match the "
            f"image batch — expected ({n}, 6)")
    return arr


def _unit_rows(x: jax.Array) -> jax.Array:
    """L2-normalize rows in float32 (shared-trunk retrieval descriptors:
    cosine ranking over backbone embeddings; f32 keeps the ranking key's
    precision independent of the service compute dtype)."""
    x = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, 1e-12)


def _to_float01(q: jax.Array) -> jax.Array:
    """uint8 [B, H, W, 3] -> float01, on device, EAGERLY on purpose: under
    jit XLA rewrites the /255 into a reciprocal multiply (measured: bitwise
    different from the host's true division), which would break the uint8
    == quantized-float bit-identity contract (tested).  Eager ops produce
    the exact host division, and the SAME float query program then runs
    for both input dtypes."""
    return q.astype(jnp.float32) / 255.0


@partial(jax.jit, donate_argnums=(0,))
def _update_rows(buf: jax.Array, rows: jax.Array,
                 start: jax.Array) -> jax.Array:
    """In-place (donated) row-block write at a traced offset — one
    compiled program serves every add_frames position."""
    return jax.lax.dynamic_update_slice(buf, rows, (start, jnp.int32(0)))


@partial(jax.jit, donate_argnums=(0,))
def _update_valid(valid: jax.Array, start: jax.Array,
                  count: jax.Array) -> jax.Array:
    idx = jnp.arange(valid.shape[0])
    return valid | ((idx >= start) & (idx < start + count))


@partial(jax.jit, donate_argnums=(0,))
def _gather_rows(buf: jax.Array, perm: jax.Array) -> jax.Array:
    """Row permutation with the input donated.  XLA cannot alias the
    input and output of a general row gather (rows are read after the
    aliased slot would be overwritten), so compaction still allocates a
    full-size destination transiently; donation frees the OLD table as
    soon as the gather retires rather than at Python GC time.  If the
    transient 2x footprint of the 32768-wide descriptor table ever
    matters, replace with chunked in-place dynamic_update_slice sweeps."""
    return buf[perm]


@jax.jit
def _tree_checksum(tree) -> jax.Array:
    """One device-reduced scalar over a parameter tree: a cheap VALUE
    fingerprint binding a database snapshot to the weights that embedded
    it.  Position-weighted means so swapped/rescaled leaves move it;
    compared with a relative tolerance (reduction order differs across
    backends in the last bits)."""
    s = jnp.zeros((), jnp.float32)
    for i, x in enumerate(jax.tree.leaves(tree)):
        s = s + jnp.float32((i % 13) + 1) * jnp.mean(x.astype(jnp.float32))
    return s


def _model_fingerprint(model_vars) -> tuple[str, float]:
    """(structure md5, value checksum) of a model-variables tree.  The
    structure hash (leaf paths + shapes + dtypes) is exact; the value
    checksum is a single on-device reduction (no D2H of the full tree
    through the tunnel).  Snapshots carry both so a database embedded
    under DIFFERENT weights (or a different model config) fails loudly at
    load instead of silently ranking garbage similarities (ADVICE r4 #1)."""
    import hashlib
    paths = jax.tree_util.tree_flatten_with_path(model_vars)[0]
    desc = ";".join(
        f"{jax.tree_util.keystr(p)}:{tuple(x.shape)}:{x.dtype}"
        for p, x in paths)
    struct = hashlib.md5(desc.encode()).hexdigest()
    return struct, float(_tree_checksum(model_vars))


def _check_fingerprint(z, model_vars, path: str) -> None:
    """Validate a snapshot's model fingerprint against the live weights.
    Pre-round-5 snapshots carry no fingerprint keys — skipped (their
    retrieval/hw guards still apply)."""
    if "model_struct" not in z.files:
        return
    struct, checksum = _model_fingerprint(model_vars)
    if str(z["model_struct"]) != struct:
        raise ValueError(
            f"snapshot {path} was embedded under a model with a DIFFERENT "
            "parameter structure than this service's (wrong backbone / "
            "feat-dim / model config) — its cached embeddings are not "
            "comparable; rebuild the database")
    if not np.isclose(float(z["model_checksum"]), checksum,
                      rtol=1e-3, atol=1e-5):
        raise ValueError(
            f"snapshot {path} was embedded under different model WEIGHTS "
            f"(checksum {float(z['model_checksum']):.6g} vs live "
            f"{checksum:.6g}) — its cached embeddings (and shared-trunk "
            "descriptors) would silently rank garbage; rebuild the "
            "database with the current weights")


def _check_built_hw(built_hw, q_shape, what: str) -> None:
    """Query images must match the resolution the database was embedded
    at: the GNN compares the query's backbone embedding against cached
    database embeddings (and in shared-trunk mode ranks retrieval on
    them), so mixed resolutions silently produce garbage similarities."""
    if built_hw is not None and tuple(q_shape[1:3]) != tuple(built_hw):
        raise ValueError(
            f"{what}: query images are {tuple(q_shape[1:3])} but the "
            f"database was embedded at {tuple(built_hw)} — backbone "
            "embeddings at mixed resolutions are not comparable; rebuild "
            "the database (or resize the queries)")


def _tombstone(valid: jax.Array, count: int, indices) -> jax.Array:
    """Flip validity bits off for `indices` (shared by
    RelocalizationService.invalidate_frames and MultiSceneService)."""
    idx_np = np.asarray(indices, np.int64).reshape(-1)
    # JAX scatter silently DROPS out-of-bounds updates — a stale or
    # typo'd index would be a no-op and the bad frame would keep
    # being served; fail loudly instead
    if idx_np.size and (idx_np.min() < 0 or idx_np.max() >= count):
        raise ValueError(
            f"invalidate_frames indices out of range [0, {count}): "
            f"{idx_np[(idx_np < 0) | (idx_np >= count)][:8]}")
    return valid.at[jnp.asarray(idx_np)].set(False)


def _compact(desc, emb, poses, valid, count):
    """Stable front-compaction of a (desc, emb, poses, valid, count)
    database (shared by RelocalizationService.compact_database and
    MultiSceneService).  Returns the new arrays plus the int64 [M]
    old_to_new slot map (-1 for tombstoned/padded slots)."""
    valid_np = np.asarray(valid)
    m = valid_np.shape[0]
    n_valid = int(valid_np.sum())
    old_to_new = np.cumsum(valid_np, dtype=np.int64) - 1
    old_to_new[~valid_np] = -1
    if n_valid == count and valid_np[:n_valid].all():
        # already compact: no device work
        return desc, emb, poses, valid, count, old_to_new
    # stable: False (~valid=0 for valid rows) sorts first, original
    # order preserved within each class
    perm = jnp.asarray(np.argsort(~valid_np, kind="stable"))
    return (_gather_rows(desc, perm), _gather_rows(emb, perm),
            _gather_rows(poses, perm), jnp.asarray(np.arange(m) < n_valid),
            n_valid, old_to_new)


@dataclasses.dataclass
class ServiceConfig:
    seq_len: int = 8                 # graph size (query + seq_len-1 nbrs)
    sampling_period: int = 5         # neighbor stride (train.py:112)
    retrieval_hw: tuple = (192, 256)  # NetVLAD input size (E2 geometry)
    deterministic: bool = False      # skip the stochastic 50% drop + offset
    #                                  (pure top-k strided retrieval)
    retrieval_candidates: int | None = 256
    # ^ windowed neighbor selection: rank only the top-C candidates per
    #   query instead of full-M argsort (exact — batch-level fallback to
    #   the full sort on window shortfall; subsample_neighbors_batch).
    #   None = always full argsort.  Measured: the full-M sort was 6.1 ms
    #   of the 48 ms serving step at B=128, M=4096.
    capacity: int | None = None
    # ^ pre-allocated database size for INCREMENTAL growth (add_frames):
    #   the device arrays are padded to `capacity` rows with a validity
    #   mask, so adding frames later updates rows in place and NEVER
    #   recompiles the query program (XLA programs are shape-specialized;
    #   a growing M would recompile per size).  Padded rows are excluded
    #   from retrieval by the mask on both selection branches.
    #   None = arrays sized exactly to build()'s database (no growth).
    retrieval: str = "netvlad"
    # ^ retrieval-descriptor source:
    #   "netvlad"      — the reference protocol: a separate VGG16+NetVLAD
    #                    pass at `retrieval_hw` (vlad_encoder.py:48-51).
    #   "shared-trunk" — rank neighbors by cosine over the SAME backbone
    #                    node embeddings the GNN consumes (db_desc becomes
    #                    the L2-normalized rows of db_emb; the query's
    #                    encode_nodes output is reused as its descriptor).
    #                    Deletes the retrieval trunk — 62% of the full
    #                    query step at B=512 (bench_service_bisect) — at
    #                    the cost of ranking with relpose features instead
    #                    of place-recognition features.  SEMANTIC knob:
    #                    neighbor sets change; validate ranking quality
    #                    per deployment (tests/test_service.py measures
    #                    synthetic-scene overlap vs the NetVLAD path).
    #                    TRAINED-weights end-task A/B (REGATE_r05.json,
    #                    benchmarks/regate_shared_trunk.py: 7 synthetic
    #                    scenes, DB=train/queries=test through this
    #                    service at 256x341, campaign ckpt): across-scene
    #                    medians 0.179 m/4.66 deg (shared-trunk) vs
    #                    0.193 m/4.75 deg (untrained-VGG16 netvlad) —
    #                    END-TASK PARITY with almost disjoint neighbor
    #                    sets (top-4 overlap ~0.11): the trained GNN
    #                    recovers equally good poses from differently
    #                    ranked neighbors when scene coverage is dense.
    #                    Real-scene validation (trained NetVLAD weights,
    #                    released datasets) remains per-deployment.
    #                    The desc table keeps its own (normalized f32)
    #                    copy so growth/compaction/persistence stay
    #                    uniform across modes — [M, feat_dim] f32, 16x
    #                    SMALLER than NetVLAD's [M, 32768].
    rank_dtype: str = "float32"
    # ^ descriptor-TABLE dtype for the similarity ranking.  "bfloat16"
    #   halves both the rank matmul's HBM traffic (the stage is
    #   bandwidth-bound: it reads the whole [M, 32768] table per batch —
    #   512 MB at M=4096 f32, ~4x its FLOP time; measured 1.7x on the
    #   stage, bench_retrieval_stages.py --stage rank) and the table's
    #   resident footprint (what caps DB capacity per chip alongside
    #   db_emb).  Similarities always ACCUMULATE in f32
    #   (preferred_element_type); only the stored descriptors round.
    #   SEMANTIC knob, default OFF.  Measured quality contract
    #   (tests/test_service.py::TestRankDtype): the rounding perturbs
    #   cosine similarities by <~1e-4 absolute, so rankings are exact
    #   WHEN the database's top-k cosine gaps exceed that — validate the
    #   gap distribution on YOUR database before enabling.  (Untrained
    #   synthetic descriptors have ~1e-6 gaps — degenerate near-ties —
    #   so no offline overlap number is quotable here; see the test.)
    #   Snapshots record the dtype; load casts to the loading service's
    #   configured rank_dtype (bf16->f32 widening is exact; f32->bf16
    #   equals what a fresh bf16 build would store).


class RelocalizationService:
    """Device-resident database + one jitted query path."""

    def __init__(self, model: RelPoseGNN, model_vars,
                 netvlad: NetVLADEncoder, netvlad_vars,
                 cfg: ServiceConfig = ServiceConfig(),
                 fold_bn: bool = True, s2d_stem: bool = False,
                 compact_edges: bool = True):
        if cfg.retrieval not in ("netvlad", "shared-trunk"):
            raise ValueError(f"unknown retrieval mode {cfg.retrieval!r}: "
                             "expected 'netvlad' or 'shared-trunk'")
        if cfg.rank_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown rank_dtype {cfg.rank_dtype!r}: "
                             "expected 'float32' or 'bfloat16'")
        self._rank_dt = jnp.dtype(cfg.rank_dtype)
        if cfg.retrieval == "netvlad" and netvlad is None:
            raise ValueError("retrieval='netvlad' needs a NetVLAD encoder "
                             "(pass netvlad/netvlad_vars, or use "
                             "retrieval='shared-trunk')")
        if fold_bn and model.cfg.backbone.startswith("resnet") \
                and not model.cfg.bn_folded:
            # serving form: BN folded into conv weights (~2.5x measured,
            # models/fold_bn.py); numerically equivalent at f32.  The
            # space-to-depth stem (s2d_stem) wins 14% on the standalone
            # backbone at batch 256 but LOSES ~4.5% inside the composed
            # serving step (measured both ways — fold_bn.py table);
            # default off, kept as a per-deployment A/B knob
            from relpose_gnn_tpu.models.fold_bn import fold_relpose_backbone
            fcfg, model_vars = fold_relpose_backbone(model.cfg, model_vars,
                                                     s2d_stem=s2d_stem)
            model = RelPoseGNN(fcfg)
        if compact_edges and model.cfg.use_gnn \
                and not model.cfg.compact_edges:
            # compact edge-list GNN: pair/attention work on the real kNN
            # edges only — exact (tests/test_compact_gnn.py), measured
            # +9% on the composed cached-serving step at batch 512
            # (bench.py in-situ A/B: 7733 vs 7073 q/s)
            model = RelPoseGNN(dataclasses.replace(
                model.cfg, compact_edges=True))
        self.model = model
        self.model_vars = model_vars
        self.netvlad = netvlad
        self.netvlad_vars = netvlad_vars
        self.cfg = cfg
        self.db_desc = None   # [M, 32768]
        self.db_emb = None    # [M, D]
        self.db_poses = None  # [M, 6]
        self.db_valid = None  # [M] bool (False = padded/empty slot)
        self.db_count = 0     # valid rows (== M when capacity is None)
        self._embed = None       # jitted embed, created by build()/
        self._model_norm = None  # add_frames (traced-in normalization)
        self._built_hw = None    # (H, W) the database was embedded at
        self._query_traces = 0   # trace-time counter (query_compiles)
        self._db_mesh = None     # set by shard_database(): tables are
        self._db_axis = None     # sharded over this mesh axis
        self._query_fn = self._make_query_fn()

    # -- database construction (once) ---------------------------------

    def _netvlad_input(self, images01: jax.Array) -> jax.Array:
        """raw [B, H, W, 3] in [0,1] -> NetVLAD input (resize + ImageNet
        normalize).  On-device bilinear resize; the offline index builder
        uses PIL (retrieval/netvlad_index.py:53-55).  Both are half-pixel-
        centered antialiased bilinear filters, and the drift is MEASURED,
        not assumed: on a synthetic scene of overlapping views the two
        paths' NetVLAD descriptors agree to cosine >= 0.9999999 and the
        top-4 neighbor sets are identical (overlap 1.0) —
        tests/test_service.py::TestResizeDrift."""
        b = images01.shape[0]
        h, w = self.cfg.retrieval_hw
        x = jax.image.resize(images01, (b, h, w, 3), method="bilinear")
        return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)

    def _make_embed(self, model_norm):
        @jax.jit
        def embed(chunk):
            emb = self.model.apply(self.model_vars,
                                   model_norm(chunk)[:, None], train=False,
                                   method=RelPoseGNN.encode_nodes)[:, 0]
            if self.cfg.retrieval == "shared-trunk":
                desc = _unit_rows(emb)
            else:
                desc = self.netvlad.apply(self.netvlad_vars,
                                          self._netvlad_input(chunk))
            # the TABLE rounds to rank_dtype once here (build/add_frames
            # both embed through this program); queries cast at the
            # matmul and similarities accumulate f32
            return desc.astype(self._rank_dt), emb

        self._embed = embed  # reused by add_frames (same jit cache)
        self._model_norm = model_norm  # embed traced it in; see add_frames
        return embed

    def build(self, db_images01: np.ndarray, db_poses: np.ndarray,
              model_norm, batch: int = 16) -> None:
        """Embed every database frame: NetVLAD descriptor + backbone node
        embedding.  `model_norm(images01) -> model input` applies the
        scene normalization used at graph-build time.  Accepts float in
        [0, 1] or uint8 (4x less host RAM and H2D traffic; converted on
        device per chunk, same contract as query())."""
        poses = _pose_rows(db_poses, len(db_images01), "build")
        self._built_hw = tuple(np.shape(db_images01)[1:3])
        embed = self._make_embed(model_norm)
        descs, embs = [], []
        for i in range(0, len(db_images01), batch):
            chunk = jnp.asarray(db_images01[i:i + batch])
            if chunk.dtype == jnp.uint8:
                chunk = _to_float01(chunk)
            d, e = embed(chunk)
            descs.append(d)
            embs.append(e)
        desc = jnp.concatenate(descs)
        emb = jnp.concatenate(embs)
        m = desc.shape[0]
        self.db_count = m
        if self.cfg.capacity is not None:
            cap = int(self.cfg.capacity)
            if m > cap:
                raise ValueError(f"database has {m} frames > capacity {cap}")
            pad = cap - m
            desc = jnp.pad(desc, ((0, pad), (0, 0)))
            emb = jnp.pad(emb, ((0, pad), (0, 0)))
            poses = jnp.pad(poses, ((0, pad), (0, 0)))
            self.db_valid = jnp.arange(cap) < m
        else:
            self.db_valid = jnp.ones((m,), bool)
        self.db_desc = desc
        self.db_emb = emb
        self.db_poses = poses

    def add_frames(self, images01: np.ndarray, poses: np.ndarray,
                   model_norm, batch: int = 16) -> None:
        """Grow the database in place: embed `images01` and write them
        into the next free capacity slots.  Requires
        `ServiceConfig.capacity`; the query program is NOT recompiled
        (all array shapes are static — only the validity mask and the
        slot contents change).  `model_norm` must be the same scene
        normalization build() used."""
        if self.cfg.capacity is None:
            raise ValueError(
                "add_frames requires ServiceConfig.capacity (build() sized "
                "the device arrays exactly; growth would change the query "
                "program's shapes and force a recompile)")
        assert self.db_desc is not None, "call build() first"
        if self._embed is None:
            # database restored via load_database: the embed program does
            # not exist yet — create it from this call's normalization
            self._make_embed(model_norm)
        elif model_norm is not self._model_norm:
            # the embed program traced build()'s model_norm in as a
            # closure; embedding new frames under a DIFFERENT
            # normalization would silently mix incompatible embeddings
            raise ValueError(
                "add_frames must be called with the same model_norm "
                "function object build() used (a different normalization "
                "requires rebuilding the whole database)")
        _check_built_hw(self._built_hw, np.shape(images01), "add_frames")
        n_new = len(images01)
        cap = int(self.cfg.capacity)
        if self.db_count + n_new > cap:
            raise ValueError(
                f"capacity exceeded: {self.db_count} + {n_new} > {cap}")
        pose_rows = _pose_rows(poses, n_new, "add_frames")
        self.db_desc, self.db_emb = _grow_rows(
            self.db_desc, self.db_emb, self._embed, images01, batch,
            self.db_count)
        # poses + validity are host data: one write each for the whole call
        self.db_poses = _update_rows(
            self.db_poses, pose_rows, jnp.int32(self.db_count))
        self.db_valid = _update_valid(
            self.db_valid, jnp.int32(self.db_count), jnp.int32(n_new))
        self.db_count += n_new
        if self._db_axis is not None:
            self._apply_db_sharding()

    def invalidate_frames(self, indices) -> None:
        """Tombstone database frames: flips their validity bits so they
        are never retrieved again (bad/stale frames pruned during
        operation).  Slots are NOT reclaimed here — add_frames keeps
        appending to fresh capacity until compact_database() reclaims
        the tombstones; works with or without `capacity` (without it
        compact + re-query is the only mutation available)."""
        assert self.db_valid is not None, "call build() first"
        self.db_valid = _tombstone(self.db_valid, self.db_count, indices)
        if self._db_axis is not None:
            self._apply_db_sharding()

    def compact_database(self) -> np.ndarray:
        """Reclaim tombstoned slots: permute the valid rows to the front
        (stable — survivors keep their relative order) and reset
        `db_count` to the valid total, so under add/invalidate churn the
        capacity add_frames appends into is bounded by the LIVE frame
        count, not the all-time total.  Array shapes are static: the
        query program never recompiles.

        Returns `old_to_new`, an int64 [M] map from pre-compaction slot
        index to post-compaction index (-1 for tombstoned/padded slots)
        — any externally-held frame indices (e.g. queued
        invalidate_frames targets) must be remapped through it.

        Query results are preserved exactly: invalid entries are masked
        out of the ranking key on both selection branches
        (`subsample_neighbors_batch` ranks them last with +inf keys, so
        they never consume drop-mask bits), survivors keep relative
        order under the stable permutation, and drop draws are keyed by
        rank position — so both modes return the same frames (slot
        indices renumbered through `old_to_new`) and bit-identical
        poses.  Tested both modes."""
        assert self.db_valid is not None, "call build() first"
        (self.db_desc, self.db_emb, self.db_poses, self.db_valid,
         self.db_count, old_to_new) = _compact(
            self.db_desc, self.db_emb, self.db_poses, self.db_valid,
            self.db_count)
        if self._db_axis is not None:
            self._apply_db_sharding()
        return old_to_new

    # -- database persistence ------------------------------------------

    def save_database(self, path: str) -> None:
        """Persist the built database (descriptors, embeddings, poses,
        validity, count) so a serving restart skips re-embedding the
        whole scene (a VGG16 + ResNet34 pass over every frame).
        bfloat16 arrays are widened to float32 on disk (numpy's npz has
        no bf16; widening is exact) and cast back on load — the
        round-trip is bit-exact."""
        assert self.db_desc is not None, "call build() first"

        def host(x):
            return (np.asarray(x.astype(jnp.float32))
                    if x.dtype == jnp.bfloat16 else np.asarray(x))

        # bind the snapshot to the weights + input resolution that
        # embedded it: db_emb (both modes) and the shared-trunk desc are
        # functions of the model weights and image size, so a snapshot
        # built under different ones must fail loudly at load/query time
        # instead of silently ranking garbage (ADVICE r4 #1)
        struct, checksum = _model_fingerprint(self.model_vars)
        np.savez(path, desc=host(self.db_desc), emb=host(self.db_emb),
                 poses=np.asarray(self.db_poses),
                 valid=np.asarray(self.db_valid),
                 count=np.int64(self.db_count),
                 desc_dtype=str(self.db_desc.dtype),
                 emb_dtype=str(self.db_emb.dtype),
                 retrieval_hw=np.asarray(self.cfg.retrieval_hw, np.int64),
                 retrieval=np.asarray(self.cfg.retrieval),
                 model_struct=np.asarray(struct),
                 model_checksum=np.float64(checksum),
                 built_hw=np.asarray(self._built_hw or (0, 0), np.int64))

    def load_database(self, path: str) -> None:
        """Restore a save_database() snapshot onto the device.  The
        service's config must match the one that built it (capacity is
        baked into the array sizes).  add_frames works after a load (the
        embed program is created lazily from its model_norm)."""
        z = np.load(path)
        if "scenes" in z.files:
            # the symmetric fail-loud contract to the multiscene loader's
            # "no 'scenes' key" check (ADVICE r4 #3): a MultiSceneService
            # snapshot here would otherwise die with a bare KeyError
            raise ValueError(
                f"{path} is a MultiSceneService snapshot (has a 'scenes' "
                "key) — load it through MultiSceneService.load_database, "
                "not the single-scene RelocalizationService")
        if "desc" not in z.files:
            raise ValueError(
                f"{path} is not a RelocalizationService snapshot (keys: "
                f"{sorted(z.files)[:8]})")
        m = z["desc"].shape[0]
        want = self.cfg.capacity if self.cfg.capacity is not None else m
        if m != want:
            raise ValueError(
                f"snapshot rows ({m}) do not match this service's "
                f"capacity ({want}); it was saved under a different "
                "ServiceConfig")
        # descriptors are a function of the retrieval MODE and (for
        # netvlad) the input size: serving a database built under a
        # different descriptor function would silently rank garbage
        # similarities — fail loudly instead.  Pre-round-4 snapshots have
        # no 'retrieval' key; they were all NetVLAD-built.
        snap_mode = (str(z["retrieval"]) if "retrieval" in z.files
                     else "netvlad")
        if snap_mode != self.cfg.retrieval:
            raise ValueError(
                f"snapshot was built with retrieval={snap_mode!r} but this "
                f"service is configured for {self.cfg.retrieval!r}; "
                "descriptors from different retrieval modes are not "
                "comparable — rebuild the database (or match the config)")
        snap_hw = tuple(int(v) for v in z["retrieval_hw"])
        if snap_mode == "netvlad" and snap_hw != tuple(self.cfg.retrieval_hw):
            raise ValueError(
                f"snapshot was built with retrieval_hw={snap_hw} but this "
                f"service embeds queries at {tuple(self.cfg.retrieval_hw)}; "
                "mixed-resolution descriptors are not comparable — rebuild "
                "the database (or match the config)")
        _check_fingerprint(z, self.model_vars, path)
        # cast to THIS service's rank_dtype, not the snapshot's: bf16->
        # f32 widening is exact, and f32->bf16 equals what a fresh bf16
        # build would store (embed rounds the same f32 descriptor once)
        self.db_desc = jnp.asarray(z["desc"]).astype(self._rank_dt)
        self.db_emb = jnp.asarray(z["emb"]).astype(str(z["emb_dtype"]))
        self.db_poses = jnp.asarray(z["poses"])
        self.db_valid = jnp.asarray(z["valid"])
        self.db_count = int(z["count"])
        if "built_hw" in z.files and int(z["built_hw"][0]) > 0:
            self._built_hw = tuple(int(v) for v in z["built_hw"])
        if self._db_axis is not None:
            self._apply_db_sharding()

    # -- multi-chip capacity: sharded tables ---------------------------

    def replicate_over(self, mesh) -> None:
        """Place weights + database on EVERY device of `mesh` so query
        batches can shard over its data axis — the THROUGHPUT scaling
        form (each device serves its rows of the batch; contrast
        shard_database, which splits the tables for CAPACITY).

        Multi-process aware: placement goes through multihost.put_like,
        so on a multi-host mesh each process uploads from its own
        (process-identical) host copy and the assembled global arrays
        span all hosts — the cli/serve.py --coordinator path
        (SURVEY §2.4 completed for the serving surface)."""
        from relpose_gnn_tpu.parallel.multihost import put_like
        from relpose_gnn_tpu.parallel.sharding import replicate

        assert self.db_desc is not None, "call build()/load_database() first"
        if self._db_mesh is not None:
            raise ValueError("database is sharded (shard_database); "
                             "replicate_over is the replicated-DB form")
        rep = replicate(mesh)
        place = lambda x: put_like(np.asarray(x), rep)  # noqa: E731
        self.model_vars = jax.tree.map(place, self.model_vars)
        if self.netvlad_vars is not None:
            self.netvlad_vars = jax.tree.map(place, self.netvlad_vars)
        self.db_desc = place(self.db_desc)
        self.db_emb = place(self.db_emb)
        self.db_poses = place(self.db_poses)
        self.db_valid = place(self.db_valid)

    def shard_database(self, mesh, axis: str | None = None) -> None:
        """Shard the two big tables (desc [M, 32768], emb [M, D]) over a
        mesh axis — multi-chip buys CAPACITY, not just throughput (the
        replicated layout caps M at one chip's HBM; VERDICT r4 missing
        #3).  poses/valid stay replicated (25 B/frame).  The query path
        switches to the sharded retrieval program
        (parallel/sharded_db.py: per-shard top-C + candidate all_gather
        + psum table lookup — the tables never move off their shards);
        results match the replicated layout exactly
        (tests/test_sharded_db.py).

        Call after build()/load_database().  M must divide the axis
        size; stochastic mode requires cfg.retrieval_candidates (no
        distributed full-M sort).  Later add_frames / invalidate /
        compact / load keep the sharded layout."""
        from relpose_gnn_tpu.parallel.mesh import DATA_AXIS
        from relpose_gnn_tpu.parallel.sharded_db import axis_size

        axis = axis or DATA_AXIS
        assert self.db_desc is not None, "call build()/load_database() first"
        if self._db_mesh is not None and self._db_mesh is not mesh:
            raise ValueError("service is already sharded over a different "
                             "mesh; build a new service to re-shard")
        m, n = self.db_desc.shape[0], axis_size(mesh, axis)
        if m % n != 0:
            raise ValueError(
                f"database size M={m} must divide mesh axis {axis!r} "
                f"(size {n}) — pad cfg.capacity to a multiple")
        if not self.cfg.deterministic and self.cfg.retrieval_candidates \
                is None:
            raise ValueError(
                "sharded-database stochastic retrieval requires "
                "cfg.retrieval_candidates (the full-M argsort fallback "
                "would gather the sharded tables)")
        self._db_mesh, self._db_axis = mesh, axis
        self._apply_db_sharding()

    def _apply_db_sharding(self) -> None:
        """(Re-)pin the table shardings after any mutation: jitted
        mutation helpers (_update_rows/_gather_rows) and load_database
        produce arrays whose output sharding XLA chose; pinning here is
        a no-op copy when the layout is already right."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, axis = self._db_mesh, self._db_axis
        shard = NamedSharding(mesh, P(axis, None))
        rep = NamedSharding(mesh, P())
        self.db_desc = jax.device_put(self.db_desc, shard)
        self.db_emb = jax.device_put(self.db_emb, shard)
        self.db_poses = jax.device_put(self.db_poses, rep)
        self.db_valid = jax.device_put(self.db_valid, rep)

    def _make_query_fn(self):
        cfg = self.cfg
        k = cfg.seq_len - 1

        # `model_norm` is a static (traced-in) argument: SCENE
        # NORMALIZATION runs INSIDE the jitted program so XLA fuses it
        # into the first convs and the [B, H, W, 3] query tensor is never
        # materialized twice in HBM.  (The uint8->float conversion stays
        # EAGER in query() on purpose: under jit XLA rewrites /255 into a
        # reciprocal multiply and breaks the tested uint8==float bit
        # identity — see _to_float01.)  Pass the SAME function object
        # across calls (a fresh lambda per call would retrace).
        @partial(jax.jit, static_argnums=(0,),
                 static_argnames=("db_mesh", "db_axis"))
        def query_fn(model_norm, model_vars, netvlad_vars, db_desc,
                     db_emb, db_poses, db_valid, query01, rng,
                     norm_ms=None, db_mesh=None, db_axis=None):
            # trace-time side effect: one increment per DISTINCT compiled
            # program (query_compiles counts these; the private jit
            # _cache_size API it used to rely on breaks across jax
            # upgrades — ADVICE r4 #2)
            self._query_traces += 1
            # norm_ms=(mean, std) arrays move the scene normalization
            # from a traced-in constant to a runtime ARGUMENT — the one
            # per-scene constant this program otherwise bakes in, and
            # what lets MultiSceneService share a single executable
            # across scenes (evaluation/multiscene.py).  The runtime form
            # is (x - mean) * (1/std), NOT (x - mean) / std: XLA rewrites
            # division by a traced CONSTANT into a reciprocal multiply,
            # so only the explicit reciprocal-multiply is bit-identical
            # to what a `(x - mean) / std` model_norm closure compiles to
            # (measured on CPU+TPU; tests/test_multiscene.py asserts the
            # bit-match per scene)
            query_model_in = (model_norm(query01) if norm_ms is None
                              else (query01 - norm_ms[0])
                              * (1.0 / norm_ms[1]))
            b = query01.shape[0]
            # 1. retrieval descriptor + similarities (one matmul).
            # shared-trunk mode reuses the query's backbone embedding
            # (computed here, consumed again at graph assembly) as its
            # descriptor — the whole retrieval stage reduces to one
            # normalize + one [B, D] x [D, M] matmul; the netvlad branch
            # keeps its trace order so its compiled programs (and their
            # measured numbers) are untouched
            if cfg.retrieval == "shared-trunk":
                q_emb = self.model.apply(model_vars,
                                         query_model_in[:, None],
                                         train=False,
                                         method=RelPoseGNN.encode_nodes)
                q_desc = _unit_rows(q_emb[:, 0])
            else:
                q_emb = None  # encoded after selection (trace order)
                q_desc = self.netvlad.apply(netvlad_vars,
                                            self._netvlad_input(query01))
            nbr_emb = None
            if db_axis is not None:
                # 2'. sharded tables (shard_database): per-shard top-C +
                # candidate all_gather + psum row lookup — selection AND
                # the embedding gather ride ICI, the [M, *] tables never
                # leave their shards (parallel/sharded_db.py; exactness
                # contract in tests/test_sharded_db.py)
                from relpose_gnn_tpu.parallel.sharded_db import \
                    select_and_lookup
                nbrs, nbr_emb = select_and_lookup(
                    q_desc, db_desc, db_emb, db_valid, mesh=db_mesh,
                    axis=db_axis, k=k,
                    sampling_period=cfg.sampling_period,
                    deterministic=cfg.deterministic,
                    candidates=cfg.retrieval_candidates, rng=rng)
            else:
                # table dtype = cfg.rank_dtype (bf16 halves the
                # bandwidth-bound table read); f32 accumulation keeps the
                # ranking key's precision at the table's rounding, not
                # the MXU's
                sim = jnp.einsum("bd,md->bm",
                                 q_desc.astype(db_desc.dtype), db_desc,
                                 preferred_element_type=jnp.float32)

            # 2. neighbor selection (db_valid masks capacity padding —
            # all-True without `capacity`, in which case both branches
            # are bit-identical to the unmasked forms)
            if db_axis is not None:
                pass  # selected above
            elif cfg.deterministic:
                # plain strided top-k: every sampling_period-th of the
                # ranked list.  Only ranks 0..(k-1)*sp are consumed, so
                # rank exactly that window instead of a full-M argsort
                # (top_k on the negated key == the stable sort; exact).
                # Ranks clamp to the last VALID entry (mirrors the
                # stochastic branch's first-valid clamp): with fewer
                # valid frames than the strided window — small builds
                # into a large capacity, heavy invalidate_frames — the
                # -inf-masked padding would otherwise be selected.
                m = db_desc.shape[0]
                sim_m = jnp.where(db_valid[None, :], sim, -jnp.inf)
                c = min((k - 1) * cfg.sampling_period + 1, m)
                _, order_c = jax.lax.top_k(sim_m, c)
                n_valid = jnp.sum(db_valid.astype(jnp.int32))
                ranks = jnp.arange(k, dtype=jnp.int32) * cfg.sampling_period
                ranks = jnp.minimum(ranks, jnp.maximum(n_valid - 1, 0))
                ranks = jnp.minimum(ranks, c - 1)  # tiny-DB guard (m < c)
                nbrs = jnp.take(order_c, ranks, axis=1)          # [B, K]
            else:
                nbrs = subsample_neighbors_batch(
                    rng, sim, ~db_valid, k, cfg.sampling_period,
                    candidates=cfg.retrieval_candidates)

            # 3. graph assembly from cached embeddings
            if q_emb is None:
                q_emb = self.model.apply(model_vars,
                                         query_model_in[:, None],
                                         train=False,
                                         method=RelPoseGNN.encode_nodes)
            if nbr_emb is None:
                nbr_emb = db_emb[nbrs]                    # [B, K, D]
            x = jnp.concatenate([q_emb, nbr_emb.astype(q_emb.dtype)],
                                axis=1)
            adj = jnp.broadcast_to(
                jnp.asarray(~np.eye(cfg.seq_len, dtype=bool)),
                (b, cfg.seq_len, cfg.seq_len))

            # 4. GNN + absolute-pose recovery (test.py:227-233 math)
            _, pred_rel, _, aux = self.model.apply(
                model_vars, x, adj, train=False,
                method=RelPoseGNN.from_embeddings)
            anchor_node = graph_ops.nearest_neighbor(aux["node_feats"],
                                                     node=0)
            rp = pred_rel[jnp.arange(b), anchor_node, 0]
            anchor_pose = db_poses[nbrs[jnp.arange(b), anchor_node - 1]]
            return {"pose": anchor_pose - rp, "neighbors": nbrs,
                    "anchor": anchor_node}

        return query_fn

    def query(self, query_images01: np.ndarray, model_norm,
              rng: jax.Array | None = None, norm_ms=None) -> dict:
        """Relocalize a batch of raw [B, H, W, 3] images.

        Accepts float in [0, 1], or uint8 — uint8 transfers 4x fewer
        bytes host->device and is converted/normalized ON DEVICE (the
        packed training stores are uint8 too, so this is also the
        bit-exact parity path vs training data).

        `norm_ms=(mean, std)` passes the scene normalization as runtime
        arrays instead of the traced-in `model_norm` callable (which is
        then ignored — pass None): applied as `(x - mean) * (1/std)`,
        which is bit-identical to what a traced `(x - mean) / std`
        closure compiles to (tests/test_multiscene.py), and the compiled
        program becomes scene-independent (MultiSceneService's
        executable-sharing contract).

        Returns {'pose' [B, 6] pose6, 'neighbors' [B, K], 'anchor' [B]}.
        """
        assert self.db_desc is not None, "call build() first"
        return self.query_with_db(
            (self.db_desc, self.db_emb, self.db_poses, self.db_valid),
            query_images01, model_norm, rng, norm_ms)

    def query_with_db(self, db: tuple, query_images01, model_norm,
                      rng: jax.Array | None = None, norm_ms=None) -> dict:
        """Run the shared jitted query program against EXPLICIT database
        arrays `db = (desc [M, Dv], emb [M, D], poses [M, 6], valid [M])`
        instead of this service's own — the MultiSceneService hook
        (evaluation/multiscene.py): every scene whose arrays share M hits
        the same compiled executable.  Same contract as `query` otherwise
        (uint8 accepted; norm_ms switches to runtime normalization)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        _check_built_hw(self._built_hw, np.shape(query_images01), "query")
        q = jnp.asarray(query_images01)  # uint8 rides the thin transfer
        if q.dtype == jnp.uint8:
            # separate step (NOT fused into query_fn): the same float
            # query program runs for both dtypes, so uint8 results stay
            # bit-identical to quantized-float queries (tested) and uint8
            # callers don't pay a second full-model compile
            q = _to_float01(q)
        return self._query_fn(None if norm_ms is not None else model_norm,
                              self.model_vars, self.netvlad_vars,
                              db[0], db[1], db[2], db[3], q, rng, norm_ms,
                              db_mesh=self._db_mesh, db_axis=self._db_axis)

    def query_compiles(self) -> int:
        """Number of DISTINCT compiled query programs this service has
        produced.  MultiSceneService's single-executable contract is
        asserted against this.  Counted explicitly by a trace-time side
        effect in query_fn (one increment per distinct trace) — NOT via
        the private jit `_cache_size()` API, which a jax upgrade can
        remove (ADVICE r4 #2); tests cross-check the two while the
        private API still exists."""
        return self._query_traces

    def query_stream(self, batches, model_norm, depth: int = 2,
                     rng: jax.Array | None = None, norm_ms=None):
        """Pipelined serving: relocalize a stream of query batches.

        Keeps up to `depth` batches in flight (JAX dispatch is async), so
        batch i+1's host->device upload and launch overhead overlap batch
        i's on-chip compute — per-batch `query()` + a blocking host read
        serializes those (DESIGN.md §roofline's second lever).  Yields
        one result dict per input batch, in order, with arrays fetched to
        numpy (the host read is the pipeline's only sync point).

        `batches` is any iterable of [B, H, W, 3] arrays (uint8 or float
        in [0, 1]); B may vary (each distinct B pays one compile).
        """
        return _pipelined_stream(
            lambda q, r: self.query(q, model_norm, r, norm_ms=norm_ms),
            batches, depth, rng)
