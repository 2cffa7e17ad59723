"""Multi-scene relocalization: ONE compiled query executable, every scene.

The reference's headline configuration is a single model trained on all 7
scenes and evaluated per scene (/root/reference/python/niantic/training/
train.py:87-106, testing/test.py:350-353).  A per-scene
RelocalizationService traces the scene's pixel normalization into the
compiled query program as a constant, so serving S scenes costs S full
compiles of an otherwise identical program (minutes each cold on a real
chip).  Here every per-scene quantity is RUNTIME DATA:

  * the database arrays (descriptors / embeddings / poses / validity) are
    already runtime arguments of the query program — they only need a
    COMMON SHAPE, which ``ServiceConfig.capacity`` provides: each scene's
    database pads to ``capacity`` rows behind its validity mask (the same
    mechanism that powers incremental growth);
  * the scene's pixel normalization moves from a traced-in closure to the
    ``norm_ms=(mean, std)`` runtime arrays of the shared query program
    (service.py), applied as ``(x - mean) * (1/std)`` — bit-identical to
    what XLA compiles a traced ``(x - mean) / std`` closure into (XLA
    rewrites division by a constant into a reciprocal multiply; measured,
    and asserted per scene by tests/test_multiscene.py).

Adding a scene never touches the query executable; ``query_compiles()``
(== the underlying jit cache size) proves the single-compile contract,
and cli/serve.py logs it when serving multiple scenes.

Scene databases support the full mutation surface of the single-scene
service — ``add_frames`` / ``invalidate_frames`` / ``compact_scene`` —
through the same shared helpers, plus ``save_database``/``load_database``
persistence with per-scene normalization stats embedded in the snapshot.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.posenet import RelPoseGNN
from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                ServiceConfig, _compact,
                                                _grow_rows,
                                                _pipelined_stream,
                                                _pose_rows,
                                                _to_float01, _tombstone,
                                                _unit_rows, _update_rows,
                                                _update_valid)


@dataclasses.dataclass
class SceneDatabase:
    """Device-resident per-scene state (all runtime args of the shared
    query program).  ``norm_ms`` holds the scene's pixel-normalization
    (mean, std) arrays, applied inside the query program at runtime."""
    desc: jax.Array      # [capacity, Dv]
    emb: jax.Array       # [capacity, D]
    poses: jax.Array     # [capacity, 6]
    valid: jax.Array     # [capacity] bool
    count: int           # live rows
    norm_ms: tuple       # (mean [3], std [3]) float32 device arrays
    hw: tuple | None = None  # (H, W) the scene was embedded at — queries
    #                          and add_frames must match it (the backbone
    #                          embeddings are resolution-dependent)

    def as_tuple(self):
        return self.desc, self.emb, self.poses, self.valid


class MultiSceneService:
    """One model + one compiled query program serving many scenes.

    Wraps a single RelocalizationService (which owns the model prep —
    BN folding, compact edges — and the shared jitted query path) and a
    dict of SceneDatabase states.  Every query dispatches the SAME
    executable with the target scene's arrays + normalization as inputs.
    """

    def __init__(self, model, model_vars, netvlad, netvlad_vars,
                 cfg: ServiceConfig, **service_kwargs):
        if cfg.capacity is None:
            raise ValueError(
                "MultiSceneService requires ServiceConfig.capacity: one "
                "query executable can only be shared across scenes whose "
                "database arrays share a shape — set capacity >= the "
                "largest scene's frame count")
        self._svc = RelocalizationService(model, model_vars, netvlad,
                                          netvlad_vars, cfg,
                                          **service_kwargs)
        self.cfg = cfg
        self._scenes: dict[str, SceneDatabase] = {}
        self._embed_ms = self._make_embed_ms()

    # -- embedding (shared across scenes) ------------------------------

    def _make_embed_ms(self):
        """One jitted embed program for every scene: the scene
        normalization is a runtime (mean, std) argument, in the same
        reciprocal-multiply form as the query program — so a scene's
        database embeddings are bit-identical to what a single-scene
        service's build() (traced ``(x - mean)/std`` closure) produces."""
        svc = self._svc

        @jax.jit
        def embed_ms(chunk, mean, std):
            x = (chunk - mean) * (1.0 / std)
            emb = svc.model.apply(svc.model_vars, x[:, None], train=False,
                                  method=RelPoseGNN.encode_nodes)[:, 0]
            if svc.cfg.retrieval == "shared-trunk":
                desc = _unit_rows(emb)
            else:
                desc = svc.netvlad.apply(svc.netvlad_vars,
                                         svc._netvlad_input(chunk))
            # same table-rounding contract as the single-scene embed
            return desc.astype(svc._rank_dt), emb

        return embed_ms

    def _embed_chunks(self, images, norm_ms, batch):
        descs, embs = [], []
        for i in range(0, len(images), batch):
            chunk = jnp.asarray(images[i:i + batch])
            if chunk.dtype == jnp.uint8:
                chunk = _to_float01(chunk)
            d, e = self._embed_ms(chunk, *norm_ms)
            descs.append(d)
            embs.append(e)
        return jnp.concatenate(descs), jnp.concatenate(embs)

    # -- scene management ----------------------------------------------

    def add_scene(self, name: str, db_images01: np.ndarray,
                  db_poses: np.ndarray, mean, std,
                  batch: int = 16) -> None:
        """Embed a scene's database split and register it under `name`.
        `mean`/`std` are the scene's pixel-normalization stats (the
        7-Scenes per-scene stats.txt values / Cambridge 0.5/0.25) —
        they ride with the scene as runtime arrays.  Images: float in
        [0, 1] or uint8, same contract as RelocalizationService.build."""
        if name in self._scenes:
            raise ValueError(f"scene {name!r} already added")
        cap = int(self.cfg.capacity)
        m = len(db_images01)
        if m > cap:
            raise ValueError(f"scene {name!r} has {m} frames > capacity "
                             f"{cap}")
        poses = _pose_rows(db_poses, m, f"add_scene({name!r})")
        norm_ms = (jnp.asarray(mean, jnp.float32).reshape(3),
                   jnp.asarray(std, jnp.float32).reshape(3))
        desc, emb = self._embed_chunks(db_images01, norm_ms, batch)
        pad = cap - m
        self._scenes[name] = SceneDatabase(
            desc=jnp.pad(desc, ((0, pad), (0, 0))),
            emb=jnp.pad(emb, ((0, pad), (0, 0))),
            poses=jnp.pad(poses, ((0, pad), (0, 0))),
            valid=jnp.arange(cap) < m, count=m, norm_ms=norm_ms,
            hw=tuple(np.shape(db_images01)[1:3]))
        # build is an offline operation: block so callers' wall-clock
        # build timing is honest on async-dispatch backends (the tunnel
        # returns from the last embed launch long before it executes)
        jax.block_until_ready(self._scenes[name].desc)

    def _db(self, scene: str) -> SceneDatabase:
        try:
            return self._scenes[scene]
        except KeyError:
            raise KeyError(
                f"unknown scene {scene!r}: this service has "
                f"{sorted(self._scenes) if self._scenes else 'no scenes'}"
            ) from None

    def scenes(self) -> list[str]:
        return list(self._scenes)

    def scene_count(self, name: str) -> int:
        return self._db(name).count

    # -- serving ---------------------------------------------------------

    def query(self, scene: str, query_images01,
              rng: jax.Array | None = None) -> dict:
        """Relocalize a batch of raw [B, H, W, 3] images against `scene`'s
        database, with `scene`'s normalization — through the executable
        every other scene shares.  Same return contract as
        RelocalizationService.query."""
        db = self._db(scene)
        from relpose_gnn_tpu.evaluation.service import _check_built_hw
        _check_built_hw(db.hw, np.shape(query_images01),
                        f"query({scene!r})")
        return self._svc.query_with_db(db.as_tuple(), query_images01,
                                       None, rng, norm_ms=db.norm_ms)

    def query_stream(self, scene: str, batches, depth: int = 2,
                     rng: jax.Array | None = None):
        """Pipelined serving of one scene's query stream (the schedule
        shared with RelocalizationService.query_stream)."""
        self._db(scene)  # fail on an unknown scene BEFORE any dispatch
        return _pipelined_stream(
            lambda q, r: self.query(scene, q, r), batches, depth, rng)

    def query_compiles(self) -> int:
        """Distinct compiled query programs so far — the single-
        executable contract says this stays 1 no matter how many scenes
        are added/served (cli/serve.py logs it)."""
        return self._svc.query_compiles()

    # -- per-scene mutations (same semantics as the single-scene service) -

    def add_frames(self, scene: str, images01, poses,
                   batch: int = 16) -> None:
        """Grow one scene's database in place (donated row updates into
        its free capacity slots; the shared query program is untouched —
        see RelocalizationService.add_frames).  The scene's registered
        normalization is used; there is no model_norm argument to
        mismatch."""
        db = self._db(scene)
        from relpose_gnn_tpu.evaluation.service import _check_built_hw
        _check_built_hw(db.hw, np.shape(images01),
                        f"add_frames({scene!r})")
        n_new = len(images01)
        cap = int(self.cfg.capacity)
        if db.count + n_new > cap:
            raise ValueError(
                f"capacity exceeded for scene {scene!r}: "
                f"{db.count} + {n_new} > {cap}")
        pose_rows = _pose_rows(poses, n_new, f"add_frames({scene!r})")
        db.desc, db.emb = _grow_rows(
            db.desc, db.emb, lambda c: self._embed_ms(c, *db.norm_ms),
            images01, batch, db.count)
        db.poses = _update_rows(db.poses, pose_rows, jnp.int32(db.count))
        db.valid = _update_valid(db.valid, jnp.int32(db.count),
                                 jnp.int32(n_new))
        db.count += n_new

    def invalidate_frames(self, scene: str, indices) -> None:
        """Tombstone frames of one scene (never retrieved again)."""
        db = self._db(scene)
        db.valid = _tombstone(db.valid, db.count, indices)

    def compact_scene(self, scene: str) -> np.ndarray:
        """Reclaim one scene's tombstoned slots (stable front compaction;
        returns the old_to_new slot map — see
        RelocalizationService.compact_database)."""
        db = self._db(scene)
        (db.desc, db.emb, db.poses, db.valid, db.count,
         old_to_new) = _compact(db.desc, db.emb, db.poses, db.valid,
                                db.count)
        return old_to_new

    # -- persistence -------------------------------------------------------

    def save_database(self, path: str) -> None:
        """Persist every scene's database to one npz (arrays prefixed by
        scene; bf16 widened to f32 exactly, like
        RelocalizationService.save_database)."""
        def host(x):
            return (np.asarray(x.astype(jnp.float32))
                    if x.dtype == jnp.bfloat16 else np.asarray(x))

        from relpose_gnn_tpu.evaluation.service import _model_fingerprint
        struct, checksum = _model_fingerprint(self._svc.model_vars)
        payload = {"scenes": np.asarray(sorted(self._scenes)),
                   "retrieval_hw": np.asarray(self.cfg.retrieval_hw,
                                              np.int64),
                   "retrieval": np.asarray(self.cfg.retrieval),
                   "model_struct": np.asarray(struct),
                   "model_checksum": np.float64(checksum)}
        for name, db in self._scenes.items():
            payload[f"{name}/desc"] = host(db.desc)
            payload[f"{name}/emb"] = host(db.emb)
            payload[f"{name}/poses"] = np.asarray(db.poses)
            payload[f"{name}/valid"] = np.asarray(db.valid)
            payload[f"{name}/count"] = np.int64(db.count)
            payload[f"{name}/desc_dtype"] = str(db.desc.dtype)
            payload[f"{name}/emb_dtype"] = str(db.emb.dtype)
            payload[f"{name}/norm_mean"] = np.asarray(db.norm_ms[0])
            payload[f"{name}/norm_std"] = np.asarray(db.norm_ms[1])
            payload[f"{name}/hw"] = np.asarray(db.hw or (0, 0), np.int64)
        np.savez(path, **payload)

    def load_database(self, path: str) -> None:
        """Restore a save_database() snapshot (all scenes).  Capacity and
        retrieval mode/resolution must match the saving config — the same
        fail-loudly contracts as the single-scene loader.

        REPLACES the service's scene registry wholesale (like the
        single-scene loader replaces its db_* state): scenes added before
        the load are dropped, never silently mixed with restored ones —
        a merge would overwrite same-named scenes with different
        embeddings/normalization while keeping stale extras, a
        mixed-provenance state nothing could debug."""
        z = np.load(path)
        if "scenes" not in z.files:
            raise ValueError(
                f"{path} is not a MultiSceneService snapshot (no 'scenes' "
                "key — a single-scene RelocalizationService.save_database "
                "file? load it through RelocalizationService instead)")
        snap_mode = (str(z["retrieval"]) if "retrieval" in z.files
                     else "netvlad")
        if snap_mode != self.cfg.retrieval:
            raise ValueError(
                f"snapshot was built with retrieval={snap_mode!r} but this "
                f"service is configured for {self.cfg.retrieval!r}; "
                "descriptors from different retrieval modes are not "
                "comparable")
        snap_hw = tuple(int(v) for v in z["retrieval_hw"])
        if snap_mode == "netvlad" and snap_hw != tuple(self.cfg.retrieval_hw):
            raise ValueError(
                f"snapshot was built with retrieval_hw={snap_hw} but this "
                f"service embeds queries at {tuple(self.cfg.retrieval_hw)};"
                " mixed-resolution descriptors are not comparable")
        from relpose_gnn_tpu.evaluation.service import _check_fingerprint
        _check_fingerprint(z, self._svc.model_vars, path)
        cap = int(self.cfg.capacity)
        restored: dict[str, SceneDatabase] = {}
        for name in (str(s) for s in z["scenes"]):
            m = z[f"{name}/desc"].shape[0]
            if m != cap:
                raise ValueError(
                    f"scene {name!r} snapshot rows ({m}) != capacity "
                    f"({cap}); saved under a different ServiceConfig")
            restored[name] = SceneDatabase(
                # cast to THIS service's rank_dtype (same contract as the
                # single-scene loader; see ServiceConfig.rank_dtype)
                desc=jnp.asarray(z[f"{name}/desc"]).astype(
                    self._svc._rank_dt),
                emb=jnp.asarray(z[f"{name}/emb"]).astype(
                    str(z[f"{name}/emb_dtype"])),
                poses=jnp.asarray(z[f"{name}/poses"]),
                valid=jnp.asarray(z[f"{name}/valid"]),
                count=int(z[f"{name}/count"]),
                norm_ms=(jnp.asarray(z[f"{name}/norm_mean"]),
                         jnp.asarray(z[f"{name}/norm_std"])),
                hw=(tuple(int(v) for v in z[f"{name}/hw"])
                    if f"{name}/hw" in z.files
                    and int(z[f"{name}/hw"][0]) > 0 else None))
        # atomic swap: a mid-load validation error leaves the registry
        # untouched rather than half-restored
        self._scenes = restored
