"""Sharded serving database (VERDICT r4 missing #3): tables sharded over
the mesh's data axis, retrieval exact vs the replicated layout.

Contract conventions follow tests/test_sharding.py: database STATE and
integer outputs (neighbor indices, anchors) are compared exactly across
layouts; float pose outputs are compared with a tight allclose (the
sharded lookup's psum adds exact zeros, but -0.0 -> +0.0 is possible).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                ServiceConfig)
from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.parallel.mesh import create_mesh


def build_service(seq_len=4, deterministic=False, retrieval_candidates=256,
                  capacity=None, retrieval="netvlad"):
    mcfg = RelPoseGNNConfig(num_nodes=seq_len, feat_dim=32, edge_dim=32,
                            node_dim=32, knn=2, backbone="resnet18",
                            droprate=0.0)
    model = RelPoseGNN(mcfg)
    model_vars = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, seq_len, 32, 40, 3)),
                            jnp.ones((1, seq_len, seq_len), bool),
                            train=False)
    if retrieval == "shared-trunk":
        netvlad, nv_vars = None, None
    else:
        netvlad = NetVLADEncoder(num_clusters=4, encoder_dim=512)
        nv_vars = netvlad.init(jax.random.PRNGKey(1),
                               jnp.ones((1, 48, 64, 3)))
    cfg = ServiceConfig(seq_len=seq_len, sampling_period=2,
                        retrieval_hw=(48, 64),
                        deterministic=deterministic,
                        retrieval_candidates=retrieval_candidates,
                        capacity=capacity, retrieval=retrieval)
    return RelocalizationService(model, model_vars, netvlad, nv_vars, cfg)


def model_norm(x):
    return (x - 0.5) / 0.25


def _data(m=16, seed=0):
    rng = np.random.default_rng(seed)
    db = rng.random((m, 32, 40, 3)).astype(np.float32)
    poses = rng.normal(size=(m, 6)).astype(np.float32)
    q = rng.random((8, 32, 40, 3)).astype(np.float32)
    return db, poses, q


def _pair(deterministic, **kw):
    """Two services with IDENTICAL weights and database; one sharded."""
    db, poses, q = _data(**{k: v for k, v in kw.items() if k in ("m",)})
    kw.pop("m", None)
    mesh = create_mesh(n_data=8, n_model=1)
    rep = build_service(deterministic=deterministic, **kw)
    shd = build_service(deterministic=deterministic, **kw)
    rep.build(db, poses, model_norm, batch=4)
    shd.build(db, poses, model_norm, batch=4)
    shd.shard_database(mesh)
    return rep, shd, q, poses, db, mesh


def _assert_match(o_rep, o_shd):
    np.testing.assert_array_equal(np.asarray(o_rep["neighbors"]),
                                  np.asarray(o_shd["neighbors"]))
    np.testing.assert_array_equal(np.asarray(o_rep["anchor"]),
                                  np.asarray(o_shd["anchor"]))
    np.testing.assert_allclose(np.asarray(o_rep["pose"]),
                               np.asarray(o_shd["pose"]),
                               rtol=1e-6, atol=1e-6)


class TestShardedDatabase:
    def test_deterministic_matches_replicated(self):
        rep, shd, q, _, _, _ = _pair(deterministic=True)
        key = jax.random.PRNGKey(3)
        _assert_match(rep.query(q, model_norm, key),
                      shd.query(q, model_norm, key))

    def test_stochastic_matches_replicated(self):
        """Same rng -> the windowed sharded selection consumes the SAME
        drop-mask bits and stride starts as the dense windowed path."""
        rep, shd, q, _, _, _ = _pair(deterministic=False,
                                     retrieval_candidates=8)
        for seed in (0, 1, 7):
            key = jax.random.PRNGKey(seed)
            _assert_match(rep.query(q, model_norm, key),
                          shd.query(q, model_norm, key))

    def test_shared_trunk_mode(self):
        rep, shd, q, _, _, _ = _pair(deterministic=True,
                                     retrieval="shared-trunk")
        key = jax.random.PRNGKey(5)
        _assert_match(rep.query(q, model_norm, key),
                      shd.query(q, model_norm, key))

    def test_tables_really_shard(self):
        _, shd, _, _, _, mesh = _pair(deterministic=True)
        # desc/emb: 8 shards each holding M/8 rows; poses/valid replicated
        assert len(shd.db_desc.sharding.device_set) == 8
        shard_shapes = {s.data.shape for s in shd.db_desc.addressable_shards}
        assert shard_shapes == {(2, shd.db_desc.shape[1])}
        shard_shapes = {s.data.shape for s in shd.db_emb.addressable_shards}
        assert shard_shapes == {(2, shd.db_emb.shape[1])}
        assert all(s.data.shape == shd.db_poses.shape
                   for s in shd.db_poses.addressable_shards)

    def test_mutations_keep_layout_and_match(self):
        """add_frames -> invalidate -> compact under the sharded layout:
        database STATE stays bitwise equal to the replicated service's
        (the test_sharding mesh contract), the sharded layout survives
        every mutation, and queries still agree."""
        db, poses, q = _data(m=12, seed=2)
        mesh = create_mesh(n_data=8, n_model=1)
        rep = build_service(deterministic=True, capacity=16)
        shd = build_service(deterministic=True, capacity=16)
        rep.build(db[:8], poses[:8], model_norm, batch=4)
        shd.build(db[:8], poses[:8], model_norm, batch=4)
        shd.shard_database(mesh)
        for svc in (rep, shd):
            svc.add_frames(db[8:], poses[8:], model_norm, batch=4)
            svc.invalidate_frames([1, 5])
            svc.compact_database()
        assert shd.db_count == rep.db_count == 10
        for name in ("db_desc", "db_emb", "db_poses", "db_valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(rep, name)),
                np.asarray(getattr(shd, name)), err_msg=name)
        # layout survived the mutation chain
        shard_shapes = {s.data.shape for s in shd.db_desc.addressable_shards}
        assert shard_shapes == {(2, shd.db_desc.shape[1])}
        key = jax.random.PRNGKey(9)
        _assert_match(rep.query(q, model_norm, key),
                      shd.query(q, model_norm, key))

    def test_save_load_keeps_sharding(self, tmp_path):
        rep, shd, q, _, _, _ = _pair(deterministic=True)
        path = str(tmp_path / "db.npz")
        shd.save_database(path)
        shd.load_database(path)
        shard_shapes = {s.data.shape for s in shd.db_desc.addressable_shards}
        assert shard_shapes == {(2, shd.db_desc.shape[1])}
        key = jax.random.PRNGKey(4)
        _assert_match(rep.query(q, model_norm, key),
                      shd.query(q, model_norm, key))

    def test_indivisible_m_fails_loudly(self):
        db, poses, _ = _data(m=12)  # 12 % 8 != 0
        mesh = create_mesh(n_data=8, n_model=1)
        svc = build_service(deterministic=True)
        svc.build(db, poses, model_norm, batch=4)
        with pytest.raises(ValueError, match="must divide"):
            svc.shard_database(mesh)

    def test_stochastic_requires_candidate_window(self):
        db, poses, _ = _data(m=16)
        mesh = create_mesh(n_data=8, n_model=1)
        svc = build_service(deterministic=False, retrieval_candidates=None)
        svc.build(db, poses, model_norm, batch=4)
        with pytest.raises(ValueError, match="retrieval_candidates"):
            svc.shard_database(mesh)

    def test_invalidated_rows_never_selected_sharded(self):
        """Tombstones on OTHER shards must be excluded too (the validity
        mask is replicated but consumed per shard)."""
        db, poses, q = _data(m=16, seed=4)
        mesh = create_mesh(n_data=8, n_model=1)
        svc = build_service(deterministic=True)
        svc.build(db, poses, model_norm, batch=4)
        svc.shard_database(mesh)
        dead = [0, 3, 7, 11, 15]
        svc.invalidate_frames(dead)
        out = svc.query(q, model_norm, jax.random.PRNGKey(0))
        nbrs = np.asarray(out["neighbors"])
        assert not np.isin(nbrs, dead).any()
