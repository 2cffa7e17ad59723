"""End-to-end on-device relocalization service tests."""

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                ServiceConfig)
from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig


def build_service(seq_len=4, deterministic=False):
    mcfg = RelPoseGNNConfig(num_nodes=seq_len, feat_dim=32, edge_dim=32,
                            node_dim=32, knn=2, backbone="resnet18",
                            droprate=0.0)
    model = RelPoseGNN(mcfg)
    model_vars = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, seq_len, 32, 40, 3)),
                            jnp.ones((1, seq_len, seq_len), bool),
                            train=False)
    netvlad = NetVLADEncoder(num_clusters=4, encoder_dim=512)
    nv_vars = netvlad.init(jax.random.PRNGKey(1), jnp.ones((1, 48, 64, 3)))
    cfg = ServiceConfig(seq_len=seq_len, sampling_period=2,
                        retrieval_hw=(48, 64), deterministic=deterministic)
    return RelocalizationService(model, model_vars, netvlad, nv_vars, cfg)


def model_norm(x):
    return (x - 0.5) / 0.25


class TestRelocalizationService:
    def test_query_contract(self):
        svc = build_service()
        rng = np.random.default_rng(0)
        db = rng.random((12, 32, 40, 3)).astype(np.float32)
        db_poses = rng.normal(size=(12, 6)).astype(np.float32)
        svc.build(db, db_poses, model_norm, batch=4)
        assert svc.db_desc.shape == (12, 4 * 512)
        assert svc.db_emb.shape == (12, 32)

        queries = rng.random((3, 32, 40, 3)).astype(np.float32)
        out = svc.query(queries, model_norm, jax.random.PRNGKey(2))
        assert out["pose"].shape == (3, 6)
        assert out["neighbors"].shape == (3, 3)  # seq_len-1
        assert np.isfinite(np.asarray(out["pose"])).all()
        # neighbors are valid db indices
        nbrs = np.asarray(out["neighbors"])
        assert (nbrs >= 0).all() and (nbrs < 12).all()

    def test_deterministic_mode_is_reproducible_and_similar_first(self):
        svc = build_service(deterministic=True)
        rng = np.random.default_rng(1)
        db = rng.random((10, 32, 40, 3)).astype(np.float32)
        db_poses = rng.normal(size=(10, 6)).astype(np.float32)
        svc.build(db, db_poses, model_norm, batch=4)
        # query identical to db frame 4 -> its top-ranked neighbor is 4
        q = db[4:5]
        o1 = svc.query(q, model_norm, jax.random.PRNGKey(0))
        o2 = svc.query(q, model_norm, jax.random.PRNGKey(9))
        np.testing.assert_array_equal(np.asarray(o1["neighbors"]),
                                      np.asarray(o2["neighbors"]))
        assert int(o1["neighbors"][0, 0]) == 4

    def test_stochastic_mode_varies_with_rng(self):
        svc = build_service(deterministic=False)
        rng = np.random.default_rng(2)
        db = rng.random((32, 32, 40, 3)).astype(np.float32)
        db_poses = rng.normal(size=(32, 6)).astype(np.float32)
        svc.build(db, db_poses, model_norm, batch=8)
        q = rng.random((1, 32, 40, 3)).astype(np.float32)
        sets = {tuple(np.asarray(svc.query(
            q, model_norm, jax.random.PRNGKey(s))["neighbors"])[0].tolist())
            for s in range(6)}
        assert len(sets) > 1  # stochastic drop/offset varies the graph

    def test_perfect_rel_predictions_would_recover_pose(self):
        """Service math check: with pred_rel == p_s - p_t the recovered
        pose equals the anchor's pose minus the true difference == query
        pose (pure math, mirrors test.py:230)."""
        rng = np.random.default_rng(3)
        poses = rng.normal(size=(5, 6))
        anchor = poses[2]
        query = poses[0]
        rp = anchor - query
        np.testing.assert_allclose(anchor - rp, query, atol=1e-12)
