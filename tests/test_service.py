"""End-to-end on-device relocalization service tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.evaluation.service import (RelocalizationService,
                                                ServiceConfig)
from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig


def build_service(seq_len=4, deterministic=False, retrieval_candidates=256,
                  capacity=None, dtype=None, retrieval_hw=(48, 64),
                  retrieval="netvlad", rank_dtype="float32"):
    mcfg = RelPoseGNNConfig(num_nodes=seq_len, feat_dim=32, edge_dim=32,
                            node_dim=32, knn=2, backbone="resnet18",
                            droprate=0.0, dtype=dtype)
    model = RelPoseGNN(mcfg)
    model_vars = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, seq_len, 32, 40, 3)),
                            jnp.ones((1, seq_len, seq_len), bool),
                            train=False)
    if retrieval == "shared-trunk":
        # exercises the NetVLAD-free construction path (no encoder needed)
        netvlad, nv_vars = None, None
    else:
        netvlad = NetVLADEncoder(num_clusters=4, encoder_dim=512,
                                 dtype=dtype)
        nv_vars = netvlad.init(jax.random.PRNGKey(1),
                               jnp.ones((1, 48, 64, 3)))
    cfg = ServiceConfig(seq_len=seq_len, sampling_period=2,
                        retrieval_hw=retrieval_hw,
                        deterministic=deterministic,
                        retrieval_candidates=retrieval_candidates,
                        capacity=capacity, retrieval=retrieval,
                        rank_dtype=rank_dtype)
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

    def test_windowed_retrieval_matches_full_sort(self):
        # retrieval_candidates < M engages the windowed top-C selection:
        # served poses/neighbors must be bit-identical to the full-M
        # argsort service (exactness contract of
        # subsample_neighbors_batch), in both retrieval modes
        rng = np.random.default_rng(7)
        db = rng.random((40, 32, 40, 3)).astype(np.float32)
        db_poses = rng.normal(size=(40, 6)).astype(np.float32)
        queries = rng.random((3, 32, 40, 3)).astype(np.float32)
        for det in (False, True):
            outs = []
            for cand in (None, 16):
                svc = build_service(deterministic=det,
                                    retrieval_candidates=cand)
                svc.build(db, db_poses, model_norm, batch=8)
                outs.append(svc.query(queries, model_norm,
                                      jax.random.PRNGKey(3)))
            np.testing.assert_array_equal(np.asarray(outs[0]["neighbors"]),
                                          np.asarray(outs[1]["neighbors"]))
            np.testing.assert_array_equal(np.asarray(outs[0]["pose"]),
                                          np.asarray(outs[1]["pose"]))

    def test_query_stream_matches_sequential_queries(self):
        """Pipelined serving is a scheduling change only: query_stream
        yields exactly what per-batch query() calls produce (same fold_in
        rng schedule), in order, for every pipeline depth."""
        svc = build_service(deterministic=False)
        rng = np.random.default_rng(3)
        db = rng.random((16, 32, 40, 3)).astype(np.float32)
        db_poses = rng.normal(size=(16, 6)).astype(np.float32)
        svc.build(db, db_poses, model_norm, batch=8)
        batches = [rng.random((2, 32, 40, 3)).astype(np.float32)
                   for _ in range(5)]
        key = jax.random.PRNGKey(11)
        want = [svc.query(b, model_norm, jax.random.fold_in(key, i))
                for i, b in enumerate(batches)]
        for depth in (1, 3):
            got = list(svc.query_stream(batches, model_norm, depth=depth,
                                        rng=key))
            assert len(got) == len(want)
            for g, w in zip(got, want):
                np.testing.assert_array_equal(g["neighbors"],
                                              np.asarray(w["neighbors"]))
                np.testing.assert_allclose(g["pose"], np.asarray(w["pose"]),
                                           atol=1e-6)

    def test_uint8_query_bitwise_matches_quantized_float(self):
        """uint8 queries ride a 4x-thinner H2D transfer and are converted
        on device; the result must be bit-identical to sending the same
        quantized values as float."""
        svc = build_service(deterministic=True)
        rng = np.random.default_rng(4)
        db = rng.random((10, 32, 40, 3)).astype(np.float32)
        db_poses = rng.normal(size=(10, 6)).astype(np.float32)
        svc.build(db, db_poses, model_norm, batch=4)
        q8 = rng.integers(0, 256, size=(2, 32, 40, 3)).astype(np.uint8)
        qf = q8.astype(np.float32) / 255.0
        o8 = svc.query(q8, model_norm, jax.random.PRNGKey(0))
        of = svc.query(qf, model_norm, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(o8["pose"]),
                                      np.asarray(of["pose"]))
        np.testing.assert_array_equal(np.asarray(o8["neighbors"]),
                                      np.asarray(of["neighbors"]))

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


class TestResizeDrift:
    def test_neighbor_overlap_pil_vs_jax_resize(self):
        """Quantify VERDICT's 'resize drift': the offline index builder
        resizes with PIL (retrieval/netvlad_index.py:53-55) while the
        on-device service uses jax.image.resize bilinear
        (service.py:_netvlad_input).  Both use half-pixel centers and
        antialias on downscale, so descriptors should land on (nearly)
        identical neighbor sets.  This measures top-k overlap on a
        synthetic scene of overlapping views; the measured number is
        documented in evaluation/service.py.
        """
        from PIL import Image
        from scipy.ndimage import gaussian_filter

        from relpose_gnn_tpu.retrieval.netvlad_index import (
            IMAGENET_MEAN, IMAGENET_STD, imagenet_normalize)

        rng = np.random.default_rng(0)
        # smooth 'scene' field; frames = sliding crops (overlapping views)
        field = gaussian_filter(rng.normal(size=(200, 270, 3)),
                                sigma=(7, 7, 0))
        field = (field - field.min()) / (field.max() - field.min())
        h, w, m = 96, 128, 24
        frames = np.stack([field[3 * i:3 * i + h, 4 * i:4 * i + w]
                           for i in range(m)]).astype(np.float32)
        hw = (48, 64)

        def pil_resize(img01):
            # offline builder path: uint8 quantize (decoded images) + PIL
            pil = Image.fromarray((np.clip(img01, 0, 1) * 255)
                                  .astype(np.uint8))
            return np.asarray(pil.resize((hw[1], hw[0]), Image.BILINEAR),
                              np.float32) / 255.0

        db_in = imagenet_normalize(np.stack([pil_resize(f) for f in frames]))
        srv = jax.image.resize(jnp.asarray(frames), (m, *hw, 3), "bilinear")
        srv_in = (np.asarray(srv) - IMAGENET_MEAN) / IMAGENET_STD

        from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
        enc = NetVLADEncoder(num_clusters=8)
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)))
        d_db = np.asarray(enc.apply(v, jnp.asarray(db_in)), np.float64)
        d_srv = np.asarray(enc.apply(v, jnp.asarray(srv_in)), np.float64)

        # raw descriptor agreement between the two resize paths
        cos_self = np.sum(d_db * d_srv, axis=1)  # both L2-normalized
        assert cos_self.min() > 0.99, cos_self.min()

        # DB embedded offline (PIL); queries arrive through the service
        k = 4
        sim_ref = d_db @ d_db.T
        sim_srv = d_srv @ d_db.T
        np.fill_diagonal(sim_ref, -np.inf)  # exclude self-match
        np.fill_diagonal(sim_srv, -np.inf)
        top_ref = np.argsort(-sim_ref, axis=1)[:, :k]
        top_srv = np.argsort(-sim_srv, axis=1)[:, :k]
        overlap = np.mean([len(set(a) & set(b)) / k
                           for a, b in zip(top_ref, top_srv)])
        # measured 2026-08: overlap = 1.0 (identical top-4 sets) with
        # min descriptor cosine ~0.999; threshold leaves slack for BLAS
        # variation across hosts
        assert overlap >= 0.9, overlap

    def test_neighbor_overlap_reduced_retrieval_resolution(self):
        """Quantify the reduced-resolution retrieval KNOB (ServiceConfig
        .retrieval_hw; bench_service --retrieval-hw): the VGG16 trunk is
        63% of the full query step and scales with H*W, so halving each
        retrieval dimension quarters its FLOPs.  Unlike the two-resize
        comparison above this is a SEMANTIC change — descriptors differ —
        so the honest question is ranking agreement, not descriptor
        cosine.  Both the database and the queries embed at the same
        (reduced) size (build() and query() share _netvlad_input, and
        load_database rejects mixed-resolution snapshots).

        Synthetic-scene evidence only: overlapping crops of a smooth
        field, untrained NetVLAD weights (no egress).  Measured 2026-08:
        top-4 overlap 0.927 at half resolution on this scene.  Real
        scenes must validate per deployment — the knob defaults OFF
        (192x256 everywhere)."""
        from scipy.ndimage import gaussian_filter

        from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
        from relpose_gnn_tpu.retrieval.netvlad_index import (IMAGENET_MEAN,
                                                             IMAGENET_STD)

        rng = np.random.default_rng(3)
        field = gaussian_filter(rng.normal(size=(200, 270, 3)),
                                sigma=(7, 7, 0))
        field = (field - field.min()) / (field.max() - field.min())
        h, w, m = 96, 128, 24
        frames = np.stack([field[3 * i:3 * i + h, 4 * i:4 * i + w]
                           for i in range(m)]).astype(np.float32)

        enc = NetVLADEncoder(num_clusters=8)

        def descriptors(hw):
            x = jax.image.resize(jnp.asarray(frames), (m, *hw, 3),
                                 "bilinear")
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)))
            return np.asarray(enc.apply(v, x), np.float64)

        k = 4

        def topk_sets(d):
            sim = d @ d.T
            np.fill_diagonal(sim, -np.inf)
            return np.argsort(-sim, axis=1)[:, :k]

        top_full = topk_sets(descriptors((48, 64)))
        top_half = topk_sets(descriptors((24, 32)))
        overlap = np.mean([len(set(a) & set(b)) / k
                           for a, b in zip(top_full, top_half)])
        assert overlap >= 0.75, overlap


class TestSharedTrunkRetrieval:
    """retrieval='shared-trunk': neighbors ranked by cosine over the SAME
    backbone embeddings the GNN consumes — no NetVLAD/VGG16 pass at all
    (that trunk is 62% of the full query step at B=512,
    benchmarks/bench_service_bisect.py).  SEMANTIC knob (neighbor sets
    change); default stays 'netvlad' (the reference's protocol)."""

    def _db(self, n, seed=0, hw=(32, 40)):
        rng = np.random.default_rng(seed)
        return (rng.random((n,) + hw + (3,)).astype(np.float32),
                rng.normal(size=(n, 6)).astype(np.float32))

    def test_query_contract_and_self_match(self):
        svc = build_service(retrieval="shared-trunk", deterministic=True)
        db, db_poses = self._db(12, seed=11)
        svc.build(db, db_poses, model_norm, batch=4)
        # descriptor table IS the normalized embedding table (f32)
        assert svc.db_desc.shape == (12, 32)
        assert svc.db_desc.dtype == jnp.float32
        emb = np.asarray(svc.db_emb, np.float64)
        want = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(svc.db_desc, np.float64),
                                   want, atol=1e-6)
        # query identical to db frame 4 -> its top neighbor is 4
        out = svc.query(db[4:5], model_norm, jax.random.PRNGKey(0))
        assert int(out["neighbors"][0, 0]) == 4
        assert out["pose"].shape == (1, 6)
        assert np.isfinite(np.asarray(out["pose"])).all()

    def test_windowed_matches_full_sort(self):
        # the windowed top-C exactness contract holds for shared-trunk
        # similarities too (they are just a different ranking key)
        db, db_poses = self._db(40, seed=12)
        rng = np.random.default_rng(13)
        queries = rng.random((3, 32, 40, 3)).astype(np.float32)
        for det in (False, True):
            outs = []
            for cand in (None, 16):
                svc = build_service(retrieval="shared-trunk",
                                    deterministic=det,
                                    retrieval_candidates=cand)
                svc.build(db, db_poses, model_norm, batch=8)
                outs.append(svc.query(queries, model_norm,
                                      jax.random.PRNGKey(3)))
            np.testing.assert_array_equal(np.asarray(outs[0]["neighbors"]),
                                          np.asarray(outs[1]["neighbors"]))
            np.testing.assert_array_equal(np.asarray(outs[0]["pose"]),
                                          np.asarray(outs[1]["pose"]))

    def test_growth_matches_fresh_build(self):
        # build(8) + add_frames(4) == build(12), bitwise, in shared-trunk
        # mode (growth embeds through the same chunked program)
        db, db_poses = self._db(12, seed=14)
        grown = build_service(retrieval="shared-trunk", capacity=16)
        grown.build(db[:8], db_poses[:8], model_norm, batch=4)
        grown.add_frames(db[8:], db_poses[8:], model_norm, batch=4)
        fresh = build_service(retrieval="shared-trunk", capacity=16)
        fresh.build(db, db_poses, model_norm, batch=4)
        np.testing.assert_array_equal(np.asarray(grown.db_desc),
                                      np.asarray(fresh.db_desc))
        np.testing.assert_array_equal(np.asarray(grown.db_emb),
                                      np.asarray(fresh.db_emb))
        np.testing.assert_array_equal(np.asarray(grown.db_valid),
                                      np.asarray(fresh.db_valid))

    def test_persistence_roundtrip_and_mode_mismatch(self, tmp_path):
        db, db_poses = self._db(10, seed=15)
        svc = build_service(retrieval="shared-trunk", deterministic=True)
        svc.build(db, db_poses, model_norm, batch=4)
        path = str(tmp_path / "db.npz")
        svc.save_database(path)
        # roundtrip: restored database serves bit-identical results
        want = svc.query(db[2:4], model_norm, jax.random.PRNGKey(1))
        svc2 = build_service(retrieval="shared-trunk", deterministic=True)
        svc2.load_database(path)
        got = svc2.query(db[2:4], model_norm, jax.random.PRNGKey(1))
        np.testing.assert_array_equal(np.asarray(got["pose"]),
                                      np.asarray(want["pose"]))
        np.testing.assert_array_equal(np.asarray(got["neighbors"]),
                                      np.asarray(want["neighbors"]))
        # a netvlad-mode service must refuse a shared-trunk snapshot
        # (descriptors from different retrieval modes rank garbage)
        nv = build_service(deterministic=True)
        with pytest.raises(ValueError, match="retrieval="):
            nv.load_database(path)

    def test_netvlad_mode_requires_encoder(self):
        mcfg = RelPoseGNNConfig(num_nodes=4, feat_dim=32, edge_dim=32,
                                node_dim=32, knn=2, backbone="resnet18",
                                droprate=0.0)
        model = RelPoseGNN(mcfg)
        model_vars = model.init(jax.random.PRNGKey(0),
                                jnp.ones((1, 4, 32, 40, 3)),
                                jnp.ones((1, 4, 4), bool), train=False)
        with pytest.raises(ValueError, match="NetVLAD"):
            RelocalizationService(model, model_vars, None, None,
                                  ServiceConfig(seq_len=4))
        with pytest.raises(ValueError, match="retrieval mode"):
            RelocalizationService(model, model_vars, None, None,
                                  ServiceConfig(seq_len=4,
                                                retrieval="typo"))

    def test_neighbor_overlap_vs_netvlad(self):
        """Quantify the shared-trunk KNOB's ranking agreement with the
        NetVLAD path on the synthetic overlapping-views scene (same
        harness as the reduced-resolution knob's gate above): top-4
        neighbor sets from cosine over backbone embeddings vs NetVLAD
        descriptors.  Untrained weights, synthetic scene — real scenes
        must validate per deployment; the knob defaults OFF.  Measured
        2026-08: top-4 overlap 0.708 between the two UNTRAINED rankings
        (a floor, not the deployment number: trained relpose features
        are location-discriminative by construction, while untrained
        random-projection features are the weakest case for this knob)."""
        from scipy.ndimage import gaussian_filter

        from relpose_gnn_tpu.retrieval.netvlad_index import (IMAGENET_MEAN,
                                                             IMAGENET_STD)

        rng = np.random.default_rng(5)
        field = gaussian_filter(rng.normal(size=(200, 270, 3)),
                                sigma=(7, 7, 0))
        field = (field - field.min()) / (field.max() - field.min())
        h, w, m = 96, 128, 24
        frames = np.stack([field[3 * i:3 * i + h, 4 * i:4 * i + w]
                           for i in range(m)]).astype(np.float32)

        # NetVLAD descriptors (the reference's retrieval function)
        enc = NetVLADEncoder(num_clusters=8)
        hw = (48, 64)
        x = jax.image.resize(jnp.asarray(frames), (m, *hw, 3), "bilinear")
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)))
        d_nv = np.asarray(enc.apply(v, x), np.float64)

        # shared-trunk descriptors (normalized backbone embeddings)
        mcfg = RelPoseGNNConfig(num_nodes=4, feat_dim=32, edge_dim=32,
                                node_dim=32, knn=2, backbone="resnet18",
                                droprate=0.0)
        model = RelPoseGNN(mcfg)
        mv = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 4, h, w, 3)),
                        jnp.ones((1, 4, 4), bool), train=False)
        emb = model.apply(mv, model_norm(jnp.asarray(frames))[:, None],
                          train=False,
                          method=RelPoseGNN.encode_nodes)[:, 0]
        emb = np.asarray(emb, np.float64)
        d_st = emb / np.linalg.norm(emb, axis=1, keepdims=True)

        k = 4

        def topk_sets(d):
            sim = d @ d.T
            np.fill_diagonal(sim, -np.inf)
            return np.argsort(-sim, axis=1)[:, :k]

        top_nv = topk_sets(d_nv)
        top_st = topk_sets(d_st)
        overlap = np.mean([len(set(a) & set(b)) / k
                           for a, b in zip(top_nv, top_st)])
        assert overlap >= 0.5, overlap


class TestRankDtype:
    """ServiceConfig.rank_dtype='bfloat16' quality gate: the descriptor
    TABLE rounds to bf16 (halving the bandwidth-bound rank matmul's HBM
    reads and the table's resident footprint — measured 1.7x on the
    stage, bench_retrieval_stages.py --stage rank) while similarities
    accumulate in f32.  SEMANTIC knob: near-tie ranks can flip, so the
    gate is measured neighbor overlap, not bitwise equality."""

    def test_table_dtype_and_query_contract(self):
        svc = build_service(deterministic=True, rank_dtype="bfloat16")
        rng = np.random.default_rng(11)
        db = rng.random((12, 32, 40, 3)).astype(np.float32)
        poses = rng.normal(size=(12, 6)).astype(np.float32)
        svc.build(db, poses, model_norm, batch=4)
        assert svc.db_desc.dtype == jnp.bfloat16
        out = svc.query(db[4:5], model_norm, jax.random.PRNGKey(0))
        assert out["pose"].shape == (1, 6)
        assert np.isfinite(np.asarray(out["pose"])).all()
        nbrs = np.asarray(out["neighbors"])
        assert (nbrs >= 0).all() and (nbrs < 12).all()
        # NOTE: no exact self-match assert here on purpose — random-NOISE
        # frames under an untrained encoder land within bf16 resolution
        # of each other (measured: the top-1 flips), which is precisely
        # the knob's documented caveat; the separable-scene overlap gate
        # below is the quality claim

    def test_rejects_unknown_dtype(self):
        with pytest.raises(ValueError, match="rank_dtype"):
            build_service(rank_dtype="float16")

    def test_similarity_error_bound_and_near_tie_hazard(self):
        """The knob's REAL quality contract, measured: a bf16 table (and
        bf16-cast query) perturbs cosine similarities by <~1e-4 absolute
        (measured on the synthetic scene: mean 3.0e-5, max 9.6e-5 over
        4096-dim VLAD descriptors), so rankings are preserved exactly
        WHEN the scene's top-k cosine gaps exceed that bound — the
        per-deployment gate.

        A neighbor-OVERLAP gate is unmeasurable on this rig and the test
        documents why: UNTRAINED NetVLAD descriptors of synthetic
        textures are degenerate near-ties (top-1 cosines 0.99999+, top-4
        gaps ~5e-6, i.e. 6x BELOW the bf16 error), so overlap collapses
        (measured 0.135 on the overlapping-crops scene and 0.167 on
        independent random fields) — a property of the degenerate
        descriptors, not evidence about trained-descriptor scenes, whose
        inter-place gaps are orders of magnitude wider.  The knob
        therefore defaults OFF and its docstring routes deployments to
        validate gaps on their own database."""
        from scipy.ndimage import gaussian_filter

        from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
        from relpose_gnn_tpu.retrieval.netvlad_index import (IMAGENET_MEAN,
                                                             IMAGENET_STD)

        rng = np.random.default_rng(5)
        field = gaussian_filter(rng.normal(size=(200, 270, 3)),
                                sigma=(7, 7, 0))
        field = (field - field.min()) / (field.max() - field.min())
        h, w, m = 96, 128, 24
        frames = np.stack([field[3 * i:3 * i + h, 4 * i:4 * i + w]
                           for i in range(m)]).astype(np.float32)
        hw = (48, 64)
        enc = NetVLADEncoder(num_clusters=8)
        x = jax.image.resize(jnp.asarray(frames), (m, *hw, 3), "bilinear")
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        v = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)))
        d = enc.apply(v, x)  # [M, Dv] f32, L2-normalized

        sim32 = np.asarray(d @ d.T, np.float64)
        simbf = np.asarray(jnp.einsum(
            "bd,md->bm", d.astype(jnp.bfloat16), d.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32), np.float64)
        err = np.abs(simbf - sim32)
        # the contract: bf16-table similarity error stays ~1e-4 absolute
        assert err.max() < 5e-4, err.max()

        # the hazard this scene exhibits: its own top-4 cosine gaps sit
        # BELOW that error bound (degenerate untrained descriptors), so
        # no bf16-table ranking can be trusted here
        np.fill_diagonal(sim32, -np.inf)
        g = np.sort(sim32, axis=1)
        top_gaps = g[:, -1] - g[:, -4]
        assert top_gaps.max() < 5e-4, top_gaps.max()

    def test_snapshot_cast_equals_fresh_bf16_build(self, tmp_path):
        """Loading an f32-built snapshot into a bf16-configured service
        must produce the SAME table a fresh bf16 build would (embed
        rounds the same f32 descriptor once — the load-cast contract in
        ServiceConfig.rank_dtype's docstring)."""
        rng = np.random.default_rng(13)
        db = rng.random((10, 32, 40, 3)).astype(np.float32)
        poses = rng.normal(size=(10, 6)).astype(np.float32)

        svc_f32 = build_service(rank_dtype="float32")
        svc_f32.build(db, poses, model_norm, batch=4)
        path = str(tmp_path / "db.npz")
        svc_f32.save_database(path)

        svc_bf16 = build_service(rank_dtype="bfloat16")
        svc_bf16.load_database(path)
        assert svc_bf16.db_desc.dtype == jnp.bfloat16

        fresh = build_service(rank_dtype="bfloat16")
        fresh.build(db, poses, model_norm, batch=4)
        np.testing.assert_array_equal(
            np.asarray(svc_bf16.db_desc.astype(jnp.float32)),
            np.asarray(fresh.db_desc.astype(jnp.float32)))


class TestCapacityGrowth:
    """Incremental database growth: ServiceConfig.capacity pre-allocates
    padded device arrays + a validity mask so add_frames() updates rows
    in place and the query program never recompiles (static shapes)."""

    def _db(self, n, seed=0):
        rng = np.random.default_rng(seed)
        return (rng.random((n, 32, 40, 3)).astype(np.float32),
                rng.normal(size=(n, 6)).astype(np.float32))

    def test_padding_is_invisible_deterministic(self):
        """With capacity, padded slots must never be retrieved: the
        deterministic query over a 10-frame DB padded to 16 equals the
        exact-size service bit for bit (the -inf mask ranks pads last
        and the valid ordering is unchanged)."""
        db, poses = self._db(10)
        q = db[3:6] * 0.97

        exact = build_service(deterministic=True)
        exact.build(db, poses, model_norm, batch=4)
        out_e = exact.query(q, model_norm)

        padded = build_service(deterministic=True, capacity=16)
        padded.build(db, poses, model_norm, batch=4)
        assert padded.db_desc.shape[0] == 16 and padded.db_count == 10
        out_p = padded.query(q, model_norm)

        np.testing.assert_array_equal(np.asarray(out_e["neighbors"]),
                                      np.asarray(out_p["neighbors"]))
        np.testing.assert_array_equal(np.asarray(out_e["pose"]),
                                      np.asarray(out_p["pose"]))

    def test_padding_stochastic_neighbors_stay_valid(self):
        db, poses = self._db(6, seed=3)
        svc = build_service(capacity=32, retrieval_candidates=None)
        svc.build(db, poses, model_norm, batch=4)
        q = np.random.default_rng(4).random((5, 32, 40, 3)).astype(
            np.float32)
        for seed in range(3):
            nbrs = np.asarray(svc.query(q, model_norm,
                                        jax.random.PRNGKey(seed))
                              ["neighbors"])
            assert (nbrs >= 0).all() and (nbrs < 6).all(), nbrs

    def test_add_frames_matches_fresh_build(self):
        """build(8) + add_frames(4) must behave like a fresh build(12):
        same chunking (batch=4) -> same embeddings -> identical
        deterministic retrieval, and the new frames ARE retrievable."""
        db, poses = self._db(12, seed=7)

        grown = build_service(deterministic=True, capacity=16)
        grown.build(db[:8], poses[:8], model_norm, batch=4)
        grown.add_frames(db[8:], poses[8:], model_norm, batch=4)
        assert grown.db_count == 12

        fresh = build_service(deterministic=True)
        fresh.build(db, poses, model_norm, batch=4)

        q = db[9:12] * 0.98  # nearest to the ADDED frames
        out_g = grown.query(q, model_norm)
        out_f = fresh.query(q, model_norm)
        np.testing.assert_array_equal(np.asarray(out_g["neighbors"]),
                                      np.asarray(out_f["neighbors"]))
        np.testing.assert_allclose(np.asarray(out_g["pose"]),
                                   np.asarray(out_f["pose"]),
                                   rtol=1e-5, atol=1e-5)
        # the added frames are actually retrieved (top-ranked neighbor of
        # a near-copy query is the frame itself)
        top = np.asarray(out_g["neighbors"])[:, 0]
        np.testing.assert_array_equal(top, [9, 10, 11])

    def test_capacity_errors(self):
        import pytest

        db, poses = self._db(6)
        no_cap = build_service()
        no_cap.build(db, poses, model_norm, batch=4)
        with pytest.raises(ValueError, match="capacity"):
            no_cap.add_frames(db[:1], poses[:1], model_norm)

        small = build_service(capacity=4)
        with pytest.raises(ValueError, match="capacity"):
            small.build(db, poses, model_norm, batch=4)

        cap = build_service(capacity=8)
        cap.build(db, poses, model_norm, batch=4)
        with pytest.raises(ValueError, match="capacity exceeded"):
            cap.add_frames(db[:3], poses[:3], model_norm)

    def test_pose_length_mismatch_fails_loudly(self):
        """len(poses) != len(images) must raise BEFORE any mutation: a
        short batch would mark valid slots whose poses were never
        written, and a LONG batch's donated dynamic_update_slice row
        write CLAMPS its start index and overwrites earlier live rows —
        both silent result corruption."""
        import pytest

        db, poses = self._db(8)
        svc = build_service(capacity=16)
        with pytest.raises(ValueError, match="poses shape"):
            svc.build(db, poses[:6], model_norm, batch=4)

        svc.build(db[:4], poses[:4], model_norm, batch=4)
        before = np.asarray(svc.db_poses).copy()
        for bad in (poses[4:5], poses[4:7]):  # short of / beyond 2 images
            with pytest.raises(ValueError, match="poses shape"):
                svc.add_frames(db[4:6], bad, model_norm, batch=4)
        # the failed adds mutated nothing (validated before _grow_rows)
        np.testing.assert_array_equal(np.asarray(svc.db_poses), before)
        assert svc.db_count == 4

    def test_invalidate_frames(self):
        """Tombstoned frames are never retrieved again, with or without
        capacity."""
        db, poses = self._db(10, seed=11)
        svc = build_service(deterministic=True)
        svc.build(db, poses, model_norm, batch=4)
        q = db[4:5]  # exact copy of frame 4 -> top neighbor is 4
        out = svc.query(q, model_norm)
        assert int(np.asarray(out["neighbors"])[0, 0]) == 4
        svc.invalidate_frames([4])
        out2 = svc.query(q, model_norm)
        nbrs2 = np.asarray(out2["neighbors"])
        assert 4 not in nbrs2[0].tolist()
        # stochastic path honors the tombstone too
        svc_s = build_service(capacity=16, retrieval_candidates=None)
        svc_s.build(db, poses, model_norm, batch=4)
        svc_s.invalidate_frames([0, 1, 2])
        for seed in range(3):
            nbrs = np.asarray(svc_s.query(
                q, model_norm, jax.random.PRNGKey(seed))["neighbors"])
            assert not set(nbrs[0].tolist()) & {0, 1, 2}
            assert (nbrs < 10).all()  # capacity padding still excluded

    def test_compact_database_reclaims_slots(self):
        """invalidate -> compact -> add: compaction keeps deterministic
        query results exact (neighbors renumbered through the returned
        old_to_new map, poses bitwise) and frees the tombstoned capacity
        for add_frames."""
        db, poses = self._db(12, seed=11)
        svc = build_service(deterministic=True, capacity=12)
        svc.build(db[:8], poses[:8], model_norm, batch=4)
        svc.invalidate_frames([1, 3, 4])
        q = db[5:8] * 0.98
        before = svc.query(q, model_norm)

        mapping = svc.compact_database()
        assert svc.db_count == 5
        np.testing.assert_array_equal(mapping[:8],
                                      [0, -1, 1, -1, -1, 2, 3, 4])
        after = svc.query(q, model_norm)
        np.testing.assert_array_equal(
            mapping[np.asarray(before["neighbors"])],
            np.asarray(after["neighbors"]))
        np.testing.assert_array_equal(np.asarray(before["pose"]),
                                      np.asarray(after["pose"]))

        # compacting an already-compact DB is a no-op (no device work)
        d_ref = svc.db_desc
        mapping2 = svc.compact_database()
        assert svc.db_desc is d_ref
        np.testing.assert_array_equal(mapping2[:5], np.arange(5))
        assert (mapping2[5:] == -1).all()

        # the 3 tombstoned slots are reclaimed: 12-capacity DB holding 5
        # live frames accepts 4 more (8 + 4 would have exceeded it)
        svc.add_frames(db[8:], poses[8:], model_norm, batch=4)
        assert svc.db_count == 9
        top = np.asarray(svc.query(db[9:12] * 0.98, model_norm)
                         ["neighbors"])[:, 0]
        np.testing.assert_array_equal(top, [6, 7, 8])

    @pytest.mark.parametrize("candidates", [None, 8])
    def test_compact_database_preserves_stochastic_selection(
            self, candidates):
        """Stochastic drop draws are keyed by rank position, not slot
        index, so compaction must not change which FRAMES any seed
        selects — only their slot numbers (via old_to_new).  Asserted
        directly on BOTH selection branches: the full-argsort path and
        the production windowed top-C path (candidates=8 < M=16 engages
        the window; ADVICE r3 #3)."""
        db, poses = self._db(10, seed=13)
        q = np.random.default_rng(14).random((4, 32, 40, 3)).astype(
            np.float32)
        svc = build_service(capacity=16, retrieval_candidates=candidates)
        svc.build(db, poses, model_norm, batch=4)
        svc.invalidate_frames([0, 2, 7])
        keys = [jax.random.PRNGKey(s) for s in range(3)]
        before = [svc.query(q, model_norm, k) for k in keys]
        mapping = svc.compact_database()
        assert svc.db_count == 7
        for k, b in zip(keys, before):
            a = svc.query(q, model_norm, k)
            np.testing.assert_array_equal(
                mapping[np.asarray(b["neighbors"])],
                np.asarray(a["neighbors"]))
            np.testing.assert_array_equal(np.asarray(b["pose"]),
                                          np.asarray(a["pose"]))

    def test_deterministic_never_selects_padding_when_valid_is_scarce(self):
        """With fewer valid frames than the strided window (small build
        into a large capacity, or heavy invalidation), the deterministic
        ranks must clamp to the last valid entry instead of walking into
        -inf-masked padding (review finding: padded slots were selected
        whenever n_valid < (k-1)*sp+1)."""
        db, poses = self._db(3, seed=5)
        svc = build_service(deterministic=True, capacity=16)
        svc.build(db, poses, model_norm, batch=4)  # k=3, sp=2 -> window 5
        q = db[0:2]
        nbrs = np.asarray(svc.query(q, model_norm)["neighbors"])
        assert (nbrs >= 0).all() and (nbrs < 3).all(), nbrs
        # same via invalidation: 10 frames, tombstone down to 2 valid
        db2, poses2 = self._db(10, seed=6)
        svc2 = build_service(deterministic=True)
        svc2.build(db2, poses2, model_norm, batch=4)
        svc2.invalidate_frames(list(range(2, 10)))
        nbrs2 = np.asarray(svc2.query(q, model_norm)["neighbors"])
        assert set(np.unique(nbrs2)) <= {0, 1}, nbrs2

    def test_add_frames_rejects_different_model_norm(self):
        import pytest

        db, poses = self._db(6)
        svc = build_service(capacity=8)
        svc.build(db, poses, model_norm, batch=4)
        with pytest.raises(ValueError, match="model_norm"):
            svc.add_frames(db[:1], poses[:1], lambda x: x)

    def test_invalidate_frames_rejects_out_of_range(self):
        import pytest

        db, poses = self._db(6)
        svc = build_service()
        svc.build(db, poses, model_norm, batch=4)
        with pytest.raises(ValueError, match="out of range"):
            svc.invalidate_frames([6])
        with pytest.raises(ValueError, match="out of range"):
            svc.invalidate_frames([-1])


class TestDatabasePersistence:
    def _db(self, n, seed=0):
        rng = np.random.default_rng(seed)
        return (rng.random((n, 32, 40, 3)).astype(np.float32),
                rng.normal(size=(n, 6)).astype(np.float32))

    def test_save_load_roundtrip_bitwise(self, tmp_path):
        """A restored database serves bit-identical results to the one
        that built it (bf16 arrays widen to f32 on disk and cast back —
        exact), without re-embedding anything."""
        db, poses = self._db(10, seed=1)
        q = db[2:5] * 0.99
        src = build_service(deterministic=True)
        src.build(db, poses, model_norm, batch=4)
        out_src = src.query(q, model_norm)
        path = str(tmp_path / "db.npz")
        src.save_database(path)

        dst = build_service(deterministic=True)
        dst.load_database(path)
        assert dst.db_count == 10 and dst._embed is None
        out_dst = dst.query(q, model_norm)
        np.testing.assert_array_equal(np.asarray(out_src["pose"]),
                                      np.asarray(out_dst["pose"]))
        np.testing.assert_array_equal(np.asarray(out_src["neighbors"]),
                                      np.asarray(out_dst["neighbors"]))

    def test_load_then_add_frames(self, tmp_path):
        """add_frames works on a restored database: the embed program is
        created lazily from the call's model_norm."""
        db, poses = self._db(12, seed=2)
        src = build_service(deterministic=True, capacity=16)
        src.build(db[:8], poses[:8], model_norm, batch=4)
        path = str(tmp_path / "db.npz")
        src.save_database(path)

        dst = build_service(deterministic=True, capacity=16)
        dst.load_database(path)
        dst.add_frames(db[8:], poses[8:], model_norm, batch=4)
        assert dst.db_count == 12
        q = db[9:10] * 0.98
        top = int(np.asarray(dst.query(q, model_norm)["neighbors"])[0, 0])
        assert top == 9

    def test_load_rejects_mismatched_capacity(self, tmp_path):
        import pytest

        db, poses = self._db(6, seed=3)
        src = build_service(capacity=8)
        src.build(db, poses, model_norm, batch=4)
        path = str(tmp_path / "db.npz")
        src.save_database(path)
        dst = build_service(capacity=12)
        with pytest.raises(ValueError, match="capacity"):
            dst.load_database(path)

    def test_load_rejects_mismatched_retrieval_hw(self, tmp_path):
        """Descriptors are a function of the NetVLAD input size: a
        snapshot built at one retrieval_hw served to queries embedded at
        another would silently rank garbage similarities — load must
        fail loudly."""
        import pytest

        db, poses = self._db(6, seed=5)
        src = build_service()
        src.build(db, poses, model_norm, batch=4)
        path = str(tmp_path / "db.npz")
        src.save_database(path)
        dst = build_service(retrieval_hw=(24, 32))
        with pytest.raises(ValueError, match="retrieval_hw"):
            dst.load_database(path)

    def test_save_load_roundtrip_bfloat16_arrays(self, tmp_path):
        """The bf16 widen-to-f32-on-disk branch restores dtype AND bits.
        (Production db arrays are f32 — encode_nodes casts embeddings up,
        NetVLAD casts descriptors up — so this branch is exercised with a
        synthetic bf16 table; it exists for future bf16-resident
        databases.)"""
        db, poses = self._db(8, seed=4)
        src = build_service(deterministic=True)
        src.build(db, poses, model_norm, batch=4)
        src.db_emb = src.db_emb.astype(jnp.bfloat16)  # synthetic bf16
        path = str(tmp_path / "db.npz")
        src.save_database(path)
        dst = build_service(deterministic=True)
        dst.load_database(path)
        assert dst.db_emb.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(src.db_emb.astype(jnp.float32)),
            np.asarray(dst.db_emb.astype(jnp.float32)))


class TestSnapshotBindingGuards:
    """ADVICE r4 #1/#2/#3: snapshots bind to the model weights +
    embed resolution, the loader type is validated, and query_compiles
    no longer rides a private jit API."""

    def _built(self, m=8, seed=7, **kw):
        rng = np.random.default_rng(seed)
        db = rng.random((m, 32, 40, 3)).astype(np.float32)
        poses = rng.normal(size=(m, 6)).astype(np.float32)
        svc = build_service(deterministic=True, **kw)
        svc.build(db, poses, model_norm, batch=4)
        return svc, db, poses

    def test_load_rejects_different_weights(self, tmp_path):
        """A snapshot's db_emb (and shared-trunk desc) are functions of
        the model WEIGHTS: loading it under perturbed weights must fail
        loudly instead of silently ranking garbage."""
        svc, _, _ = self._built()
        path = str(tmp_path / "db.npz")
        svc.save_database(path)
        dst = build_service(deterministic=True)
        dst.model_vars = jax.tree.map(lambda x: x * 1.5 + 0.01,
                                      dst.model_vars)
        with pytest.raises(ValueError, match="WEIGHTS"):
            dst.load_database(path)

    def test_load_rejects_different_structure(self, tmp_path):
        """Different parameter structure (here: a bf16-cast variables
        tree, i.e. a different model config) fails on the exact
        structure hash before the value checksum."""
        svc, _, _ = self._built()
        path = str(tmp_path / "db.npz")
        svc.save_database(path)
        dst = build_service(deterministic=True)
        dst.model_vars = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), dst.model_vars)
        with pytest.raises(ValueError, match="parameter structure"):
            dst.load_database(path)

    def test_load_accepts_prefingerprint_snapshot(self, tmp_path):
        """Round-4 snapshots carry no fingerprint keys — they must keep
        loading (their retrieval/hw guards still apply)."""
        svc, db, _ = self._built()
        path = str(tmp_path / "db.npz")
        svc.save_database(path)
        z = dict(np.load(path))
        for k in ("model_struct", "model_checksum", "built_hw"):
            z.pop(k)
        old = str(tmp_path / "old.npz")
        np.savez(old, **z)
        dst = build_service(deterministic=True)
        dst.load_database(old)
        out = dst.query(db[2:4], model_norm)
        assert np.isfinite(np.asarray(out["pose"])).all()

    def test_query_rejects_mismatched_resolution(self):
        """Backbone embeddings are resolution-dependent: a query at a
        different H,W than the database was embedded at would silently
        produce garbage similarities."""
        svc, _, _ = self._built()
        q = np.random.default_rng(0).random((2, 16, 20, 3)).astype(
            np.float32)
        with pytest.raises(ValueError, match="embedded at"):
            svc.query(q, model_norm)

    def test_add_frames_rejects_mismatched_resolution(self):
        svc, _, _ = self._built(capacity=16)
        rng = np.random.default_rng(1)
        imgs = rng.random((2, 16, 20, 3)).astype(np.float32)
        poses = rng.normal(size=(2, 6)).astype(np.float32)
        with pytest.raises(ValueError, match="embedded at"):
            svc.add_frames(imgs, poses, model_norm, batch=2)

    def test_load_rejects_multiscene_snapshot(self, tmp_path):
        """Symmetric fail-loud contract to the multiscene loader's
        'no scenes key' diagnostic (was a bare KeyError)."""
        path = str(tmp_path / "ms.npz")
        np.savez(path, scenes=np.asarray(["a"]))
        svc = build_service()
        with pytest.raises(ValueError, match="MultiSceneService"):
            svc.load_database(path)

    def test_load_rejects_foreign_npz(self, tmp_path):
        path = str(tmp_path / "junk.npz")
        np.savez(path, foo=np.zeros(3))
        svc = build_service()
        with pytest.raises(ValueError, match="not a Relocalization"):
            svc.load_database(path)

    def test_query_compiles_counts_without_private_api(self):
        """query_compiles is an explicit trace-time counter; while the
        private jit _cache_size API still exists the two must agree."""
        svc, db, _ = self._built()
        svc.query(db[:2], model_norm)
        svc.query(db[2:4], model_norm)  # same shape: no new trace
        assert svc.query_compiles() == 1
        cache_size = getattr(svc._query_fn, "_cache_size", None)
        if cache_size is not None:
            assert cache_size() == svc.query_compiles()
        svc.query(db[:3], model_norm)  # new batch shape: one new trace
        assert svc.query_compiles() == 2
