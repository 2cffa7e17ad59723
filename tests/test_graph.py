"""Tests for dense graph ops: edge tables, kNN adjacency, aggregation."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops import graph


class TestEdgeTables:
    def test_fc_edge_count(self):
        e = graph.fc_edge_index(8)
        assert e.shape == (2, 56)  # 28 undirected pairs, both directions

    def test_fc_covers_all_pairs(self):
        # reference left a commented-out cross-check vs itertools.combinations
        # (dataset_7Scenes_multi.py:386-392); we make it a real assertion.
        n = 8
        e = graph.fc_edge_index(n)
        pairs = set(map(tuple, e.T.tolist()))
        want = set()
        for i, j in itertools.combinations(range(n), 2):
            want.add((i, j))
            want.add((j, i))
        assert pairs == want

    def test_fc_first_half_order(self):
        # grouped by separation: (0,1),(1,2)... then (0,2),(1,3)...
        e = graph.fc_edge_index(4, bidirectional=False)
        want = np.array([[0, 1, 2, 0, 1, 0],
                         [1, 2, 3, 2, 3, 3]])
        np.testing.assert_array_equal(e, want)

    def test_rnn_circ_dilated_ho(self):
        np.testing.assert_array_equal(graph.rnn_edge_index(4),
                                      [[0, 1, 2], [1, 2, 3]])
        np.testing.assert_array_equal(graph.circ_edge_index(4),
                                      [[0, 1, 2, 3], [1, 2, 3, 0]])
        np.testing.assert_array_equal(graph.dilated_edge_index(4, 2),
                                      [[0, 1, 2, 3], [2, 3, 0, 1]])
        np.testing.assert_array_equal(graph.ho_edge_index(4, 2),
                                      [[0, 1, 2, 0, 1], [1, 2, 3, 2, 3]])

    def test_build_edge_index_ind_none(self):
        assert graph.build_edge_index("ind", 8) is None

    def test_adjacency_roundtrip(self):
        e = graph.fc_edge_index(8)
        adj = graph.edge_index_to_adj(e, 8)
        np.testing.assert_array_equal(adj, graph.fc_adjacency(8))


class TestPairwiseAndKnn:
    def test_pairwise_dists_match_numpy(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 8, 16)).astype(np.float32)
        got = np.asarray(graph.pairwise_sq_dists(jnp.asarray(x)))
        want = np.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
        # matmul-form distances lose a few ulps to cancellation in f32
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_knn_adjacency_matches_bruteforce(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(8, 16)).astype(np.float32)
        k = 4
        adj = np.asarray(graph.knn_adjacency(jnp.asarray(x), k))
        d = np.sum((x[:, None] - x[None]) ** 2, axis=-1)
        np.fill_diagonal(d, np.inf)
        for t in range(8):
            nbrs = np.argsort(d[:, t])[:k]
            want_col = np.zeros(8, dtype=bool)
            want_col[nbrs] = True
            np.testing.assert_array_equal(adj[:, t], want_col)

    def test_knn_each_node_has_k_incoming(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 8, 32)).astype(np.float32)
        adj = np.asarray(graph.knn_adjacency(jnp.asarray(x), 4))
        assert adj.shape == (2, 8, 8)
        np.testing.assert_array_equal(adj.sum(axis=1), 4)  # incoming per t
        assert not np.any(np.diagonal(adj, axis1=1, axis2=2))  # no loops

    def test_nearest_neighbor(self):
        x = np.array([[0.0, 0], [10, 0], [0.5, 0], [5, 5]], dtype=np.float32)
        nn = int(graph.nearest_neighbor(jnp.asarray(x), node=0))
        assert nn == 2
        # batched
        xb = jnp.stack([jnp.asarray(x), jnp.asarray(x[::-1].copy())])
        nnb = np.asarray(graph.nearest_neighbor(xb, node=0))
        assert nnb.shape == (2,)


class TestDenseGraphOps:
    def test_relative_pose_targets_matches_loop(self):
        rng = np.random.default_rng(3)
        p = rng.normal(size=(8, 6)).astype(np.float32)
        rp = np.asarray(graph.relative_pose_targets(jnp.asarray(p)))
        e = graph.fc_edge_index(8)
        for s, t in e.T:
            np.testing.assert_allclose(rp[s, t], p[s] - p[t], atol=1e-6)

    def test_edge_pair_features_min_max_convention(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(5, 7)).astype(np.float32)
        ef = np.asarray(graph.edge_pair_features(jnp.asarray(x)))
        for s in range(5):
            for t in range(5):
                lo, hi = min(s, t), max(s, t)
                np.testing.assert_allclose(ef[s, t],
                                           np.concatenate([x[lo], x[hi]]),
                                           atol=1e-6)

    def test_masked_mean_matches_scatter_mean(self):
        rng = np.random.default_rng(5)
        n, d = 6, 4
        msg = rng.normal(size=(n, n, d)).astype(np.float32)
        adj = rng.random((n, n)) < 0.4
        np.fill_diagonal(adj, False)
        got = np.asarray(graph.masked_mean_aggregate(jnp.asarray(msg),
                                                     jnp.asarray(adj)))
        for t in range(n):
            srcs = np.where(adj[:, t])[0]
            want = msg[srcs, t].mean(axis=0) if len(srcs) else np.zeros(d)
            np.testing.assert_allclose(got[t], want, atol=1e-5)

    def test_edge_dropout_symmetric(self):
        rng = jax.random.PRNGKey(0)
        m = np.asarray(graph.edge_dropout_mask(rng, 8, 0.5, (4,)))
        assert m.shape == (4, 8, 8)
        np.testing.assert_array_equal(m, np.swapaxes(m, -1, -2))
        assert not np.any(np.diagonal(m, axis1=1, axis2=2))

    def test_edge_dropout_rate(self):
        rng = jax.random.PRNGKey(1)
        m = np.asarray(graph.edge_dropout_mask(rng, 8, 0.5, (512,)))
        upper = np.triu(np.ones((8, 8), dtype=bool), 1)
        rate = m[:, upper].mean()
        assert 0.45 < rate < 0.55

    def test_ensure_nonempty(self):
        m = jnp.zeros((2, 4, 4), dtype=bool)
        m = m.at[1, 0, 1].set(True)
        out = np.asarray(graph.ensure_nonempty(m))
        assert out[0].all()         # fully-dropped graph restored
        assert out[1].sum() == 1    # untouched


class TestFirstEdgeAnchor:
    def test_fc_anchor_is_node_1(self):
        """With the fc construction order, the first edge into node 0 is
        1 -> 0 (the flipped copies are ordered by separation), NOT the
        feature-space nearest neighbor (testing/test.py:227-229)."""
        for n in (4, 8, 16):
            ei = graph.fc_edge_index(n)
            assert graph.first_edge_anchor(ei) == 1

    def test_rnn_anchor(self):
        # chain edges (i, i+1) + flipped: first edge into 0 is 1 -> 0
        ei = graph.build_edge_index("rnn", 6)
        assert graph.first_edge_anchor(ei) == 1

    def test_no_edges_raises(self):
        import pytest
        ei = np.array([[1, 2], [2, 1]])
        with pytest.raises(ValueError):
            graph.first_edge_anchor(ei, ref_node=0)

    def test_ref_node_is_ordinal_into_node_0(self):
        """test.py:229: argwhere(edges[1]==0)[ref_node] — ref_node picks
        WHICH edge into node 0, it is not a target-node id."""
        ei = graph.fc_edge_index(5)
        into0 = ei[0, np.flatnonzero(ei[1] == 0)]
        for k in range(len(into0)):
            assert graph.first_edge_anchor(ei, ref_node=k) == into0[k]
        import pytest
        with pytest.raises(ValueError):
            graph.first_edge_anchor(ei, ref_node=len(into0))
