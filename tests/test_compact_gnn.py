"""Compact edge-list GNN path: exactness vs the dense N x N grid.

The per-pair chain (edge update -> message -> attention -> rel head) is
pointwise in the pair and aggregation is a mean over the same edge sets,
so the compact path (models/gnn.py DenseEdgeGNN edges=...) must agree
with the dense grid at every real edge to float-reassociation noise.
"""

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.gnn import DenseEdgeGNN
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


class TestEdgeListOps:
    def test_knn_edge_list_matches_adjacency(self):
        x = _rand(jax.random.PRNGKey(0), 3, 8, 32)
        k = 4
        adj_ref = np.asarray(graph.knn_adjacency(x, k))
        adj, src, tgt = map(np.asarray, graph.knn_edge_list(x, k))
        np.testing.assert_array_equal(adj, adj_ref)
        assert src.shape == tgt.shape == (3, 8 * k)
        rebuilt = np.zeros_like(adj_ref)
        for b in range(3):
            rebuilt[b][src[b], tgt[b]] = True
        np.testing.assert_array_equal(rebuilt, adj_ref)
        # per-target groups of k, nearest first (anchor = slot 0 of tgt 0)
        np.testing.assert_array_equal(tgt[0], np.repeat(np.arange(8), k))
        d = np.array(graph.pairwise_sq_dists(x))[0]
        np.fill_diagonal(d, np.inf)
        assert src[0, 0] == np.argmin(d[:, 0])

    def test_adj_edge_list_roundtrip(self):
        rng = np.random.default_rng(3)
        adj = rng.random((4, 8, 8)) < 0.4
        adj &= ~np.eye(8, dtype=bool)
        src, tgt, emask = map(np.asarray,
                              graph.adj_edge_list(jnp.asarray(adj)))
        assert src.shape == (4, 56)
        for b in range(4):
            got = set(zip(src[b][emask[b]].tolist(),
                          tgt[b][emask[b]].tolist()))
            want = set(zip(*np.nonzero(adj[b])))
            assert got == want
            assert emask[b].sum() == adj[b].sum()

    def test_edge_pair_features_compact_matches_dense(self):
        x = _rand(jax.random.PRNGKey(1), 2, 8, 16)
        adj = jnp.asarray(graph.fc_adjacency(8))[None].repeat(2, 0)
        src, tgt, emask = graph.adj_edge_list(adj)
        dense = np.asarray(graph.edge_pair_features(x))
        comp = np.asarray(graph.edge_pair_features_compact(x, src, tgt))
        s, t = np.asarray(src), np.asarray(tgt)
        for b in range(2):
            np.testing.assert_array_equal(comp[b], dense[b][s[b], t[b]])

    def test_compact_mean_aggregate_matches_masked(self):
        key = jax.random.PRNGKey(2)
        x = _rand(key, 2, 8, 8)  # unused, just for adj
        adj = graph.knn_adjacency(x, 3)
        src, tgt, emask = graph.adj_edge_list(adj)
        msg_dense = _rand(jax.random.PRNGKey(3), 2, 8, 8, 5)
        # compact messages gathered from the dense grid
        flat = msg_dense.reshape(2, 64, 5)
        idx = (src * 8 + tgt)[..., None]
        msg_c = jnp.take_along_axis(flat, idx, axis=1)
        want = np.asarray(graph.masked_mean_aggregate(msg_dense, adj))
        got = np.asarray(graph.compact_mean_aggregate(msg_c, tgt, emask, 8))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_scatter_edge_values(self):
        adj = jnp.asarray(graph.fc_adjacency(4))[None]
        src, tgt, emask = graph.adj_edge_list(adj)
        vals = _rand(jax.random.PRNGKey(4), 1, 12, 3)
        dense = np.asarray(graph.scatter_edge_values(vals, src, tgt,
                                                     emask, 4))
        s, t, v = np.asarray(src)[0], np.asarray(tgt)[0], np.asarray(vals)[0]
        for i in range(12):
            np.testing.assert_allclose(dense[0, s[i], t[i]], v[i])
        # diagonal (non-edges) is zero
        for j in range(4):
            np.testing.assert_array_equal(dense[0, j, j], 0.0)


class TestCompactLayer:
    def test_layer_matches_dense(self):
        key = jax.random.PRNGKey(5)
        kx, ke, kp = jax.random.split(key, 3)
        b, n, d, de = 2, 8, 32, 24
        x = _rand(kx, b, n, d)
        adj = graph.knn_adjacency(x, 4)
        src, tgt, emask = graph.adj_edge_list(adj)
        e_dense = _rand(ke, b, n, n, de)
        idx = (src * n + tgt)[..., None]
        e_c = jnp.take_along_axis(e_dense.reshape(b, n * n, de), idx, axis=1)

        layer = DenseEdgeGNN(node_dim=d, edge_dim=de, out_dim=d)
        params = layer.init(kp, x, e_dense, adj)
        x_d, e_d = layer.apply(params, x, e_dense, adj)
        x_cc, e_cc = layer.apply(params, x, e_c, adj,
                                 edges=(src, tgt, emask))
        np.testing.assert_allclose(np.asarray(x_cc), np.asarray(x_d),
                                   rtol=2e-5, atol=2e-5)
        # compact edge outputs match the dense grid at the listed edges
        e_d_flat = np.asarray(e_d).reshape(b, n * n, -1)
        e_d_at = np.take_along_axis(e_d_flat, np.asarray(idx), axis=1)
        np.testing.assert_allclose(np.asarray(e_cc), e_d_at,
                                   rtol=2e-5, atol=2e-5)


def _small_cfg(**over):
    base = dict(num_nodes=6, feat_dim=32, edge_dim=32, node_dim=32,
                backbone="resnet18", droprate=0.0, knn=3,
                gnn_recursion=2, num_gnn_layers=1)
    base.update(over)
    return RelPoseGNNConfig(**base)


class TestCompactModel:
    def _run(self, cfg_kw_dense, cfg_kw_comp, adj, x):
        m_dense = RelPoseGNN(_small_cfg(**cfg_kw_dense))
        m_comp = RelPoseGNN(_small_cfg(**cfg_kw_comp))
        v = m_dense.init(jax.random.PRNGKey(7), jnp.zeros(
            (1, 6, 32, 32, 3)), adj[:1], method=RelPoseGNN.__call__)
        out_d = m_dense.apply(v, x, adj, train=False,
                              method=RelPoseGNN.from_embeddings)
        out_c = m_comp.apply(v, x, adj, train=False,
                             method=RelPoseGNN.from_embeddings)
        return out_d, out_c

    def test_model_matches_dense_knn(self):
        x = _rand(jax.random.PRNGKey(8), 3, 6, 32)
        adj = jnp.zeros((3, 6, 6), bool)  # overridden by knn>0
        (pa_d, pr_d, adj_d, aux_d), (pa_c, pr_c, adj_c, aux_c) = self._run(
            dict(compact_edges=False), dict(compact_edges=True), adj, x)
        np.testing.assert_array_equal(np.asarray(adj_c), np.asarray(adj_d))
        np.testing.assert_allclose(np.asarray(pa_c), np.asarray(pa_d),
                                   rtol=2e-5, atol=2e-5)
        m = np.asarray(adj_d)[..., None]
        np.testing.assert_allclose(np.asarray(pr_c) * m,
                                   np.asarray(pr_d) * m,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(aux_c["node_feats"]),
                                   np.asarray(aux_d["node_feats"]))

    def test_model_matches_dense_static_fc(self):
        x = _rand(jax.random.PRNGKey(9), 2, 6, 32)
        adj = jnp.asarray(graph.fc_adjacency(6))[None].repeat(2, 0)
        (pa_d, pr_d, _, _), (pa_c, pr_c, _, _) = self._run(
            dict(compact_edges=False, knn=0),
            dict(compact_edges=True, knn=0), adj, x)
        np.testing.assert_allclose(np.asarray(pa_c), np.asarray(pa_d),
                                   rtol=2e-5, atol=2e-5)
        m = np.asarray(adj)[..., None]
        np.testing.assert_allclose(np.asarray(pr_c) * m,
                                   np.asarray(pr_d) * m,
                                   rtol=2e-5, atol=2e-5)

    def test_gradients_match_dense(self):
        """Masked-edge + node losses: grads must agree between modes."""
        x = _rand(jax.random.PRNGKey(10), 2, 6, 32)
        adj = jnp.zeros((2, 6, 6), bool)
        m_dense = RelPoseGNN(_small_cfg(compact_edges=False))
        m_comp = RelPoseGNN(_small_cfg(compact_edges=True))
        v = m_dense.init(jax.random.PRNGKey(11), jnp.zeros(
            (1, 6, 32, 32, 3)), adj[:1], method=RelPoseGNN.__call__)

        def loss(params, model):
            vv = {**v, "params": params}
            pa, pr, a, _ = model.apply(vv, x, adj, train=False,
                                       method=RelPoseGNN.from_embeddings)
            m = a.astype(jnp.float32)[..., None]
            return jnp.sum(pa ** 2) + jnp.sum((pr * m) ** 2)

        from jax.flatten_util import ravel_pytree
        g_d = jax.grad(loss)(v["params"], m_dense)
        g_c = jax.grad(loss)(v["params"], m_comp)
        flat_d, _ = ravel_pytree(g_d)
        flat_c, _ = ravel_pytree(g_c)
        np.testing.assert_allclose(np.asarray(flat_c), np.asarray(flat_d),
                                   rtol=5e-4, atol=5e-5)
