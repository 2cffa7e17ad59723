"""Tests for ablation GNN variants + sequence exports + visualization."""

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp

from test_data import write_7scenes_fixture

from relpose_gnn_tpu.data import sequences
from relpose_gnn_tpu.models.gnn import (ConvMapGNN, DenseConv,
                                        DenseEdgeGNNGated,
                                        EdgeConvRotDense, cosine_gate)
from relpose_gnn_tpu.utils.visualize import plot_trajectories


class TestEdgeConvRotDense:
    def test_aggregates_at_source(self):
        n, d = 4, 8
        layer = EdgeConvRotDense(node_dim=d, edge_dim=d, out_dim=d)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(n, d)).astype(np.float32)
        e = rng.normal(size=(n, n, d)).astype(np.float32)
        adj = np.zeros((n, n), bool)
        adj[0, 1] = adj[0, 2] = True  # source 0 -> targets 1, 2
        v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(e), jnp.asarray(adj))
        aggr, msg = layer.apply(v, jnp.asarray(x), jnp.asarray(e),
                                jnp.asarray(adj))
        aggr, msg = np.asarray(aggr), np.asarray(msg)
        np.testing.assert_allclose(aggr[0], (msg[0, 1] + msg[0, 2]) / 2,
                                   atol=1e-5)
        np.testing.assert_allclose(aggr[1], 0, atol=1e-6)  # no out-edges

    def test_narrow_features_use_mlp0(self):
        layer = EdgeConvRotDense(node_dim=3, edge_dim=6, out_dim=6)
        x = jnp.ones((4, 3))  # <= 5 dims -> pose-only path
        e = jnp.ones((4, 4, 6))
        adj = jnp.ones((4, 4), bool)
        v = layer.init(jax.random.PRNGKey(0), x, e, adj)
        assert "mlp0" in v["params"] and "mlp" not in v["params"]


class TestConvMapGNN:
    def test_shapes_and_sum_aggregation(self):
        b, n, h, w, c = 1, 3, 4, 4, 8
        layer = ConvMapGNN(channels=c)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)
        e = jnp.asarray(rng.normal(size=(b, n, n, h, w, c)), jnp.float32)
        adj = jnp.asarray(np.ones((b, n, n), bool)
                          & ~np.eye(n, dtype=bool)[None])
        v = layer.init(jax.random.PRNGKey(0), x, e, adj, train=False)
        x2, e2 = layer.apply(v, x, e, adj, train=False)
        assert x2.shape == (b, n, h, w, c)
        assert e2.shape == (b, n, n, h, w, c)

    def test_attention_gate_changes_output(self):
        b, n, h, w, c = 1, 3, 4, 4, 8
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(b, n, h, w, c)), jnp.float32)
        e = jnp.asarray(rng.normal(size=(b, n, n, h, w, c)), jnp.float32)
        adj = jnp.ones((b, n, n), bool)
        l0 = ConvMapGNN(channels=c, use_attention=False)
        l1 = ConvMapGNN(channels=c, use_attention=True)
        v = l0.init(jax.random.PRNGKey(0), x, e, adj, train=False)
        o0 = l0.apply(v, x, e, adj, train=False)[0]
        o1 = l1.apply(v, x, e, adj, train=False)[0]
        assert not np.allclose(np.asarray(o0), np.asarray(o1))

    def test_cosine_gate_range(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
        g = np.asarray(cosine_gate(a, a))
        # cos=1 -> sigmoid(1) ~ 0.731
        np.testing.assert_allclose(g, 1 / (1 + np.exp(-1)), atol=1e-5)


class TestDenseVariants:
    def test_gated_layer_runs(self):
        layer = DenseEdgeGNNGated(node_dim=8, edge_dim=8, out_dim=8)
        x = jnp.ones((2, 4, 8))
        e = jnp.ones((2, 4, 4, 8))
        adj = jnp.ones((2, 4, 4), bool)
        v = layer.init(jax.random.PRNGKey(0), x, e, adj)
        xn, en = layer.apply(v, x, e, adj)
        assert xn.shape == (2, 4, 8) and en.shape == (2, 4, 4, 8)

    def test_dense_conv_runs(self):
        layer = DenseConv(out_dim=8)
        x = jnp.ones((2, 4, 8))
        adj = jnp.ones((2, 4, 4), bool)
        v = layer.init(jax.random.PRNGKey(0), x, adj)
        out = layer.apply(v, x, adj)
        assert out.shape == (2, 4, 8)


class TestSequenceExports:
    def test_tum_exports(self, tmp_path):
        write_7scenes_fixture(str(tmp_path), scene="chess", n_seqs=1,
                              n_frames=3)
        out = sequences.scenes_to_sequences(str(tmp_path / "chess"),
                                            str(tmp_path / "out"))
        d = str(tmp_path / "out/seq-01")
        for name in ("rgb.txt", "depth.txt", "groundtruth.txt"):
            assert osp.isfile(osp.join(d, name)), name
        gt = np.loadtxt(osp.join(d, "groundtruth.txt"))
        assert gt.shape == (3, 8)
        # quaternion column must be unit norm
        np.testing.assert_allclose(np.linalg.norm(gt[:, 4:], axis=1), 1.0,
                                   atol=1e-5)
        del out


class TestVisualize:
    def test_plot_saves_file(self, tmp_path):
        rng = np.random.default_rng(4)
        p = rng.normal(size=(50, 7))
        t = rng.normal(size=(50, 7))
        out = plot_trajectories(p, t, str(tmp_path / "traj.png"))
        assert osp.isfile(out)
        out2 = plot_trajectories(p, t, str(tmp_path / "traj2d.png"),
                                 three_d=False)
        assert osp.isfile(out2)


class TestPairEncoder:
    def test_posenetx3_equivalent_runs(self):
        from relpose_gnn_tpu.models.pair_encoder import RelPoseGNNPairEncoder
        m = RelPoseGNNPairEncoder(feat_dim=16, edge_dim=16, droprate=0.0,
                                  stage_sizes=(1, 1, 1, 1))
        img = jnp.ones((1, 3, 32, 32, 3))
        adj = jnp.ones((1, 3, 3), bool)
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 3, 6) and pr.shape == (1, 3, 3, 6)
        # two untied gnn layers + two backbones present
        names = set(v["params"].keys())
        assert {"encoder", "edge_encoder", "gnn1", "gnn2"} <= names
        # edge backbone conv1 takes 6 channels
        assert v["params"]["edge_encoder"]["conv1"]["kernel"].shape[2] == 6

    def test_no_update_layer_aggregates_messages(self):
        from relpose_gnn_tpu.models.gnn import DenseEdgeGNNNoUpdate
        layer = DenseEdgeGNNNoUpdate(node_dim=8, edge_dim=8, out_dim=8)
        x = jnp.ones((2, 4, 8))
        e = jnp.ones((2, 4, 4, 8))
        adj = jnp.ones((2, 4, 4), bool)
        v = layer.init(jax.random.PRNGKey(0), x, e, adj)
        xn, en = layer.apply(v, x, e, adj)
        assert xn.shape == (2, 4, 8) and en.shape == (2, 4, 4, 8)
        assert "upd_mlp" not in v["params"]


class TestDenseEdgeGNNSplit:
    def test_matches_numpy_oracle(self):
        """simpleConvEdge2 semantics (my_gnn_layer.py:355-391): split-head
        message concat(mlp1, mlp2) on [x_target, x_source, e'], mean
        aggregation, no update MLP; node out dim 2*out."""
        from relpose_gnn_tpu.models.gnn import DenseEdgeGNNSplit

        n, d = 5, 8
        layer = DenseEdgeGNNSplit(node_dim=d, edge_dim=d, out_dim=d)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(n, d)).astype(np.float32)
        e = rng.normal(size=(n, n, d)).astype(np.float32)
        adj = rng.random((n, n)) < 0.5
        np.fill_diagonal(adj, False)
        v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(e), jnp.asarray(adj))
        got_x, got_e = layer.apply(v, jnp.asarray(x), jnp.asarray(e),
                                   jnp.asarray(adj))
        assert got_x.shape == (n, 2 * d)

        def mlp2(p, vv):
            h = np.maximum(vv @ p["fc1"]["kernel"] + p["fc1"]["bias"], 0)
            return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]

        p = jax.tree.map(np.asarray, v["params"])
        want_x = np.zeros((n, 2 * d))
        for t in range(n):
            srcs = np.where(adj[:, t])[0]
            if not len(srcs):
                continue
            msgs = []
            for s in srcs:
                e_new = mlp2(p["edge_mlp"],
                             np.concatenate([x[s], x[t], e[s, t]]))
                m_in = np.concatenate([x[t], x[s], e_new])
                msgs.append(np.concatenate([mlp2(p["mlp1"], m_in),
                                            mlp2(p["mlp2"], m_in)]))
            want_x[t] = np.mean(msgs, axis=0)
        np.testing.assert_allclose(np.asarray(got_x), want_x, atol=1e-4)


class TestEdgeModelAtt:
    def test_equals_mlp_then_attention(self):
        """simpleEdgeModelAtt (my_gnn_layer.py:203-221): edge MLP followed
        by the (true-math) AttentionBlock."""
        from relpose_gnn_tpu.models.gnn import EdgeModelAtt, MLP2
        from relpose_gnn_tpu.models.attention import AttentionBlock

        n, d = 4, 16
        m = EdgeModelAtt(node_dim=d, edge_dim=d, out_dim=d)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        e = jnp.asarray(rng.normal(size=(n, n, d)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x, e)
        out = m.apply(v, x, e)
        assert out.shape == (n, n, d)

        # compose the pieces with the same params
        xs = jnp.broadcast_to(x[:, None, :], (n, n, d))
        xt = jnp.broadcast_to(x[None, :, :], (n, n, d))
        mid = MLP2(d, d).apply({"params": v["params"]["edge_mlp"]},
                               jnp.concatenate([xs, xt, e], axis=-1))
        want = AttentionBlock(d).apply({"params": v["params"]["att"]}, mid)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=1e-5)


class TestPairMLP2Equivalence:
    def test_split_weight_equals_concat_form(self):
        """PairMLP2 computes the SAME function as MLP2 on the concatenated
        pair input — identical parameter trees, summation order the only
        difference (f32 + highest precision: ~1e-6)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from relpose_gnn_tpu.models.gnn import MLP2, PairMLP2

        b, n, d, de, hid, out = 2, 5, 16, 12, 24, 20
        key = jax.random.PRNGKey(0)
        kx, ke_, kp = jax.random.split(key, 3)
        x = jax.random.normal(kx, (b, n, d))
        e = jax.random.normal(ke_, (b, n, n, de))

        pair = PairMLP2((d, d, de), hid, out)
        vp = pair.init(kp, [(x, "s"), (x, "t"), (e, "e")])
        y_split = pair.apply(vp, [(x, "s"), (x, "t"), (e, "e")])

        # same params drive the concat-form module (identical tree)
        mlp = MLP2(hid, out)
        xs = jnp.broadcast_to(x[:, :, None, :], (b, n, n, d))
        xt = jnp.broadcast_to(x[:, None, :, :], (b, n, n, d))
        y_concat = mlp.apply(vp, jnp.concatenate([xs, xt, e], axis=-1))
        np.testing.assert_allclose(np.asarray(y_split),
                                   np.asarray(y_concat), rtol=2e-5,
                                   atol=2e-5)

    def test_param_tree_matches_mlp2(self):
        """Checkpoint compatibility: identical param names and shapes."""
        import jax
        import jax.numpy as jnp
        from relpose_gnn_tpu.models.gnn import MLP2, PairMLP2

        d, de, hid, out = 8, 6, 10, 7
        x = jnp.zeros((1, 3, d))
        e = jnp.zeros((1, 3, 3, de))
        vp = PairMLP2((d, d, de), hid, out).init(
            jax.random.PRNGKey(0), [(x, "s"), (x, "t"), (e, "e")])
        vm = MLP2(hid, out).init(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 2 * d + de)))
        ps = jax.tree_util.tree_map(lambda a: a.shape, vp["params"])
        ms = jax.tree_util.tree_map(lambda a: a.shape, vm["params"])
        assert jax.tree_util.tree_structure(ps) == \
            jax.tree_util.tree_structure(ms)
        assert ps == ms


class TestGatedLayerOracle:
    def test_matches_numpy_reference_semantics(self):
        """simpleConvEdge_upt_att (my_gnn_layer.py:314-352): message =
        mlp(cat[x_TARGET, x_SOURCE, e']) * sigmoid(mlp_att(e')), mean-
        aggregated, then update mlp on [x, aggr].  Independent numpy
        recomputation from the layer's own params — guards the operand
        ORDER (a source/target swap passed the old shape-only test)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from relpose_gnn_tpu.models.gnn import DenseEdgeGNNGated

        b, n, d = 2, 3, 4
        rng = np.random.default_rng(7)
        x = rng.normal(size=(b, n, d)).astype(np.float32)
        e = rng.normal(size=(b, n, n, d)).astype(np.float32)
        adj = rng.random((b, n, n)) < 0.7
        layer = DenseEdgeGNNGated(node_dim=d, edge_dim=d, out_dim=d)
        v = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(e), jnp.asarray(adj))
        xn, en = layer.apply(v, jnp.asarray(x), jnp.asarray(e),
                             jnp.asarray(adj))

        p = jax.tree.map(np.asarray, v["params"])

        def mlp2(params, inp):
            h = np.maximum(inp @ params["fc1"]["kernel"]
                           + params["fc1"]["bias"], 0)
            return h @ params["fc2"]["kernel"] + params["fc2"]["bias"]

        xs = np.broadcast_to(x[:, :, None, :], (b, n, n, d))  # source rows
        xt = np.broadcast_to(x[:, None, :, :], (b, n, n, d))  # target cols
        e_new = mlp2(p["edge_mlp"], np.concatenate([xs, xt, e], -1))
        # PyG message(x_i, x_j, e'): TARGET then SOURCE
        msg = mlp2(p["msg_mlp"], np.concatenate([xt, xs, e_new], -1))
        gate = 1.0 / (1.0 + np.exp(-mlp2(p["gate_mlp"], e_new)))
        w = adj.astype(np.float32)[..., None]
        aggr = (msg * gate * w).sum(1) / np.maximum(w.sum(1), 1.0)
        x_new = mlp2(p["upd_mlp"], np.concatenate([x, aggr], -1))

        np.testing.assert_allclose(np.asarray(en), e_new, atol=2e-5)
        np.testing.assert_allclose(np.asarray(xn), x_new, atol=2e-5)
