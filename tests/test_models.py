"""Model unit tests: attention reduction, GNN vs numpy oracle, backbones,
full RelPoseGNN forward contract."""

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.attention import AttentionBlock
from relpose_gnn_tpu.models.gnn import DenseEdgeGNN, MLP2
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.models.resnet import ResNet34
from relpose_gnn_tpu.ops import graph as graph_ops


def tree_size(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


def attention_oracle(params, x):
    """Numpy oracle for the true reference attention math (att.py:16-34):
    f = phi(x) outer theta(x) [*, C/8, C/8], softmax over the LAST axis,
    y = softmax(f) @ g(x), z = x + W(y)."""
    def lin(p, v):
        return v @ np.asarray(p["kernel"]) + np.asarray(p["bias"])

    g_x = lin(params["g"], x)
    theta_x = lin(params["theta"], x)
    phi_x = lin(params["phi"], x)
    f = phi_x[..., :, None] * theta_x[..., None, :]
    f = f - f.max(axis=-1, keepdims=True)
    w = np.exp(f) / np.exp(f).sum(axis=-1, keepdims=True)
    y = np.einsum("...ij,...j->...i", w, g_x)
    return x + lin(params["W"], y)


class TestAttentionBlock:
    def test_matches_numpy_oracle(self):
        m = AttentionBlock(in_channels=64)
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (5, 64)))
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        out = m.apply({"params": params}, jnp.asarray(x))
        want = attention_oracle(jax.tree.map(np.asarray, params), x)
        np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)

    def test_matches_torch_reference(self):
        """Cross-check vs the torch restatement of att.py:7-34."""
        import torch
        from tests.torch_ref import TorchSimpleConvEdgeUpt

        dim = 32
        t_att = TorchSimpleConvEdgeUpt(dim).att
        m = AttentionBlock(in_channels=dim)
        x = np.random.default_rng(0).normal(size=(7, dim)).astype(np.float32)
        params = {
            k: {"kernel": np.asarray(getattr(t_att, k).weight.detach()).T,
                "bias": np.asarray(getattr(t_att, k).bias.detach())}
            for k in ("g", "theta", "phi", "W")}
        got = m.apply({"params": params}, jnp.asarray(x))
        with torch.no_grad():
            want = t_att(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_theta_phi_are_live(self):
        """theta/phi must influence the output (ADVICE.md r1 finding #1: an
        earlier revision wrongly treated them as dead parameters)."""
        m = AttentionBlock(in_channels=64)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 64))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": params}, x)
        mutated = jax.tree.map(lambda a: a, params)
        mutated["theta"] = jax.tree.map(lambda a: a + 1.0, mutated["theta"])
        out2 = m.apply({"params": mutated}, x)
        assert not np.allclose(np.asarray(out), np.asarray(out2))
        assert set(params.keys()) == {"g", "W", "theta", "phi"}


class TestDenseEdgeGNN:
    def _numpy_oracle(self, params, x, e, adj):
        """Independent numpy implementation of simpleConvEdge_upt semantics
        (my_gnn_layer.py:277-311)."""
        def mlp2(p, v):
            h = np.maximum(v @ p["fc1"]["kernel"] + p["fc1"]["bias"], 0)
            return h @ p["fc2"]["kernel"] + p["fc2"]["bias"]

        n, d = x.shape
        e_new = np.zeros_like(e)
        msg = np.zeros((n, n, x.shape[-1]))
        for s in range(n):
            for t in range(n):
                inp = np.concatenate([x[s], x[t], e[s, t]])
                e_new[s, t] = mlp2(params["edge_mlp"], inp)
                m = mlp2(params["msg_mlp"],
                         np.concatenate([x[s], e_new[s, t]]))
                msg[s, t] = attention_oracle(params["att"], m)
        aggr = np.zeros((n, d))
        for t in range(n):
            srcs = np.where(adj[:, t])[0]
            if len(srcs):
                aggr[t] = msg[srcs, t].mean(axis=0)
        x_new = np.stack([
            mlp2(params["upd_mlp"], np.concatenate([x[t], aggr[t]]))
            for t in range(n)])
        return x_new, e_new

    def test_matches_numpy_oracle(self):
        n, d, de = 6, 16, 8
        layer = DenseEdgeGNN(node_dim=d, edge_dim=de, out_dim=d)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(n, d)).astype(np.float32)
        e = rng.normal(size=(n, n, de)).astype(np.float32)
        adj = rng.random((n, n)) < 0.5
        np.fill_diagonal(adj, False)

        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(e), jnp.asarray(adj))["params"]
        got_x, got_e = layer.apply({"params": params}, jnp.asarray(x),
                                   jnp.asarray(e), jnp.asarray(adj))
        p_np = jax.tree.map(np.asarray, params)
        want_x, want_e = self._numpy_oracle(p_np, x, e, adj)
        np.testing.assert_allclose(np.asarray(got_e), want_e, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_x), want_x, atol=1e-4)

    def test_batched(self):
        layer = DenseEdgeGNN(node_dim=8, edge_dim=4, out_dim=8)
        x = jnp.ones((3, 5, 8))
        e = jnp.ones((3, 5, 5, 4))
        adj = jnp.ones((3, 5, 5), dtype=bool)
        params = layer.init(jax.random.PRNGKey(0), x, e, adj)["params"]
        xn, en = layer.apply({"params": params}, x, e, adj)
        assert xn.shape == (3, 5, 8) and en.shape == (3, 5, 5, 4)


class TestResNet34:
    def test_output_shape_and_param_count(self):
        m = ResNet34(feat_dim=64)
        x = jnp.ones((2, 64, 96, 3))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(variables, x, train=False)
        assert out.shape == (2, 64)
        # torchvision resnet34 trunk (no fc) has 21,284,672 params
        n_params = tree_size(variables["params"])
        fc = 512 * 64 + 64
        assert n_params == 21_284_672 + fc, n_params

    def test_train_mode_updates_batch_stats(self):
        m = ResNet34(feat_dim=16)
        x = jnp.ones((1, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        _, new_vars = m.apply(variables, x, train=True,
                              mutable=["batch_stats"])
        old = jax.tree.leaves(variables["batch_stats"])
        new = jax.tree.leaves(new_vars["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))


class TestRelPoseGNN:
    def _tiny_cfg(self, **kw):
        base = dict(num_nodes=4, feat_dim=32, edge_dim=32, node_dim=32,
                    knn=2, gnn_recursion=2, num_gnn_layers=1)
        base.update(kw)
        return RelPoseGNNConfig(**base)

    def test_forward_contract(self):
        cfg = self._tiny_cfg()
        model = RelPoseGNN(cfg)
        images = jnp.ones((2, 4, 32, 40, 3))
        adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(4),
                                          (2, 4, 4)))
        variables = model.init(jax.random.PRNGKey(0), images, adj,
                               train=False)
        pred_abs, pred_rel, adj_out, aux = model.apply(
            variables, images, adj, train=False)
        assert pred_abs.shape == (2, 4, 6)
        assert pred_rel.shape == (2, 4, 4, 6)
        assert adj_out.shape == (2, 4, 4)
        assert aux["node_feats"].shape == (2, 4, 32)
        # knn=2 -> 2 incoming edges per node
        np.testing.assert_array_equal(np.asarray(adj_out).sum(1), 2)

    def test_static_graph_when_knn_disabled(self):
        cfg = self._tiny_cfg(knn=0)
        model = RelPoseGNN(cfg)
        images = jnp.ones((1, 4, 32, 40, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(4))[None]
        variables = model.init(jax.random.PRNGKey(0), images, adj,
                               train=False)
        _, _, adj_out, _ = model.apply(variables, images, adj, train=False)
        np.testing.assert_array_equal(np.asarray(adj_out), np.asarray(adj))

    def test_dropout_only_in_train(self):
        cfg = self._tiny_cfg()
        model = RelPoseGNN(cfg)
        images = jnp.ones((1, 4, 32, 40, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(4))[None]
        variables = model.init(jax.random.PRNGKey(0), images, adj,
                               train=False)
        a1 = model.apply(variables, images, adj, train=False)[1]
        a2 = model.apply(variables, images, adj, train=False)[1]
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2))
        t1 = model.apply(variables, images, adj, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)},
                         mutable=["batch_stats"])[0][1]
        t2 = model.apply(variables, images, adj, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])[0][1]
        assert not np.allclose(np.asarray(t1), np.asarray(t2))

    def test_weight_tying(self):
        # R3 preset: one gnn layer applied gnn_recursion times
        cfg = RelPoseGNNConfig.preset("R3", feat_dim=32, edge_dim=32,
                                      node_dim=32, num_nodes=4)
        model = RelPoseGNN(cfg)
        images = jnp.ones((1, 4, 32, 40, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(4))[None]
        variables = model.init(jax.random.PRNGKey(0), images, adj,
                               train=False)
        names = [k for k in variables["params"] if k.startswith("gnn")]
        assert names == ["gnn1"]
        # R1 preset: two untied layers
        cfg1 = RelPoseGNNConfig.preset("R1", feat_dim=32, edge_dim=32,
                                       node_dim=32, num_nodes=4)
        v1 = RelPoseGNN(cfg1).init(jax.random.PRNGKey(0), images, adj,
                                   train=False)
        names1 = sorted(k for k in v1["params"] if k.startswith("gnn"))
        assert names1 == ["gnn1", "gnn2"]

    def test_compute_rp(self):
        p = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 6)))
        rp = np.asarray(RelPoseGNN.compute_rp(p))
        pn = np.asarray(p)
        for b in range(2):
            for s in range(4):
                for t in range(4):
                    np.testing.assert_allclose(rp[b, s, t],
                                               pn[b, s] - pn[b, t],
                                               atol=1e-6)


class TestEvalDropoutQuirk:
    def test_eval_dropout_flag_restores_reference_behavior(self):
        """The reference applies F.dropout(training=True) even in eval
        (posenet.py:1073-1075); eval_dropout=True replicates that
        stochastic eval, default stays deterministic."""
        base = dict(num_nodes=4, feat_dim=32, edge_dim=32, node_dim=32,
                    knn=0, backbone="resnet18", droprate=0.5)
        model = RelPoseGNN(RelPoseGNNConfig(eval_dropout=True, **base))
        images = jnp.ones((1, 4, 32, 40, 3))
        adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(4),
                                          (1, 4, 4)))
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(0)}, images, adj,
                       train=False)
        o1 = model.apply(v, images, adj, train=False,
                         rngs={"dropout": jax.random.PRNGKey(1)})[1]
        o2 = model.apply(v, images, adj, train=False,
                         rngs={"dropout": jax.random.PRNGKey(2)})[1]
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
