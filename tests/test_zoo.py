"""Model-zoo smoke tests: every registered family initializes and runs on
tiny shapes, including the stretch configs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.atloc import FourDirectionalLSTM
from relpose_gnn_tpu.models.zoo import build_model
from relpose_gnn_tpu.ops import graph as graph_ops


def tiny(name, **kw):
    return build_model(name, feat_dim=32, **kw) \
        if name in ("posenet", "mapnet", "atloc", "atloc+") else \
        build_model(name, feat_dim=32, edge_dim=32, node_dim=32, **kw)


class TestZoo:
    @pytest.mark.parametrize("name", ["R1", "R2", "R3"])
    def test_graph_models(self, name):
        m = tiny(name, num_nodes=4, knn=2)
        img = jnp.ones((1, 4, 32, 40, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(4))[None]
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr, a, _ = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 4, 6) and pr.shape == (1, 4, 4, 6)

    def test_r3_32_node_stretch(self):
        m = build_model("r3-32", feat_dim=32, edge_dim=32, node_dim=32,
                        knn=4)
        img = jnp.ones((1, 32, 32, 40, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(32))[None]
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr, a, _ = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 32, 6) and pr.shape == (1, 32, 32, 6)
        assert np.asarray(a).sum(axis=1).max() == 4  # knn incoming

    def test_stretch_presets(self):
        """RelPoseGNNConfig.preset knows the stretch names (the bench
        harnesses construct through preset(), not the zoo registry):
        R3-vit = R3 dims with the ViT-B/16 node encoder, R3-32 = R3 dims
        on 32-node graphs (BASELINE.json configs[4-5])."""
        from relpose_gnn_tpu.models.posenet import RelPoseGNNConfig
        c = RelPoseGNNConfig.preset("R3-vit", num_nodes=8)
        assert c.backbone == "vit" and c.feat_dim == 2048
        assert c.num_nodes == 8
        c = RelPoseGNNConfig.preset("R3-32")
        assert c.num_nodes == 32 and c.backbone == "resnet34"
        assert (c.feat_dim, c.edge_dim, c.node_dim) == (2048,) * 3

    def test_vit_stretch_backbone(self):
        m = build_model("r3-vit", feat_dim=32, edge_dim=32, node_dim=32,
                        num_nodes=4, knn=2)
        # tiny ViT via overrides is not exposed; just check init traces with
        # a small image (full ViT-B params but tiny spatial extent)
        img = jnp.ones((1, 4, 32, 32, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(4))[None]
        v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), img, adj,
                                          train=False))
        assert "encoder" in v["params"]

    def test_posenet(self):
        m = tiny("posenet")
        img = jnp.ones((2, 32, 40, 3))
        v = m.init(jax.random.PRNGKey(0), img, train=False)
        out = m.apply(v, img, train=False)
        assert out.shape == (2, 6)

    def test_mapnet_sequence(self):
        m = tiny("mapnet")
        img = jnp.ones((2, 3, 32, 40, 3))
        v = m.init(jax.random.PRNGKey(0), img, train=False)
        out = m.apply(v, img, train=False)
        assert out.shape == (2, 3, 6)

    def test_atloc(self):
        m = tiny("atloc")
        img = jnp.ones((2, 32, 40, 3))
        v = m.init(jax.random.PRNGKey(0), img, train=False)
        out = m.apply(v, img, train=False)
        assert out.shape == (2, 6)

    def test_atloc_plus(self):
        m = tiny("atloc+")
        img = jnp.ones((1, 2, 32, 40, 3))
        v = m.init(jax.random.PRNGKey(0), img, train=False)
        out = m.apply(v, img, train=False)
        assert out.shape == (1, 2, 6)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            build_model("nope")


class TestFourDirectionalLSTM:
    def test_output_shape(self):
        m = FourDirectionalLSTM(seq_size=8, origin_feat_size=64,
                                hidden_size=16)
        x = jnp.ones((3, 64))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (3, 64)  # 4 * hidden

    def test_deterministic_by_default(self):
        m = FourDirectionalLSTM(seq_size=4, origin_feat_size=16,
                                hidden_size=8)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16)),
                        jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        o1 = m.apply(v, x)
        o2 = m.apply(v, x)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


class TestLegacyPoseNetXFamily:
    """Zoo-constructible legacy models (VERDICT r1 missing #5); each runs
    on tiny shapes and matches its reference output contract."""

    def _io(self, n=4):
        img = jnp.ones((1, n, 32, 40, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(n))[None]
        return img, adj

    def _build(self, name, **kw):
        return build_model(name, stage_sizes=(1, 1, 1, 1), feat_dim=32,
                           droprate=0.0, **kw)

    def test_posenetx_abs_only(self):
        m = self._build("posenetx")
        img, adj = self._io()
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr, a, aux = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 4, 6) and pr is None
        assert "gnn1" in v["params"] and "gnn2" not in v["params"]

    def test_posenetx2_pair_rel_heads(self):
        m = self._build("posenetx2")
        img, adj = self._io()
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr, _, _ = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 4, 6) and pr.shape == (1, 4, 4, 6)
        # min/max pair features: rel prediction symmetric in (s, t)
        prn = np.asarray(pr)
        np.testing.assert_allclose(prn[0, 1, 2], prn[0, 2, 1], atol=1e-6)

    def test_posenetx_light_two_untied_layers(self):
        m = self._build("posenetx-light", edge_dim=32)
        img, adj = self._io()
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr, _, _ = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 4, 6) and pr.shape == (1, 4, 4, 6)
        assert {"gnn1", "gnn2"} <= set(v["params"].keys())
        # untied: parameters differ between the two layers
        k1 = v["params"]["gnn1"]["msg_mlp"]["fc1"]["kernel"]
        k2 = v["params"]["gnn2"]["msg_mlp"]["fc1"]["kernel"]
        assert not np.allclose(np.asarray(k1), np.asarray(k2))

    def test_posenetxox_edges_only(self):
        m = self._build("posenetxox", edge_dim=32)
        img, adj = self._io()
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr, _, _ = m.apply(v, img, adj, train=False)
        assert pr.shape == (1, 4, 4, 6)
        # fake abs output = rel at first N fc construction-order edges
        ei = graph_ops.fc_edge_index(4)[:, :4]
        np.testing.assert_allclose(
            np.asarray(pa)[0], np.asarray(pr)[0, ei[0], ei[1]], atol=1e-6)
        # 6-channel pair encoder present, no node encoder
        assert "edge_encoder" in v["params"]
        assert "encoder" not in v["params"]

    def test_posenetx_r4_untied_upt_layers(self):
        m = self._build("posenetx-r4", edge_dim=32)
        img, adj = self._io()
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr, _, _ = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 4, 6) and pr.shape == (1, 4, 4, 6)
        assert {"gnn1", "gnn2"} <= set(v["params"].keys())
        # upt layer: has a node-update MLP (unlike simpleConvEdge)
        assert "upd_mlp" in v["params"]["gnn1"]

    def test_posenetx3_dual_cnn(self):
        m = self._build("posenetx3", edge_dim=32)
        img, adj = self._io()
        v = m.init(jax.random.PRNGKey(0), img, adj, train=False)
        pa, pr = m.apply(v, img, adj, train=False)
        assert pa.shape == (1, 4, 6) and pr.shape == (1, 4, 4, 6)


class TestEvalDropoutQuirkLegacy:
    """Every reference dropout site is F.dropout(training=True) — active at
    eval too (same quirk the production model's ledger records); the whole
    legacy/baseline zoo exposes eval_dropout=True to replicate it."""

    def test_legacy_graph_model_stochastic_eval(self):
        m = build_model("posenetx-r4", stage_sizes=(1, 1, 1, 1),
                        feat_dim=32, edge_dim=32, droprate=0.5,
                        eval_dropout=True)
        img = jnp.ones((1, 4, 32, 40, 3))
        adj = jnp.asarray(graph_ops.fc_adjacency(4))[None]
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)}, img, adj, train=False)
        o1 = m.apply(v, img, adj, train=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})[1]
        o2 = m.apply(v, img, adj, train=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})[1]
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_atloc_stochastic_eval_and_default_deterministic(self):
        img = jnp.ones((2, 32, 40, 3))
        mq = build_model("atloc", feat_dim=64, droprate=0.5,
                         eval_dropout=True)
        v = mq.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(0)}, img, train=False)
        o1 = mq.apply(v, img, train=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = mq.apply(v, img, train=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
        md = build_model("atloc", feat_dim=64, droprate=0.5)
        vd = md.init(jax.random.PRNGKey(0), img, train=False)
        d1 = md.apply(vd, img, train=False)
        d2 = md.apply(vd, img, train=False)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_mapnet_threads_flag(self):
        img = jnp.ones((1, 2, 32, 40, 3))
        m = build_model("mapnet", feat_dim=64, droprate=0.5,
                        eval_dropout=True)
        v = m.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(0)}, img, train=False)
        o1 = m.apply(v, img, train=False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = m.apply(v, img, train=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(o1), np.asarray(o2))
