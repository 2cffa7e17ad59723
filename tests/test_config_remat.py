"""Config round-trip, remat equivalence, NaN-filter optimizer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.config import FrameworkConfig
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops
from relpose_gnn_tpu.training.trainer import TrainerConfig, make_optimizer


class TestFrameworkConfig:
    def test_json_roundtrip(self, tmp_path):
        cfg = FrameworkConfig()
        cfg = FrameworkConfig(
            trainer=TrainerConfig(lr=5e-4, filter_nans=True),
            model=RelPoseGNNConfig(num_nodes=16, knn=6, remat=True))
        p = str(tmp_path / "run.json")
        cfg.save(p)
        loaded = FrameworkConfig.load(p)
        assert loaded.trainer.lr == 5e-4
        assert loaded.trainer.filter_nans is True
        assert loaded.model.num_nodes == 16
        assert loaded.model.knn == 6
        assert loaded.model.remat is True
        assert loaded.experiment.ckpt_epochs == (149, 199)


class TestRemat:
    def test_remat_matches_plain_forward(self):
        kw = dict(num_nodes=4, feat_dim=32, edge_dim=32, node_dim=32,
                  knn=2, backbone="resnet18", droprate=0.0)
        plain = RelPoseGNN(RelPoseGNNConfig(**kw))
        remat = RelPoseGNN(RelPoseGNNConfig(remat=True, **kw))
        img = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 4, 32, 40, 3)), jnp.float32)
        adj = jnp.asarray(graph_ops.fc_adjacency(4))[None]
        v = plain.init(jax.random.PRNGKey(0), img, adj, train=False)
        o1 = plain.apply(v, img, adj, train=False)[1]
        o2 = remat.apply(v, img, adj, train=False)[1]  # same param tree
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   atol=1e-5)

    def test_remat_grads_match(self):
        kw = dict(num_nodes=3, feat_dim=16, edge_dim=16, node_dim=16,
                  knn=0, backbone="resnet18", droprate=0.0)
        plain = RelPoseGNN(RelPoseGNNConfig(**kw))
        remat = RelPoseGNN(RelPoseGNNConfig(remat=True, **kw))
        img = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 3, 32, 32, 3)), jnp.float32)
        adj = jnp.asarray(graph_ops.fc_adjacency(3))[None]
        v = plain.init(jax.random.PRNGKey(0), img, adj, train=False)

        def loss(params, model):
            out = model.apply({"params": params,
                               "batch_stats": v["batch_stats"]},
                              img, adj, train=False)
            return jnp.sum(out[1] ** 2)

        g1 = jax.grad(loss)(v["params"], plain)
        g2 = jax.grad(loss)(v["params"], remat)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4)


class TestNaNFilter:
    def test_zero_nans_keeps_update_usable(self):
        tcfg = TrainerConfig(filter_nans=True, steps_per_epoch=10,
                             weight_decay=0.0)
        tx = make_optimizer(tcfg)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        grads = {"w": jnp.asarray([1.0, jnp.nan, 2.0])}
        updates, _ = tx.update(grads, state, params)
        assert np.isfinite(np.asarray(updates["w"])).all()
        # the non-NaN components still produce a step
        assert abs(float(updates["w"][0])) > 0

    def test_default_propagates_nans(self):
        tcfg = TrainerConfig(filter_nans=False, steps_per_epoch=10,
                             weight_decay=0.0)
        tx = make_optimizer(tcfg)
        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        grads = {"w": jnp.asarray([1.0, jnp.nan, 2.0])}
        updates, _ = tx.update(grads, state, params)
        assert np.isnan(np.asarray(updates["w"])).any()
