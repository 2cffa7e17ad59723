"""BatchNorm folding: folded serving form must match the unfolded eval
path exactly (float32 round-off)."""

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models.fold_bn import (fold_relpose_backbone,
                                            fold_resnet_bn)
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.models.resnet import ResNet
from relpose_gnn_tpu.ops import graph as graph_ops


def randomize_bn_stats(variables, seed=0):
    """Give BN running stats non-trivial values so folding is exercised."""
    rng = np.random.default_rng(seed)

    def visit(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                if set(v.keys()) == {"mean", "var"}:
                    out[k] = {"mean": jnp.asarray(
                        rng.uniform(-0.5, 0.5, v["mean"].shape),
                        jnp.float32),
                        "var": jnp.asarray(
                        rng.uniform(0.5, 1.5, v["var"].shape), jnp.float32)}
                else:
                    out[k] = visit(v)
            else:
                out[k] = v
        return out

    return dict(variables, batch_stats=visit(dict(variables["batch_stats"])))


class TestFoldResNet:
    def test_folded_matches_eval_forward(self):
        m = ResNet(stage_sizes=(2, 2, 2, 2), feat_dim=32)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 64, 64, 3)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        variables = randomize_bn_stats(variables)
        want = m.apply(variables, x, train=False)

        folded_params = fold_resnet_bn(dict(variables["params"]),
                                       dict(variables["batch_stats"]))
        mf = ResNet(stage_sizes=(2, 2, 2, 2), feat_dim=32, folded=True)
        got = mf.apply({"params": folded_params}, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)

    def test_folded_tree_has_no_bn(self):
        m = ResNet(stage_sizes=(2, 2, 2, 2), feat_dim=16)
        v = m.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
                   train=False)
        folded = fold_resnet_bn(dict(v["params"]), dict(v["batch_stats"]))
        flat = jax.tree_util.tree_leaves_with_path(folded)
        assert not any("bn" in jax.tree_util.keystr(p) for p, _ in flat)
        # structure matches the folded module's init
        ref = ResNet(stage_sizes=(2, 2, 2, 2), feat_dim=16,
                     folded=True).init(jax.random.PRNGKey(0),
                                       jnp.ones((1, 32, 32, 3)),
                                       train=False)["params"]

        def paths(t):
            return {jax.tree_util.keystr(p): v.shape
                    for p, v in jax.tree_util.tree_leaves_with_path(t)}

        assert paths(ref) == paths(folded)


class TestFoldRelPose:
    def test_full_model_predictions_unchanged(self):
        cfg = RelPoseGNNConfig(num_nodes=4, feat_dim=32, edge_dim=32,
                               node_dim=32, knn=2, backbone="resnet18",
                               droprate=0.0)
        model = RelPoseGNN(cfg)
        img = jnp.asarray(np.random.default_rng(1).normal(
            size=(2, 4, 32, 40, 3)), jnp.float32)
        adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(4),
                                          (2, 4, 4)))
        variables = model.init(jax.random.PRNGKey(0), img, adj, train=False)
        variables = randomize_bn_stats(variables)
        want = model.apply(variables, img, adj, train=False)[1]

        fcfg, fvars = fold_relpose_backbone(cfg, variables)
        fmodel = RelPoseGNN(fcfg)
        got = fmodel.apply(fvars, img, adj, train=False)[1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)
