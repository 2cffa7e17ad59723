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


class TestSpaceToDepthStem:
    def test_stem_conv_equivalence_both_parities(self):
        """space_to_depth_conv1 + the s2d input packing must equal the
        7x7/s2 stem to f32 round-off — including ODD input extents (the
        production width 341 needs the pad-to-even path)."""
        from relpose_gnn_tpu.models.fold_bn import space_to_depth_conv1

        rng = np.random.default_rng(0)
        k7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)), jnp.float32)
        bias = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
        ks = space_to_depth_conv1({"kernel": k7, "bias": bias})["kernel"]
        for h, w in [(64, 64), (32, 41), (33, 47)]:
            x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
            want = jax.lax.conv_general_dilated(
                x, k7, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            ph, pw = h % 2, w % 2
            xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            h2, w2 = (h + ph) // 2, (w + pw) // 2
            xs = xp.reshape(2, h2, 2, w2, 2, 3).transpose(
                0, 1, 3, 2, 4, 5).reshape(2, h2, w2, 12)
            got = jax.lax.conv_general_dilated(
                xs, ks, (1, 1), [(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
            assert got.shape == want.shape, (h, w)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-4)

    def test_full_model_predictions_unchanged_s2d(self):
        """fold_relpose_backbone(s2d_stem=True): the full serving model
        with the transformed stem matches the unfolded eval path (odd
        width exercises the pad-to-even branch in ResNet)."""
        from relpose_gnn_tpu.models.fold_bn import fold_relpose_backbone

        cfg = RelPoseGNNConfig(num_nodes=4, feat_dim=32, edge_dim=32,
                               node_dim=32, knn=2, backbone="resnet18",
                               droprate=0.0)
        model = RelPoseGNN(cfg)
        img = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 4, 32, 41, 3)), jnp.float32)
        adj = jnp.asarray(np.broadcast_to(graph_ops.fc_adjacency(4),
                                          (2, 4, 4)))
        variables = model.init(jax.random.PRNGKey(0), img, adj, train=False)
        variables = randomize_bn_stats(variables)
        want = model.apply(variables, img, adj, train=False)[1]

        fcfg, fvars = fold_relpose_backbone(cfg, variables, s2d_stem=True)
        assert fcfg.s2d_stem and fcfg.bn_folded
        assert fvars["params"]["encoder"]["conv1"]["kernel"].shape == \
            (4, 4, 12, 64)
        got = RelPoseGNN(fcfg).apply(fvars, img, adj, train=False)[1]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4)


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
