"""Converter parity tests: torch modules vs converted flax params."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models import convert
from relpose_gnn_tpu.models.netvlad import NetVLAD
from relpose_gnn_tpu.models.resnet import ResNet

from torch_ref import TorchNetVLADPool, TorchResNet


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestResNetConversion:
    @pytest.mark.parametrize("stage_sizes", [(1, 1, 1, 1), (2, 2, 2, 2)])
    def test_forward_parity(self, stage_sizes):
        torch.manual_seed(0)
        tm = TorchResNet(stage_sizes, feat_dim=32).eval()
        # randomize BN running stats so the test exercises them
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

        x = np.random.default_rng(0).normal(size=(2, 3, 64, 64)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()

        params, stats = convert.convert_resnet(sd_numpy(tm), stage_sizes)
        fm = ResNet(stage_sizes=stage_sizes, feat_dim=32)
        got = fm.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_resnet34_state_dict_covers_model(self):
        """Converted tree structure must exactly match model.init's tree."""
        tm = TorchResNet((3, 4, 6, 3), feat_dim=16)
        params, stats = convert.convert_resnet(sd_numpy(tm), (3, 4, 6, 3))
        fm = ResNet(stage_sizes=(3, 4, 6, 3), feat_dim=16)
        ref = fm.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
                      train=False)

        def paths(tree):
            return {jax.tree_util.keystr(p): v.shape
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(ref["params"]) == paths(params)
        assert paths(ref["batch_stats"]) == paths(stats)


class TestGNNConversion:
    def test_full_model_tree_structure(self):
        """Synthetic reference-style state dict -> our RelPoseGNN tree."""
        from relpose_gnn_tpu.models.posenet import (RelPoseGNN,
                                                    RelPoseGNNConfig)
        d = 32

        sd = {}
        tm = TorchResNet((3, 4, 6, 3), feat_dim=d)
        for k, v in sd_numpy(tm).items():
            sd[f"feature_extractor.{k}"] = v
        rng = np.random.default_rng(0)

        def lin(name, cin, cout):
            sd[f"{name}.weight"] = rng.normal(size=(cout, cin)) \
                .astype(np.float32)
            sd[f"{name}.bias"] = rng.normal(size=cout).astype(np.float32)

        lin("proj_edge", 2 * d, d)
        lin("gnn1.edge_model.edge_mlp.0", 3 * d, d)
        lin("gnn1.edge_model.edge_mlp.2", d, d)
        lin("gnn1.mlp.0", 2 * d, d)
        lin("gnn1.mlp.2", d, d)
        lin("gnn1.mlp_updating.0", 2 * d, d)
        lin("gnn1.mlp_updating.2", d, d)
        for a in ("g", "theta", "phi"):
            lin(f"gnn1.att.{a}", d, d // 8)
        lin("gnn1.att.W", d // 8, d)
        for head in ("fc_xyz", "fc_wpqr", "fc_xyz_R", "fc_wpqr_R"):
            lin(head, d, 3)

        params, stats = convert.convert_relpose_gnn(sd)

        cfg = RelPoseGNNConfig.preset("R3", feat_dim=d, edge_dim=d,
                                      node_dim=d, num_nodes=4)
        model = RelPoseGNN(cfg)
        ref = model.init(jax.random.PRNGKey(0),
                         jnp.ones((1, 4, 32, 40, 3)),
                         jnp.ones((1, 4, 4), bool), train=False)

        def paths(tree):
            return {jax.tree_util.keystr(p): v.shape
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(ref["params"]) == paths(params)
        # forward runs with converted params
        out = model.apply({"params": params, "batch_stats": stats},
                          jnp.ones((1, 4, 32, 40, 3)),
                          jnp.ones((1, 4, 4), bool), train=False)
        assert np.isfinite(np.asarray(out[1])).all()

    def test_criterion(self):
        sd = {"sax": np.array([0.5]), "saq": np.array([-2.0])}
        out = convert.convert_criterion(sd)
        assert out["sax"] == 0.5 and out["saq"] == -2.0


class TestNetVLADConversion:
    def test_pool_parity(self):
        torch.manual_seed(1)
        tp = TorchNetVLADPool(clusters=8, dim=16).eval()
        x = np.random.default_rng(2).normal(size=(2, 16, 5, 6)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tp(torch.from_numpy(x)).numpy()

        sd = {f"pool.{k}": v.detach().numpy()
              for k, v in tp.state_dict().items()}
        # minimal encoder entries so convert_netvlad is exercised fully are
        # not needed here; build pool params directly:
        pool_params = {
            "centroids": sd["pool.centroids"],
            "assign_conv": {"kernel":
                            convert.conv_kernel(sd["pool.conv.weight"])}}
        fm = NetVLAD(num_clusters=8, dim=16)
        got = fm.apply({"params": pool_params},
                       jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_full_encoder_names(self):
        rng = np.random.default_rng(3)
        sd = {}
        cfg_channels = [(3, 64), (64, 64), (64, 128), (128, 128),
                        (128, 256), (256, 256), (256, 256), (256, 512),
                        (512, 512), (512, 512), (512, 512), (512, 512),
                        (512, 512)]
        for idx, (cin, cout) in zip(convert._VGG16_CONV_IDX, cfg_channels):
            sd[f"encoder.{idx}.weight"] = rng.normal(
                size=(cout, cin, 3, 3)).astype(np.float32)
            sd[f"encoder.{idx}.bias"] = rng.normal(size=cout) \
                .astype(np.float32)
        sd["pool.centroids"] = rng.normal(size=(64, 512)).astype(np.float32)
        sd["pool.conv.weight"] = rng.normal(size=(64, 512, 1, 1)) \
            .astype(np.float32)
        params = convert.convert_netvlad(sd)

        from relpose_gnn_tpu.models.netvlad import NetVLADEncoder
        m = NetVLADEncoder()
        ref = m.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 3)))

        def paths(tree):
            return {jax.tree_util.keystr(p): v.shape
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        assert paths(ref["params"]) == paths(params)
