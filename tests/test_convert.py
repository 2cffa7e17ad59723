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


class TestViTConversion:
    """convert_vit: timm/DINOv2 layout -> ViTEncoder (fused-qkv split,
    LayerScale detection, pos-embed interpolation, fail-loud unknowns).
    VERDICT r4 next #7 — the vit.py load-through-convert claim, made real."""

    DIM, DEPTH, HEADS, PATCH, GRID = 32, 2, 4, 8, (2, 3)

    def _oracle_and_params(self, layer_scale=False, seed=0):
        from torch_ref import TorchMiniViT
        torch.manual_seed(seed)
        tm = TorchMiniViT(self.DIM, self.DEPTH, self.HEADS, self.PATCH,
                          self.GRID, layer_scale=layer_scale).eval()
        # non-trivial weights everywhere (default init zeros cls/pos and
        # ones gammas -> those legs of the parity would be vacuous)
        with torch.no_grad():
            for p in tm.parameters():
                p.add_(torch.randn_like(p) * 0.05)
        params, got_ls = convert.convert_vit(sd_numpy(tm),
                                             heads=self.HEADS)
        assert got_ls == layer_scale
        return tm, params

    def _flax_cls(self, params, x_nhwc, layer_scale):
        """Run ViTEncoder with fc pinned to identity so the output IS the
        post-norm CLS token (the fc head has no torch counterpart)."""
        from relpose_gnn_tpu.models.vit import ViTEncoder
        m = ViTEncoder(feat_dim=self.DIM, patch=self.PATCH, dim=self.DIM,
                       depth=self.DEPTH, heads=self.HEADS,
                       layer_scale=layer_scale)
        full = dict(params, fc={"kernel": np.eye(self.DIM, dtype=np.float32),
                                "bias": np.zeros(self.DIM, np.float32)})
        return m.apply({"params": full}, jnp.asarray(x_nhwc))

    @pytest.mark.parametrize("layer_scale", [False, True])
    def test_forward_parity(self, layer_scale):
        tm, params = self._oracle_and_params(layer_scale)
        rng = np.random.default_rng(1)
        gh, gw = self.GRID
        x = rng.normal(size=(2, 3, gh * self.PATCH, gw * self.PATCH)) \
            .astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(self._flax_cls(params, x.transpose(0, 2, 3, 1),
                                        layer_scale))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_structure_matches_init(self):
        """Converted tree == ViTEncoder.init structure minus the
        from-scratch fc head (the load_vit_weights merge contract)."""
        from relpose_gnn_tpu.models.vit import ViTEncoder
        _, params = self._oracle_and_params()
        m = ViTEncoder(feat_dim=16, patch=self.PATCH, dim=self.DIM,
                       depth=self.DEPTH, heads=self.HEADS)
        gh, gw = self.GRID
        ref = m.init(jax.random.PRNGKey(0),
                     jnp.ones((1, gh * self.PATCH, gw * self.PATCH, 3)))

        def paths(tree):
            return {jax.tree_util.keystr(p): tuple(v.shape)
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}
        want = {k: s for k, s in paths(ref["params"]).items()
                if not k.startswith("['fc']")}
        assert paths(params) == want

    def test_pos_embed_interpolation(self):
        """grid_hw resizes the table (CLS slot untouched); same-size is
        bitwise; non-square without old_hw fails loudly."""
        pos = np.random.default_rng(2).normal(
            size=(1, 10, 8)).astype(np.float32)  # 9 patches = 3x3
        same = convert.interpolate_pos_embed(pos, (3, 3))
        np.testing.assert_array_equal(same, pos)
        up = convert.interpolate_pos_embed(pos, (4, 5))
        assert up.shape == (1, 21, 8)
        np.testing.assert_array_equal(up[:, 0], pos[:, 0])
        rect = np.random.default_rng(3).normal(
            size=(1, 7, 8)).astype(np.float32)  # 6 patches: not square
        with pytest.raises(ValueError, match="not square"):
            convert.interpolate_pos_embed(rect, (2, 3))
        ok = convert.interpolate_pos_embed(rect, (3, 2), old_hw=(2, 3))
        assert ok.shape == (1, 7, 8)

    def test_convert_with_grid_hw(self):
        """End-to-end: a 'square-pretrained' checkpoint loads at a
        rectangular grid via grid_hw and the model runs."""
        from torch_ref import TorchMiniViT
        torch.manual_seed(4)
        tm = TorchMiniViT(self.DIM, self.DEPTH, self.HEADS, self.PATCH,
                          grid=(2, 2))
        params, _ = convert.convert_vit(sd_numpy(tm), heads=self.HEADS,
                                        grid_hw=self.GRID)
        gh, gw = self.GRID
        assert params["pos_embed"].shape == (1, gh * gw + 1, self.DIM)
        out = self._flax_cls(params,
                             np.ones((1, gh * self.PATCH,
                                      gw * self.PATCH, 3), np.float32),
                             layer_scale=False)
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_keys_fail_loudly(self):
        from torch_ref import TorchMiniViT
        sd = sd_numpy(TorchMiniViT(self.DIM, self.DEPTH, self.HEADS,
                                   self.PATCH, self.GRID))
        sd["blocks.0.attn.q_norm.weight"] = np.ones(self.DIM, np.float32)
        with pytest.raises(ValueError, match="unconsumed"):
            convert.convert_vit(sd, heads=self.HEADS)


class TestLoadViTWeights:
    """training/checkpoints.py::load_vit_weights — the warm-start entry."""

    class _State:
        def __init__(self, params):
            self.params = params

        def replace(self, params):
            return TestLoadViTWeights._State(params)

    def _setup(self, tmp_path, layer_scale=False, model_ls=None):
        from torch_ref import TorchMiniViT
        from relpose_gnn_tpu.models.vit import ViTEncoder
        torch.manual_seed(5)
        tm = TorchMiniViT(32, 2, 4, 8, (2, 3), layer_scale=layer_scale)
        path = str(tmp_path / "vit.pth")
        torch.save(tm.state_dict(), path)
        m = ViTEncoder(feat_dim=16, patch=8, dim=32, depth=2, heads=4,
                       layer_scale=layer_scale if model_ls is None
                       else model_ls)
        enc = m.init(jax.random.PRNGKey(1),
                     jnp.ones((1, 16, 24, 3)))["params"]
        enc = jax.tree.map(np.asarray, dict(enc))
        state = self._State({"model": {"encoder": enc}})
        return tm, path, state

    def test_warm_start_covers_all_but_fc(self, tmp_path):
        from relpose_gnn_tpu.training import checkpoints as ckpt
        tm, path, state = self._setup(tmp_path)
        old_fc = state.params["model"]["encoder"]["fc"]
        new = ckpt.load_vit_weights(state, path, heads=4)
        enc = new.params["model"]["encoder"]
        np.testing.assert_array_equal(
            enc["patch_embed"]["kernel"],
            convert.conv_kernel(tm.state_dict()["patch_embed.proj.weight"]))
        # fc head untouched (trained from scratch)
        np.testing.assert_array_equal(enc["fc"]["kernel"], old_fc["kernel"])

    def test_layer_scale_mismatch_fails(self, tmp_path):
        from relpose_gnn_tpu.training import checkpoints as ckpt
        _, path, state = self._setup(tmp_path, layer_scale=True,
                                     model_ls=False)
        with pytest.raises(ValueError, match="LayerScale"):
            ckpt.load_vit_weights(state, path, heads=4)

    def test_pos_grid_mismatch_points_at_grid_hw(self, tmp_path):
        from torch_ref import TorchMiniViT
        from relpose_gnn_tpu.training import checkpoints as ckpt
        torch.manual_seed(6)
        sq = TorchMiniViT(32, 2, 4, 8, (2, 2))  # 224-style square table
        path = str(tmp_path / "sq.pth")
        torch.save(sq.state_dict(), path)
        _, _, state = self._setup(tmp_path)  # model grid is (2, 3)
        with pytest.raises(ValueError, match="grid_hw"):
            ckpt.load_vit_weights(state, path, heads=4)
        new = ckpt.load_vit_weights(state, path, heads=4, grid_hw=(2, 3))
        assert new.params["model"]["encoder"]["pos_embed"].shape \
            == (1, 7, 32)
