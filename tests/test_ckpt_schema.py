"""Checkpoint-schema proof for the released reference artifacts.

The last offline de-risk for accuracy parity (VERDICT r3 next #4): the
released `.pth.tar` files are saved by the reference's
utils/utils.py:22-31 as

    {'epoch': E, 'model_state_dict': model.state_dict(),
     'optim_state_dict': optimizer.state_dict(),
     'criterion_state_dict': criterion.state_dict()}

with `PoseNetX_R2` R3-config parameter names (posenet.py:920-1091 module
attributes over a torchvision resnet34).  These tests build a checkpoint
with torch using that EXACT schema and assert that

  1. the stand-in torch model's state-dict key set IS the R3 key-name
     census derived from the reference source (so the stand-in cannot
     drift from what the released files contain);
  2. `convert.convert_relpose_gnn` consumes every key (key-for-key — the
     only unread keys are BatchNorm `num_batches_tracked` counters, which
     have no inference role);
  3. the converted tree covers the Flax model's parameter tree exactly
     (no unmapped model leaf, no orphan converted leaf);
  4. `checkpoints.load_torch_weights` ingests the full-schema file
     (epoch/optim/criterion wrappers present) with zero warnings, and
     rejects shape-mismatched checkpoints loudly;
  5. `cli/parity.py` runs end-to-end on a full-schema file with zero
     remapping warnings in its output.
"""

import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from torch_ref import TorchRelPoseGNN  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from relpose_gnn_tpu.models import convert  # noqa: E402
from relpose_gnn_tpu.models.posenet import (RelPoseGNN,  # noqa: E402
                                            RelPoseGNNConfig)
from relpose_gnn_tpu.training import checkpoints as ckpt  # noqa: E402
from relpose_gnn_tpu.training.trainer import (TrainerConfig,  # noqa: E402
                                              create_train_state)


class RefPoseNetCriterion(nn.Module):
    """State-dict twin of the reference PoseNetCriterion
    (criterion.py:33-60): learnable homoscedastic weights sax/saq."""

    def __init__(self, sax=0.0, saq=-3.0):
        super().__init__()
        self.sax = nn.Parameter(torch.tensor(float(sax)))
        self.saq = nn.Parameter(torch.tensor(float(saq)))


def reference_save_checkpoint(logdir, epoch, model, optimizer,
                              train_criterion):
    """Byte-for-byte the reference's save path (utils/utils.py:22-31):
    same filename pattern, same top-level dict keys."""
    filename = osp.join(logdir, "epoch_{:03d}.pth.tar".format(epoch))
    checkpoint_dict = \
        {'epoch': epoch, 'model_state_dict': model.state_dict(),
         'optim_state_dict': optimizer.state_dict(),
         'criterion_state_dict': train_criterion.state_dict()}
    torch.save(checkpoint_dict, filename)
    return filename


def make_full_schema_ckpt(tmpdir, dim=32, stages=(2, 2, 2, 2), knn=4,
                          epoch=149):
    """R3-shaped torch model + Adam + criterion saved with the exact
    reference schema (train.py:196-211 optimizer param groups included:
    model params + the two criterions' sax/saq)."""
    torch.manual_seed(0)
    tm = TorchRelPoseGNN(dim=dim, stage_sizes=stages, recursion=2,
                         knn=knn).eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.8, 1.2)
    crit, crit_r = RefPoseNetCriterion(), RefPoseNetCriterion()
    param_list = [{"params": tm.parameters()},
                  {"params": [crit.sax, crit.saq]},
                  {"params": [crit_r.sax, crit_r.saq]}]
    optimizer = torch.optim.Adam(param_list, lr=1e-4, weight_decay=5e-4)
    path = reference_save_checkpoint(str(tmpdir), epoch, tm, optimizer,
                                     crit)
    return tm, path


def r3_expected_key_names(stage_sizes=(3, 4, 6, 3)):
    """The PoseNetX_R2 R3-config state-dict key census, derived from the
    reference source: torchvision resnet34 backbone renamed under
    `feature_extractor.` with its fc swapped (posenet.py:941-945), plus
    proj_edge (:949), gnn1 = simpleConvEdge_upt {mlp, mlp_updating,
    edge_model.edge_mlp, att} (my_gnn_layer.py:277-311, att.py:7-13), and
    the four heads (:967-976)."""
    keys = set()

    def bn(prefix):
        for s in ("weight", "bias", "running_mean", "running_var",
                  "num_batches_tracked"):
            keys.add(f"{prefix}.{s}")

    def linear(prefix):
        keys.add(f"{prefix}.weight")
        keys.add(f"{prefix}.bias")

    fe = "feature_extractor"
    keys.add(f"{fe}.conv1.weight")
    bn(f"{fe}.bn1")
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            p = f"{fe}.layer{stage + 1}.{b}"
            keys.add(f"{p}.conv1.weight")
            bn(f"{p}.bn1")
            keys.add(f"{p}.conv2.weight")
            bn(f"{p}.bn2")
            if stage > 0 and b == 0:  # strided first block: projection
                keys.add(f"{p}.downsample.0.weight")
                bn(f"{p}.downsample.1")
    linear(f"{fe}.fc")
    linear("proj_edge")
    for mlp in ("mlp", "mlp_updating", "edge_model.edge_mlp"):
        linear(f"gnn1.{mlp}.0")
        linear(f"gnn1.{mlp}.2")
    for att in ("g", "theta", "phi", "W"):
        linear(f"gnn1.att.{att}")
    for head in ("fc_xyz", "fc_wpqr", "fc_xyz_R", "fc_wpqr_R"):
        linear(head)
    return keys


class _TrackingDict(dict):
    """Records which keys the converter actually READS (`in` probes are
    presence checks, not consumption — only __getitem__ counts)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _leaf_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}{k}"
        if isinstance(v, dict):
            out |= _leaf_paths(v, p + "/")
        else:
            out.add(p)
    return out


class TestR3KeyCensus:
    def test_stand_in_state_dict_is_the_r3_census(self):
        """The torch stand-in used across the parity tests emits exactly
        the R3 key-name set (resnet34 stage sizes) — so every schema
        claim proven on the stand-in transfers to the released files."""
        tm = TorchRelPoseGNN(dim=32, stage_sizes=(3, 4, 6, 3),
                             recursion=2, knn=4)
        got = set(tm.state_dict().keys())
        want = r3_expected_key_names((3, 4, 6, 3))
        assert got == want, (sorted(got - want), sorted(want - got))

    def test_converter_consumes_every_key(self):
        """Key-for-key: convert_relpose_gnn reads EVERY checkpoint key
        except the torch BN step counters (num_batches_tracked), which
        carry no inference state."""
        tm = TorchRelPoseGNN(dim=32, stage_sizes=(3, 4, 6, 3),
                             recursion=2, knn=4)
        sd = _TrackingDict({k: v.detach().numpy()
                            for k, v in tm.state_dict().items()})
        convert.convert_relpose_gnn(sd, stage_sizes=(3, 4, 6, 3))
        unread = set(sd) - sd.read
        assert all(k.endswith("num_batches_tracked") for k in unread), \
            sorted(k for k in unread
                   if not k.endswith("num_batches_tracked"))
        # and nothing essential is left: the unread set is exactly the
        # BN counters
        n_bn = sum(1 for k in sd if k.endswith("num_batches_tracked"))
        assert len(unread) == n_bn


class TestFullSchemaLoad:
    def _flax_state(self, stages, n=4):
        cfg = RelPoseGNNConfig(num_nodes=n, feat_dim=32, edge_dim=32,
                               node_dim=32, knn=4,
                               backbone="resnet18" if stages == (2, 2, 2, 2)
                               else "resnet34", droprate=0.0)
        model = RelPoseGNN(cfg)
        return create_train_state(
            jax.random.PRNGKey(0), model, TrainerConfig(),
            jnp.ones((1, n, 32, 40, 3)), jnp.ones((1, n, n), bool))

    def test_converted_tree_covers_model_tree_exactly(self, tmp_path):
        """No unmapped model leaf and no orphan converted leaf: the
        converted param paths equal the Flax model's param paths, and
        the BN-stat paths equal the model's batch_stats['encoder']."""
        tm, path = make_full_schema_ckpt(tmp_path)
        sd = convert.load_torch_state_dict(path)
        params, stats = convert.convert_relpose_gnn(sd, (2, 2, 2, 2))
        state = self._flax_state((2, 2, 2, 2))
        assert _leaf_paths(params) == _leaf_paths(
            dict(state.params["model"]))
        assert _leaf_paths(stats["encoder"]) == _leaf_paths(
            dict(state.batch_stats["encoder"]))

    def test_load_torch_weights_full_schema(self, tmp_path, recwarn):
        """load_torch_weights ingests the full four-field schema (the
        epoch / optim_state_dict / criterion_state_dict wrappers must
        not confuse the unwrap), emits zero warnings, and the loaded
        leaves are exactly the converted tensors."""
        tm, path = make_full_schema_ckpt(tmp_path)
        state = self._flax_state((2, 2, 2, 2))
        loaded = ckpt.load_torch_weights(state, path,
                                         stage_sizes=(2, 2, 2, 2))
        assert len(recwarn) == 0
        np.testing.assert_array_equal(
            np.asarray(loaded.params["model"]["encoder"]["conv1"]
                       ["kernel"]),
            convert.conv_kernel(
                tm.feature_extractor.conv1.weight.detach().numpy()))
        np.testing.assert_array_equal(
            np.asarray(loaded.params["model"]["fc_xyz_R"]["kernel"]),
            tm.fc_xyz_R.weight.detach().numpy().T)
        # criterion_state_dict round-trips through the converter too
        crit = convert.convert_criterion(
            torch.load(path, map_location="cpu",
                       weights_only=False)["criterion_state_dict"])
        assert crit == {"sax": 0.0, "saq": -3.0}

    def test_unknown_keys_fail_loudly(self, tmp_path):
        """A checkpoint with MORE blocks than the built model (e.g. a
        resnet34 checkpoint loaded into a resnet18 model) must raise:
        silently INSERTING the extra blocks would leave flax apply
        ignoring them — a half-loaded model behind a 'loaded weights'
        log line."""
        tm, path = make_full_schema_ckpt(tmp_path, stages=(3, 2, 2, 2))
        state = self._flax_state((2, 2, 2, 2))
        with pytest.raises(ValueError, match="does not exist"):
            ckpt.load_torch_weights(state, path,
                                    stage_sizes=(3, 2, 2, 2))

    def test_subset_checkpoint_fails_loudly(self, tmp_path):
        """The INVERSE of unknown-keys: a checkpoint that is a strict
        SUBSET of the built model (resnet18-shaped weights loaded into a
        resnet34 tree — every converted key exists there with matching
        BasicBlock shapes) must raise instead of half-loading and leaving
        the uncovered blocks at random init."""
        tm, path = make_full_schema_ckpt(tmp_path)  # (2, 2, 2, 2)
        state = self._flax_state((3, 4, 6, 3))
        with pytest.raises(ValueError, match="does not cover"):
            ckpt.load_torch_weights(state, path, stage_sizes=(2, 2, 2, 2))

    def test_shape_mismatch_fails_loudly(self, tmp_path):
        """A checkpoint trained under different dims must raise, not
        silently merge mismatched arrays into the model tree."""
        tm, path = make_full_schema_ckpt(tmp_path, dim=16)  # model is 32
        state = self._flax_state((2, 2, 2, 2))
        with pytest.raises(ValueError, match="shape mismatch"):
            ckpt.load_torch_weights(state, path, stage_sizes=(2, 2, 2, 2))


class TestParityCLIFullSchema:
    def test_parity_cli_zero_warnings(self, tmp_path, capsys):
        """cli/parity.py end-to-end on a FULL-schema epoch_149.pth.tar:
        per-scene medians out, zero remapping/weight warnings printed."""
        sys.path.insert(0, osp.join(
            osp.dirname(osp.dirname(osp.abspath(__file__))), "cli"))
        import parity
        from test_parity_cli import _write_pyg_dir

        _, path = make_full_schema_ckpt(tmp_path)
        gdir = str(tmp_path / "chess_fc4_sp5_test")
        _write_pyg_dir(gdir, n_graphs=4, n=4, h=32, w=36)
        rows = parity.main([
            "--weights", path,
            "--graph-data-dir", str(tmp_path),
            "--scenes", "chess",
            "--seq-len", "4", "--knn", "4",
            "--backbone", "resnet18", "--img-height", "32",
            "--batch-size", "4", "--dtype", "float32"])
        printed = capsys.readouterr()
        blob = (printed.out + printed.err).lower()
        assert "warn" not in blob, blob
        scene, err, pub = rows[0]
        assert scene == "chess"
        assert np.isfinite(err.median_t) and np.isfinite(err.median_q)


class TestReverseExport:
    """save_torch_checkpoint: the exact inverse of load_torch_weights
    (VERDICT r4 next #2) — weights trained here become loadable in the
    reference stack (utils/utils.py:22-31 schema, strict torch load)."""

    def _flax_state(self, n=4):
        cfg = RelPoseGNNConfig(num_nodes=n, feat_dim=32, edge_dim=32,
                               node_dim=32, knn=4, backbone="resnet18",
                               droprate=0.0)
        model = RelPoseGNN(cfg)
        return create_train_state(
            jax.random.PRNGKey(3), model, TrainerConfig(sax=0.7, saq=-1.3),
            jnp.ones((1, n, 32, 40, 3)), jnp.ones((1, n, n), bool))

    def test_export_key_census(self, tmp_path):
        """The exported model_state_dict key set IS the reference
        PoseNetX_R2 key census (resnet18 stage sizes here; the census
        generator is stage-parametric and separately proven against the
        R3 torch stand-in)."""
        state = self._flax_state()
        path = ckpt.save_torch_checkpoint(state, str(tmp_path), 149,
                                          stage_sizes=(2, 2, 2, 2))
        assert osp.basename(path) == "epoch_149.pth.tar"
        sd = torch.load(path, map_location="cpu",
                        weights_only=False)["model_state_dict"]
        assert set(sd.keys()) == r3_expected_key_names((2, 2, 2, 2))

    def test_roundtrip_bitwise(self, tmp_path):
        """export -> load_torch_weights restores every model param and
        BN stat bit-for-bit (both directions are pure transposes)."""
        state = self._flax_state()
        path = ckpt.save_torch_checkpoint(state, str(tmp_path), 199,
                                          stage_sizes=(2, 2, 2, 2))
        fresh = self._flax_state()
        # start from DIFFERENT weights so the equality is not vacuous
        fresh = fresh.replace(params=jax.tree.map(lambda x: x * 0.0,
                                                  fresh.params))
        loaded = ckpt.load_torch_weights(fresh, path,
                                         stage_sizes=(2, 2, 2, 2))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            dict(state.params["model"]), dict(loaded.params["model"]))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            dict(state.batch_stats), dict(loaded.batch_stats))

    def test_torch_side_strict_load(self, tmp_path):
        """The torch oracle accepts the export with strict=True, and a
        reference-grouped Adam accepts the optim_state_dict — the full
        schema is consumable by the reference's own restore path
        (train.py:214-219)."""
        state = self._flax_state()
        path = ckpt.save_torch_checkpoint(state, str(tmp_path), 149,
                                          stage_sizes=(2, 2, 2, 2))
        blob = torch.load(path, map_location="cpu", weights_only=False)
        assert sorted(blob.keys()) == ["criterion_state_dict", "epoch",
                                       "model_state_dict",
                                       "optim_state_dict"]
        tm = TorchRelPoseGNN(dim=32, stage_sizes=(2, 2, 2, 2),
                             recursion=2, knn=4)
        tm.load_state_dict(blob["model_state_dict"], strict=True)
        # spot-check a transposed tensor landed correctly
        np.testing.assert_array_equal(
            tm.proj_edge.weight.detach().numpy(),
            np.asarray(state.params["model"]["proj_edge"]["kernel"]).T)
        crit, crit_r = RefPoseNetCriterion(), RefPoseNetCriterion()
        opt = torch.optim.Adam([{"params": tm.parameters()},
                                {"params": [crit.sax, crit.saq]},
                                {"params": [crit_r.sax, crit_r.saq]}],
                               lr=1e-4, weight_decay=5e-4)
        opt.load_state_dict(blob["optim_state_dict"])
        # criterion scalars round-trip through the forward converter
        got = convert.convert_criterion(blob["criterion_state_dict"])
        assert got == {"sax": pytest.approx(0.7),
                       "saq": pytest.approx(-1.3)}

    def test_forward_parity_through_torch(self, tmp_path):
        """End-to-end proof: the exported checkpoint loaded into the
        TORCH oracle produces the same forward pass as the flax model
        that exported it (the strongest 'reference can use our weights'
        claim buildable offline).  The weight direction is the REVERSE
        of test_full_model_parity's golden tests: flax -> .pth.tar ->
        torch."""
        from relpose_gnn_tpu.ops import graph as graph_ops
        n = 6
        state = self._flax_state(n=n)
        path = ckpt.save_torch_checkpoint(state, str(tmp_path), 149,
                                          stage_sizes=(2, 2, 2, 2))
        blob = torch.load(path, map_location="cpu", weights_only=False)
        tm = TorchRelPoseGNN(dim=32, stage_sizes=(2, 2, 2, 2),
                             recursion=2, knn=4).eval()
        tm.load_state_dict(blob["model_state_dict"], strict=True)

        rng = np.random.default_rng(0)
        imgs_nchw = rng.normal(size=(n, 3, 32, 40)).astype(np.float32)
        with torch.no_grad():
            want_abs, want_rel, want_ei = tm(torch.from_numpy(imgs_nchw),
                                             None)  # knn>0: dynamic graph
        cfg = RelPoseGNNConfig(num_nodes=n, feat_dim=32, edge_dim=32,
                               node_dim=32, knn=4, backbone="resnet18",
                               droprate=0.0)
        model = RelPoseGNN(cfg)
        pred_abs, pred_rel, adj_out, _ = model.apply(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats},
            jnp.asarray(imgs_nchw.transpose(0, 2, 3, 1))[None],
            jnp.asarray(graph_ops.fc_adjacency(n))[None], train=False)
        want_ei = want_ei.numpy()
        np.testing.assert_array_equal(
            np.asarray(adj_out)[0],
            graph_ops.edge_index_to_adj(want_ei, n))
        np.testing.assert_allclose(np.asarray(pred_abs)[0],
                                   want_abs.numpy(), atol=5e-4)
        got_rel = np.asarray(pred_rel)[0][want_ei[0], want_ei[1]]
        np.testing.assert_allclose(got_rel, want_rel.numpy(), atol=5e-4)

    def test_export_rejects_unconvertible_backbone(self, tmp_path):
        """A ViT-backbone state has no PoseNetX_R2 representation — the
        exporter must fail loudly, not write a partial .pth.tar."""
        from relpose_gnn_tpu.models import convert as tc
        with pytest.raises(ValueError, match="cannot export"):
            tc.export_relpose_gnn({"vit_encoder": {}, "proj_edge": {}},
                                  {"encoder": {}})
