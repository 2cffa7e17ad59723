"""GOLDEN full-model parity tests (SURVEY.md §7 build step 3):

Run a reference-semantics PyTorch model (sparse edge lists, scatter-mean,
weight-tied GNN recursion, dynamic kNN override — torch_ref.TorchRelPoseGNN)
and our dense TPU model on the same random graph with CONVERTED weights, and
demand matching outputs.  This is the composition check that the
per-component parity tests (backbone, GNN layer, attention) cannot provide:
edge-feature ordering, relu placement, aggregation direction, recursion
tying, and — in the production-config test — the knn=4 dynamic-graph
override semantics of torch-cluster (posenet.py:1043-1050).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from relpose_gnn_tpu.models import convert
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops

from torch_ref import TorchRelPoseGNN


def _randomize_bn(tm):
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.7, 1.3)


def _run_both(tm, images_nchw, edge_index, cfg, stage_sizes, adj=None):
    """(torch outputs, jax outputs) on the same graph with converted
    weights."""
    with torch.no_grad():
        want_abs, want_rel, want_ei = tm(torch.from_numpy(images_nchw),
                                         None if edge_index is None
                                         else torch.from_numpy(edge_index))
    params, stats = convert.convert_relpose_gnn(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        stage_sizes=stage_sizes)
    model = RelPoseGNN(cfg)
    n = images_nchw.shape[0]
    if adj is None:
        adj = graph_ops.edge_index_to_adj(edge_index, n)
    jimages = jnp.asarray(images_nchw.transpose(0, 2, 3, 1))[None]  # NHWC
    pred_abs, pred_rel, adj_out, aux = model.apply(
        {"params": params, "batch_stats": stats}, jimages,
        jnp.asarray(adj)[None], train=False)
    return ((want_abs.numpy(), want_rel.numpy(), want_ei.numpy()),
            (np.asarray(pred_abs)[0], np.asarray(pred_rel)[0],
             np.asarray(adj_out)[0], aux))


class TestFullModelParity:
    def test_dense_matches_sparse_reference_semantics(self):
        torch.manual_seed(0)
        dim, n, h, w = 32, 6, 64, 64
        tm = TorchRelPoseGNN(dim=dim, stage_sizes=(2, 2, 2, 2),
                             recursion=2).eval()
        _randomize_bn(tm)
        images = np.random.default_rng(0).normal(
            size=(n, 3, h, w)).astype(np.float32)
        edge_index = graph_ops.fc_edge_index(n)  # static fc graph, knn off
        cfg = RelPoseGNNConfig.preset("R3", feat_dim=dim, edge_dim=dim,
                                      node_dim=dim, num_nodes=n, knn=0,
                                      droprate=0.0, backbone="resnet18")
        (want_abs, want_rel, _), (pred_abs, dense_rel, _, _) = _run_both(
            tm, images, edge_index, cfg, (2, 2, 2, 2))

        np.testing.assert_allclose(pred_abs, want_abs, atol=5e-4)
        # gather the dense [N, N, 6] predictions at the sparse edges
        got_rel = dense_rel[edge_index[0], edge_index[1]]
        np.testing.assert_allclose(got_rel, want_rel, atol=5e-4)

    @pytest.mark.slow
    def test_production_config_knn4_golden(self):
        """The production R3 config: ResNet34 stages, dims 2048, 8 nodes,
        knn=4 — so the dynamic-graph override (posenet.py:1043-1050) is
        cross-checked against torch-cluster knn_graph semantics end to end,
        including the eval anchor (first kNN edge into node 0 == nearest
        pre-GNN neighbor).  Images are kept small (64x64) to bound CPU time;
        the spatial extent does not change any of the contracts under test
        (adaptive average pooling collapses it)."""
        torch.manual_seed(2)
        dim, n, h, w, k = 2048, 8, 64, 64, 4
        stages = (3, 4, 6, 3)  # ResNet34
        tm = TorchRelPoseGNN(dim=dim, stage_sizes=stages, recursion=2,
                             knn=k).eval()
        _randomize_bn(tm)
        images = np.random.default_rng(2).normal(
            size=(n, 3, h, w)).astype(np.float32)
        cfg = RelPoseGNNConfig.preset("R3", num_nodes=n, knn=k,
                                      droprate=0.0, backbone="resnet34")
        assert cfg.feat_dim == dim  # production preset really is 2048
        ((want_abs, want_rel, want_ei),
         (pred_abs, dense_rel, adj_out, aux)) = _run_both(
            tm, images, None, cfg, stages,
            adj=graph_ops.fc_adjacency(n))  # stored fc, overridden by kNN

        # 1. the dynamic kNN graphs must be identical
        want_adj = graph_ops.edge_index_to_adj(want_ei, n)
        np.testing.assert_array_equal(adj_out, want_adj)
        # 2. outputs at the kNN edges must match at production widths
        got_rel = dense_rel[want_ei[0], want_ei[1]]
        np.testing.assert_allclose(got_rel, want_rel, atol=3e-3)
        np.testing.assert_allclose(pred_abs, want_abs, atol=3e-3)
        # 3. anchor parity: first kNN edge into node 0 (reference protocol,
        #    testing/test.py:227-229) == our nearest pre-GNN neighbor
        first_into_0 = int(want_ei[0][np.argmax(want_ei[1] == 0)])
        ours = int(np.asarray(graph_ops.nearest_neighbor(
            aux["node_feats"], node=0))[0])
        assert ours == first_into_0

    @pytest.mark.slow
    def test_production_resolution_256x341_golden(self):
        """VERDICT r2 missing #1(a): the production spatial size 256x341
        was never golden-checked — only 64x64 (justified by adaptive
        pooling collapsing spatial extent, but that leaves stem/pool
        behavior and accumulation over 16x more pixels untested).  Full
        production config end to end: ResNet34, dims 2048, 8 nodes, knn=4,
        256x341 pixels, vs the torch oracle."""
        torch.manual_seed(4)
        dim, n, h, w, k = 2048, 8, 256, 341, 4
        stages = (3, 4, 6, 3)
        tm = TorchRelPoseGNN(dim=dim, stage_sizes=stages, recursion=2,
                             knn=k).eval()
        _randomize_bn(tm)
        images = np.random.default_rng(4).normal(
            size=(n, 3, h, w)).astype(np.float32)
        cfg = RelPoseGNNConfig.preset("R3", num_nodes=n, knn=k,
                                      droprate=0.0, backbone="resnet34")
        ((want_abs, want_rel, want_ei),
         (pred_abs, dense_rel, adj_out, aux)) = _run_both(
            tm, images, None, cfg, stages,
            adj=graph_ops.fc_adjacency(n))

        want_adj = graph_ops.edge_index_to_adj(want_ei, n)
        np.testing.assert_array_equal(adj_out, want_adj)
        got_rel = dense_rel[want_ei[0], want_ei[1]]
        np.testing.assert_allclose(got_rel, want_rel, atol=3e-3)
        np.testing.assert_allclose(pred_abs, want_abs, atol=3e-3)
        first_into_0 = int(want_ei[0][np.argmax(want_ei[1] == 0)])
        ours = int(np.asarray(graph_ops.nearest_neighbor(
            aux["node_feats"], node=0))[0])
        assert ours == first_into_0

        # bf16 leg: the PRODUCTION dtype accumulating over the full
        # spatial extent must stay close to the f32 oracle (catches
        # catastrophic accumulation error, not rounding; production
        # configs run the backbone/GNN in bf16, experiment.build_model).
        # Run on the STATIC fc graph (knn=0 both sides) so a bf16 near-tie
        # in the kNN distances cannot flip the graph and turn a rounding
        # difference into a structural one.
        import jax.numpy as jnp
        ei_fc = graph_ops.fc_edge_index(n)
        tm.knn = 0
        try:
            with torch.no_grad():
                _, want_rel_fc, _ = tm(torch.from_numpy(images),
                                       torch.from_numpy(ei_fc.copy()))
        finally:
            tm.knn = k
        want_rel_fc = want_rel_fc.numpy()
        cfg16 = RelPoseGNNConfig.preset("R3", num_nodes=n, knn=0,
                                        droprate=0.0, backbone="resnet34",
                                        dtype=jnp.bfloat16)
        params, stats = convert.convert_relpose_gnn(
            {kk: v.detach().numpy() for kk, v in tm.state_dict().items()},
            stage_sizes=stages)
        jimages = jnp.asarray(images.transpose(0, 2, 3, 1))[None]
        _, rel16, _, _ = RelPoseGNN(cfg16).apply(
            {"params": params, "batch_stats": stats}, jimages,
            jnp.asarray(graph_ops.fc_adjacency(n))[None], train=False)
        got16 = np.asarray(rel16)[0][ei_fc[0], ei_fc[1]]
        err16 = np.max(np.abs(got16 - want_rel_fc))
        scale = np.max(np.abs(want_rel_fc)) + 1.0
        assert err16 < 0.05 * scale, (err16, scale)

    def test_recursion_count_matters(self):
        """Sanity: the weight-tied layer applied 1 vs 2 times differs, so
        the parity above really exercises the recursion."""
        torch.manual_seed(1)
        tm1 = TorchRelPoseGNN(dim=16, stage_sizes=(1, 1, 1, 1),
                              recursion=1).eval()
        tm2 = TorchRelPoseGNN(dim=16, stage_sizes=(1, 1, 1, 1),
                              recursion=2).eval()
        tm2.load_state_dict(tm1.state_dict())
        imgs = torch.randn(4, 3, 32, 32)
        ei = torch.from_numpy(graph_ops.fc_edge_index(4))
        with torch.no_grad():
            a1 = tm1(imgs, ei)[1]
            a2 = tm2(imgs, ei)[1]
        assert not torch.allclose(a1, a2)

    def test_knn_override_graph_matches(self):
        """Cheap version of the kNN cross-check (small dims) so the
        contract is covered even when slow tests are deselected."""
        torch.manual_seed(3)
        n, k = 8, 4
        tm = TorchRelPoseGNN(dim=32, stage_sizes=(2, 2, 2, 2), recursion=1,
                             knn=k).eval()  # resnet18 stage sizes
        _randomize_bn(tm)
        images = np.random.default_rng(3).normal(
            size=(n, 3, 32, 32)).astype(np.float32)
        cfg = RelPoseGNNConfig.preset("R3", feat_dim=32, edge_dim=32,
                                      node_dim=32, num_nodes=n, knn=k,
                                      gnn_recursion=1, droprate=0.0,
                                      backbone="resnet18")
        ((want_abs, want_rel, want_ei),
         (pred_abs, dense_rel, adj_out, _)) = _run_both(
            tm, images, None, cfg, (2, 2, 2, 2),
            adj=graph_ops.fc_adjacency(n))
        want_adj = graph_ops.edge_index_to_adj(want_ei, n)
        np.testing.assert_array_equal(adj_out, want_adj)
        got_rel = dense_rel[want_ei[0], want_ei[1]]
        np.testing.assert_allclose(got_rel, want_rel, atol=1e-3)
