"""GOLDEN full-model parity test (SURVEY.md §7 build step 3):

Run a reference-semantics PyTorch model (sparse edge lists, scatter-mean,
weight-tied GNN recursion — tests/torch_ref.py::TorchRelPoseGNN) and our
dense TPU model on the same random graph with CONVERTED weights, and demand
matching outputs.  This is the composition check that the per-component
parity tests (backbone, GNN layer, attention) cannot provide: edge-feature
ordering, relu placement, aggregation direction, recursion tying.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.models import convert
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops

from torch_ref import TorchRelPoseGNN


class TestFullModelParity:
    def test_dense_matches_sparse_reference_semantics(self):
        torch.manual_seed(0)
        dim, n, h, w = 32, 6, 64, 64
        tm = TorchRelPoseGNN(dim=dim, stage_sizes=(2, 2, 2, 2),
                             recursion=2).eval()
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)

        images = np.random.default_rng(0).normal(
            size=(n, 3, h, w)).astype(np.float32)
        edge_index = graph_ops.fc_edge_index(n)  # static fc graph, knn off
        with torch.no_grad():
            want_abs, want_rel = tm(torch.from_numpy(images),
                                    torch.from_numpy(edge_index))
        want_abs = want_abs.numpy()
        want_rel = want_rel.numpy()

        params, stats = convert.convert_relpose_gnn(
            {k: v.detach().numpy() for k, v in tm.state_dict().items()},
            stage_sizes=(2, 2, 2, 2))
        cfg = RelPoseGNNConfig.preset("R3", feat_dim=dim, edge_dim=dim,
                                      node_dim=dim, num_nodes=n, knn=0,
                                      droprate=0.0, backbone="resnet18")
        model = RelPoseGNN(cfg)

        adj = jnp.asarray(graph_ops.edge_index_to_adj(edge_index, n))[None]
        jimages = jnp.asarray(images.transpose(0, 2, 3, 1))[None]  # NHWC
        pred_abs, pred_rel, _, _ = model.apply(
            {"params": params, "batch_stats": stats}, jimages, adj,
            train=False)

        np.testing.assert_allclose(np.asarray(pred_abs)[0], want_abs,
                                   atol=5e-4)
        # gather the dense [N, N, 6] predictions at the sparse edges
        dense_rel = np.asarray(pred_rel)[0]
        got_rel = dense_rel[edge_index[0], edge_index[1]]
        np.testing.assert_allclose(got_rel, want_rel, atol=5e-4)

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
