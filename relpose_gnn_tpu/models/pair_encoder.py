"""RelPoseGNN with a dual-CNN pair-image edge extractor (PoseNetX3).

Ablation model (modules/posenet.py:254-377): besides the per-node ResNet34,
a second ResNet with a 6-input-channel conv1 encodes each *image pair*
(channel-concatenated, min/max index order) into the initial edge feature.
Two untied `simpleConvEdge` layers (no node-update MLP) follow.

Dense TPU form: the pair backbone runs over all N^2 ordered pairs — an
O(N^2) backbone cost, which is exactly why the production models replaced
it with pooled-feature edge projections; kept for ablation parity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relpose_gnn_tpu.models.gnn import DenseEdgeGNNNoUpdate
from relpose_gnn_tpu.models.resnet import ResNet
from relpose_gnn_tpu.ops import graph as graph_ops


class RelPoseGNNPairEncoder(nn.Module):
    feat_dim: int = 2048
    edge_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    use_gnn: bool = True
    stage_sizes: tuple = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, adj: jax.Array,
                 train: bool = False):
        """images [B, N, H, W, 3], adj [B, N, N] ->
        (pred_abs [B, N, 6], pred_rel [B, N, N, 6])."""
        b, n, h, w, _ = images.shape

        # node features
        x = ResNet(stage_sizes=self.stage_sizes, feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(
            images.reshape(b * n, h, w, 3), train=train)
        x = nn.relu(x).reshape(b, n, -1)

        # pair images in min/max index order (posenet.py:336, 999-1019
        # convention applied to raw pixels)
        pair = graph_ops.edge_pair_features(images.reshape(b, n, -1))
        pair = pair.reshape(b * n * n, 2, h, w, 3)
        pair = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1)  # 6 chans
        e = ResNet(stage_sizes=self.stage_sizes, feat_dim=self.edge_dim,
                   dtype=self.dtype, name="edge_encoder")(pair, train=train)
        e = nn.relu(e).reshape(b, n, n, -1)

        if self.use_gnn:
            for i in (1, 2):  # two UNTIED layers (posenet.py:283-284)
                layer = DenseEdgeGNNNoUpdate(
                    self.feat_dim, self.edge_dim, self.feat_dim,
                    dtype=self.dtype, name=f"gnn{i}")
                x, e = layer(x, e, adj)
                x = nn.relu(x)
                e = nn.relu(e)

        if self.droprate > 0:
            x = nn.Dropout(self.droprate)(
                x, deterministic=not (train or self.eval_dropout))

        pred_abs = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz")(x),
             nn.Dense(3, name="fc_wpqr")(x)], axis=-1)
        pred_rel = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz_R")(e),
             nn.Dense(3, name="fc_wpqr_R")(e)], axis=-1)
        return pred_abs, pred_rel
