"""Legacy/ablation PoseNetX model family, zoo-constructible by name.

Dense TPU equivalents of the reference's older model classes
(modules/posenet.py), completing the C5 inventory beyond the production
`RelPoseGNN` (which covers PoseNetX_R2/R3/LIGHT_KNN):

  * `PoseNetX`       (:106-170)  backbone -> relu -> [simpleConv] -> abs heads
  * `PoseNetX2`      (:172-254)  + rel heads on min/max pair features
  * `PoseNetX_LIGHT` (:380-489)  pair-projected edges + 2 untied
                                  simpleConvEdge layers, static graph
  * `PoseNetXOX`     (:491-610)  edges-only: 6-channel pair backbone,
                                  zero node states, rel heads only
  * `PoseNetX_R4`    (:765-919)  2 untied simpleConvEdge_upt layers with
                                  dropout between them, static graph

All take dense graph batches (images [B, N, H, W, 3], adj [B, N, N]) and
return `(pred_abs [B, N, 6], pred_rel [B, N, N, 6] | None, adj, aux)` —
the same contract as RelPoseGNN so the trainer/evaluator work unchanged.

Parity notes:
  * The reference instantiates some GNN submodules it never calls (e.g.
    PoseNetX's `gnn2`, :124); flax creates parameters lazily on call, so
    those dead parameters do not exist here (no released checkpoints exist
    for these ablations).
  * PoseNetXOX returns the first N rows of the sparse rel output as a fake
    "absolute" prediction (:607-609); the dense equivalent gathers the
    first N edges of the fc construction order.  (In the reference the
    first B*N rows of the BATCH-concatenated edge list span graph
    boundaries — a batch-layout artifact, not a per-graph selection; the
    dense form keeps the per-graph semantics.)
  * Every dropout site in this family is the reference's functional
    `F.dropout(x, p)` whose `training` flag defaults to True — i.e. ACTIVE
    AT EVAL TOO (same quirk as the production model, see the quirk ledger
    in models/posenet.py).  Default here is sane eval determinism;
    `eval_dropout=True` replicates the reference behavior (an eval-time
    'dropout' rng must then be provided).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relpose_gnn_tpu.models.gnn import (DenseConv, DenseEdgeGNN,
                                        DenseEdgeGNNNoUpdate, MLP2)
from relpose_gnn_tpu.models.resnet import ResNet
from relpose_gnn_tpu.ops import graph as graph_ops


class PoseNetX(nn.Module):
    """posenet.py:106-170: absolute-pose-only, optional edge-less GNN."""

    feat_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    use_gnn: bool = True
    stage_sizes: tuple = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, adj: jax.Array,
                 train: bool = False):
        b, n, h, w, _ = images.shape
        x = ResNet(stage_sizes=self.stage_sizes, feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(
            images.reshape(b * n, h, w, 3), train=train)
        x = nn.relu(x).reshape(b, n, -1)
        if self.use_gnn:  # ONE simpleConv applied (:154-155; gnn2 unused)
            x = nn.relu(DenseConv(self.feat_dim, dtype=self.dtype,
                                  name="gnn1")(x, adj))
        if self.droprate > 0:
            x = nn.Dropout(self.droprate)(
                x, deterministic=not (train or self.eval_dropout))
        pred_abs = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz")(x),
             nn.Dense(3, name="fc_wpqr")(x)], axis=-1)
        return pred_abs, None, adj, {"node_feats": x}


class PoseNetX2(nn.Module):
    """posenet.py:172-254: PoseNetX + relative heads on min/max pair
    features of the (post-dropout) node states."""

    feat_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    use_gnn: bool = True
    stage_sizes: tuple = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, adj: jax.Array,
                 train: bool = False):
        b, n, h, w, _ = images.shape
        x = ResNet(stage_sizes=self.stage_sizes, feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(
            images.reshape(b * n, h, w, 3), train=train)
        x = nn.relu(x).reshape(b, n, -1)
        if self.use_gnn:
            x = nn.relu(DenseConv(self.feat_dim, dtype=self.dtype,
                                  name="gnn1")(x, adj))
        if self.droprate > 0:
            x = nn.Dropout(self.droprate)(
                x, deterministic=not (train or self.eval_dropout))
        # edge features from the post-dropout states (:233-236)
        pair = graph_ops.edge_pair_features(x)
        pred_abs = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz")(x),
             nn.Dense(3, name="fc_wpqr")(x)], axis=-1)
        pred_rel = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz_R")(pair),
             nn.Dense(3, name="fc_wpqr_R")(pair)], axis=-1)
        return pred_abs, pred_rel, adj, {"node_feats": x}


class PoseNetXLight(nn.Module):
    """posenet.py:380-489: projected pair-feature edges + two UNTIED
    `simpleConvEdge` layers (no node-update MLP), static graph.

    Edge features are built from the PRE-relu backbone output (:451-455)."""

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
        b, n, h, w, _ = images.shape
        x = ResNet(stage_sizes=self.stage_sizes, feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(
            images.reshape(b * n, h, w, 3), train=train).reshape(b, n, -1)
        e = nn.Dense(self.edge_dim, name="proj_edge")(
            graph_ops.edge_pair_features(x))
        x = nn.relu(x)
        e = nn.relu(e)
        if self.use_gnn:
            for i in (1, 2):
                x, e = DenseEdgeGNNNoUpdate(
                    self.feat_dim, self.edge_dim, self.feat_dim,
                    dtype=self.dtype, name=f"gnn{i}")(x, e, adj)
                x = nn.relu(x)
                e = nn.relu(e)
        if self.droprate > 0:
            drop = nn.Dropout(self.droprate)
            x = drop(x, deterministic=not (train or self.eval_dropout))
            e = drop(e, deterministic=not (train or self.eval_dropout))
        pred_abs = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz")(x),
             nn.Dense(3, name="fc_wpqr")(x)], axis=-1)
        pred_rel = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz_R")(e),
             nn.Dense(3, name="fc_wpqr_R")(e)], axis=-1)
        return pred_abs, pred_rel, adj, {"node_feats": x}


class PoseNetXOX(nn.Module):
    """posenet.py:491-610: edges-only model.  Each ordered pair's images are
    channel-concatenated (min/max order) through a 6-input-channel ResNet;
    node states start as zeros; two untied `simpleConvEdge` layers; only
    relative heads are real — the "absolute" output gathers the first N
    fc-construction-order edges (:607-609)."""

    feat_dim: int = 1024
    edge_dim: int = 1024
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    use_gnn: bool = True
    stage_sizes: tuple = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, adj: jax.Array,
                 train: bool = False):
        b, n, h, w, _ = images.shape
        pair = graph_ops.edge_pair_features(images.reshape(b, n, -1))
        pair = pair.reshape(b * n * n, 2, h, w, 3)
        pair = jnp.concatenate([pair[:, 0], pair[:, 1]], axis=-1)  # 6 chans
        e = ResNet(stage_sizes=self.stage_sizes, feat_dim=self.edge_dim,
                   dtype=self.dtype, name="edge_encoder")(pair, train=train)
        e = nn.relu(e).reshape(b, n, n, -1)
        x = jnp.zeros((b, n, self.feat_dim), e.dtype)  # :576
        if self.use_gnn:
            x, e = DenseEdgeGNNNoUpdate(
                self.feat_dim, self.edge_dim, self.feat_dim,
                dtype=self.dtype, name="gnn1")(x, e, adj)
            x = nn.relu(x)
            e = nn.relu(e)
            x, e = DenseEdgeGNNNoUpdate(
                self.feat_dim, self.edge_dim, self.feat_dim,
                dtype=self.dtype, name="gnn2")(x, e, adj)
            e = nn.relu(e)  # :592: no relu on x after gnn2
        if self.droprate > 0:
            e = nn.Dropout(self.droprate)(
                e, deterministic=not (train or self.eval_dropout))
        pred_rel = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz_R")(e),
             nn.Dense(3, name="fc_wpqr_R")(e)], axis=-1)
        # fake abs output: rel predictions at the first N construction-order
        # edges (:607-609)
        ei = graph_ops.fc_edge_index(n)[:, :n]
        pred_abs = pred_rel[:, ei[0], ei[1]]
        return pred_abs, pred_rel, adj, {"node_feats": x}


class PoseNetXR4(nn.Module):
    """posenet.py:765-919: PoseNetX_R2 semantics but with two UNTIED
    `simpleConvEdge_upt` layers and dropout BETWEEN them, static graph
    (the kNN rebuild is commented out, :875-879)."""

    feat_dim: int = 1024
    edge_dim: int = 1024
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    use_gnn: bool = True
    use_ap: bool = True
    stage_sizes: tuple = (3, 4, 6, 3)
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, adj: jax.Array,
                 train: bool = False):
        b, n, h, w, _ = images.shape
        x = ResNet(stage_sizes=self.stage_sizes, feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(
            images.reshape(b * n, h, w, 3), train=train).reshape(b, n, -1)
        e = nn.relu(nn.Dense(self.edge_dim, name="proj_edge")(
            graph_ops.edge_pair_features(x)))
        drop = nn.Dropout(self.droprate)
        if self.use_gnn:
            x, e = DenseEdgeGNN(self.feat_dim, self.edge_dim, self.feat_dim,
                                dtype=self.dtype, name="gnn1")(x, e, adj)
            x, e = nn.relu(x), nn.relu(e)
            # inter-layer dropout (:890-891)
            x = drop(x, deterministic=not (train or self.eval_dropout))
            e = drop(e, deterministic=not (train or self.eval_dropout))
            x, e = DenseEdgeGNN(self.feat_dim, self.edge_dim, self.feat_dim,
                                dtype=self.dtype, name="gnn2")(x, e, adj)
            x, e = nn.relu(x), nn.relu(e)
        else:
            e = MLP2(self.edge_dim, self.edge_dim, dtype=self.dtype,
                     name="mlp")(e)
        if self.droprate > 0:
            x = drop(x, deterministic=not (train or self.eval_dropout))
            e = drop(e, deterministic=not (train or self.eval_dropout))
        if self.use_ap:
            pred_abs = jnp.concatenate(
                [nn.Dense(3, name="fc_xyz")(x),
                 nn.Dense(3, name="fc_wpqr")(x)], axis=-1)
        else:  # heads on pair features (:908-911)
            pair = graph_ops.edge_pair_features(x)
            pred_abs = jnp.concatenate(
                [nn.Dense(3, name="fc_xyz")(pair),
                 nn.Dense(3, name="fc_wpqr")(pair)], axis=-1)
        pred_rel = jnp.concatenate(
            [nn.Dense(3, name="fc_xyz_R")(e),
             nn.Dense(3, name="fc_wpqr_R")(e)], axis=-1)
        return pred_abs, pred_rel, adj, {"node_feats": x}
