"""RelPoseGNN — the flagship relative-pose regression model.

TPU-native re-design of `PoseNetX_R2` / `PoseNetX_LIGHT_KNN`
(modules/posenet.py:920-1091, :612-762): ResNet node encoder + dense
edge-featured GNN + absolute/relative pose heads, operating on a batch of
fixed-size graphs as dense tensors.

Shapes:
    images : [B, N, H, W, 3]   (NHWC; the reference is NCHW flattened)
    adj    : [B, N, N] bool    static graph structure (overridden on device
                               by dynamic kNN when `knn > 0`, exactly like
                               posenet.py:1043-1050 overrides the stored
                               fc graph)
    out    : pred_abs [B, N, 6], pred_rel [B, N, N, 6], adj [B, N, N]

Quirk ledger (SURVEY.md §7 "hard parts", replicated or flagged):
  * Relative pose = plain vector difference p[s] - p[t] on [t, logq]
    (posenet.py:1021-1031) — NOT a geometric relative pose. Replicated.
  * The reference calls `F.dropout(x, p)` with torch's default
    `training=True`, so dropout fires even under `model.eval()`
    (posenet.py:1073-1075). We default to deterministic eval
    (`deterministic=True`); set `eval_dropout=True` on the config for
    faithful stochastic-eval replication.
  * `use_attention=False` for the production configs (train.py:179-189
    never passes it).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relpose_gnn_tpu.models.attention import AttentionBlock
from relpose_gnn_tpu.models.gnn import DenseEdgeGNN, MLP2
from relpose_gnn_tpu.models.resnet import ResNet
from relpose_gnn_tpu.ops import graph as graph_ops


@dataclasses.dataclass(frozen=True)
class RelPoseGNNConfig:
    """Static hyperparameters; presets mirror train.py:173-189 model names."""

    num_nodes: int = 8
    feat_dim: int = 2048
    edge_dim: int = 2048
    node_dim: int = 2048
    droprate: float = 0.5
    knn: int = 4                # >0: dynamic kNN graph per forward
    gnn_recursion: int = 2      # number of GNN applications
    num_gnn_layers: int = 1     # distinct (untied) layer modules, cycled
    use_gnn: bool = True
    use_attention: bool = False
    use_ap: bool = True         # absolute head reads node features
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    backbone: str = "resnet34"
    dtype: Any = None           # compute dtype for backbone/GNN (bf16 on TPU)
    remat: bool = False         # jax.checkpoint the backbone (activation
    #                             rematerialization: trades FLOPs for HBM,
    #                             enables larger train batches)
    bn_folded: bool = False     # serving form: BN folded into conv weights
    #                             (models/fold_bn.py; eval only)
    s2d_stem: bool = False      # serving form: space-to-depth conv1
    #                             (fold_bn.space_to_depth_conv1 transforms
    #                             the checkpoint weights; eval only)
    vit_layer_scale: bool = False  # backbone="vit": DINOv2-style
    #                                LayerScale residual gammas (set when
    #                                warm-starting from a checkpoint that
    #                                carries them; models/convert.py::
    #                                convert_vit detects which)
    compact_edges: bool = False  # GNN computes on a compact static-shape
    #                              edge list ([.., E] gathered endpoints)
    #                              instead of the dense N x N pair grid —
    #                              exact same math per edge, same params;
    #                              halves pair/attention work at the
    #                              production kNN serving graph (E = N*k
    #                              = 32 vs 64).  pred_rel stays a dense
    #                              [.., N, N, 6] grid but is ZERO at
    #                              non-edges (every protocol consumer —
    #                              eval anchor, masked losses — reads
    #                              edges only)

    @classmethod
    def preset(cls, name: str, **overrides) -> "RelPoseGNNConfig":
        """'R1' = PoseNetX_LIGHT_KNN (two untied layers, train.py:174-177);
        'R2' = PoseNetX_R2 dims 1024 (train.py:178-182);
        'R3' = PoseNetX_R2 dims 2048, the production config
        (train.py:183-189)."""
        base = {
            "R1": dict(feat_dim=2048, edge_dim=2048, node_dim=2048,
                       num_gnn_layers=2, gnn_recursion=2),
            "R2": dict(feat_dim=1024, edge_dim=1024, node_dim=1024,
                       num_gnn_layers=1, gnn_recursion=2),
            "R3": dict(feat_dim=2048, edge_dim=2048, node_dim=2048,
                       num_gnn_layers=1, gnn_recursion=2),
            # stretch configs (BASELINE.json configs[4-5], no reference
            # equivalent): R3 with a ViT-B/16 node encoder / 32-node
            # graphs.  Overrides win over the base dict as usual.
            "R3-vit": dict(feat_dim=2048, edge_dim=2048, node_dim=2048,
                           num_gnn_layers=1, gnn_recursion=2,
                           backbone="vit"),
            "R3-32": dict(feat_dim=2048, edge_dim=2048, node_dim=2048,
                          num_gnn_layers=1, gnn_recursion=2,
                          num_nodes=32),
        }[name]
        base.update(overrides)
        return cls(**base)


class RelPoseGNN(nn.Module):
    cfg: RelPoseGNNConfig

    def setup(self):
        c = self.cfg
        # static_argnums=(2,): `train` flag (argnum 0 is the module itself)
        resnet_cls = (nn.remat(ResNet, static_argnums=(2,)) if c.remat
                      else ResNet)
        if c.backbone == "resnet34":
            self.encoder = resnet_cls(stage_sizes=(3, 4, 6, 3),
                                      feat_dim=c.feat_dim, dtype=c.dtype,
                                      folded=c.bn_folded,
                                      s2d_stem=c.s2d_stem)
        elif c.backbone == "resnet18":
            self.encoder = resnet_cls(stage_sizes=(2, 2, 2, 2),
                                      feat_dim=c.feat_dim, dtype=c.dtype,
                                      folded=c.bn_folded,
                                      s2d_stem=c.s2d_stem)
        elif c.backbone == "vit":
            from relpose_gnn_tpu.models.vit import ViTEncoder
            vit_cls = (nn.remat(ViTEncoder, static_argnums=(2,))
                       if c.remat else ViTEncoder)
            self.encoder = vit_cls(feat_dim=c.feat_dim, dtype=c.dtype,
                                   layer_scale=c.vit_layer_scale)
        else:
            raise ValueError(f"unknown backbone {c.backbone!r}")

        self.proj_edge = nn.Dense(c.edge_dim, name="proj_edge")
        if c.use_attention:
            self.att = AttentionBlock(c.feat_dim, dtype=c.dtype)
        if c.use_gnn:
            self.gnn_layers = [
                DenseEdgeGNN(c.node_dim, c.edge_dim, c.node_dim,
                             dtype=c.dtype, name=f"gnn{i + 1}")
                for i in range(c.num_gnn_layers)]
        else:
            self.mlp = MLP2(c.edge_dim, c.edge_dim, dtype=c.dtype)
        # pose heads (posenet.py:967-975)
        self.fc_xyz = nn.Dense(3, name="fc_xyz")
        self.fc_wpqr = nn.Dense(3, name="fc_wpqr")
        self.fc_xyz_r = nn.Dense(3, name="fc_xyz_R")
        self.fc_wpqr_r = nn.Dense(3, name="fc_wpqr_R")
        self.dropout = nn.Dropout(rate=c.droprate)

    def encode_nodes(self, images: jax.Array, train: bool) -> jax.Array:
        """[B, N, H, W, 3] -> [B, N, feat_dim] through the shared backbone."""
        b, n = images.shape[:2]
        flat = images.reshape((b * n,) + images.shape[2:])
        feats = self.encoder(flat, train)  # positional: remat static argnum
        return feats.reshape(b, n, -1).astype(jnp.float32)

    def __call__(self, images: jax.Array, adj: jax.Array,
                 train: bool = False):
        x = self.encode_nodes(images, train)
        return self.from_embeddings(x, adj, train=train)

    def from_embeddings(self, x: jax.Array, adj: jax.Array,
                        train: bool = False):
        """Everything after the backbone: [B, N, feat] node embeddings ->
        (pred_abs, pred_rel, adj, aux).

        Split out so the serving path can reuse cached database-image
        embeddings (evaluation/serving.py) — the reference re-encodes all
        8 node images for every query (testing/test.py:211), although the 7
        neighbors are database frames whose features never change at eval.
        """
        c = self.cfg

        if c.use_attention:
            x = self.att(x)

        # Pre-GNN node embeddings: the reference builds its dynamic kNN graph
        # from these (posenet.py:1043-1050) and the eval protocol anchors on
        # an edge OF THAT GRAPH into node 0 (testing/test.py:227-229) — so
        # anchor selection must also use these, not the post-GNN states
        # (ADVICE.md r1 finding #2).
        x_pre_gnn = x

        # Compact edge-list mode: the per-pair chain (edge update, message,
        # attention, rel head) is pointwise in the pair, so computing it
        # only on the E real edges is exact — see DenseEdgeGNN docstring.
        edges = None
        use_compact = c.compact_edges and c.use_gnn

        # Dynamic kNN graph in feature space overrides the stored structure
        # (posenet.py:1043-1050).
        if c.knn > 0:
            if use_compact:
                adj, src, tgt = graph_ops.knn_edge_list(x, c.knn)
                edges = (src, tgt, jnp.ones(src.shape, bool))
            else:
                adj = graph_ops.knn_adjacency(x, c.knn)
        elif use_compact:
            edges = graph_ops.adj_edge_list(adj)

        # Initial edge features from index-ordered endpoint pairs
        # (posenet.py:1053-1055, 999-1019).
        if use_compact:
            e = graph_ops.edge_pair_features_compact(x, edges[0], edges[1])
        else:
            e = graph_ops.edge_pair_features(x)
        e = nn.relu(self.proj_edge(e))

        if c.use_gnn:
            for r in range(c.gnn_recursion):
                layer = self.gnn_layers[r % c.num_gnn_layers]
                x, e = layer(x, e, adj, edges=edges)
                x = nn.relu(x)
                e = nn.relu(e)
        else:
            e = self.mlp(e)

        deterministic = not (train or c.eval_dropout)
        if c.droprate > 0:
            x = self.dropout(x, deterministic=deterministic)
            e = self.dropout(e, deterministic=deterministic)

        if c.use_ap:
            pred_abs = jnp.concatenate(
                [self.fc_xyz(x), self.fc_wpqr(x)], axis=-1)
        else:
            # ablation path (posenet.py:1080-1083): absolute heads applied to
            # per-pair features -> [B, N, N, 6] instead of [B, N, 6]
            pair = graph_ops.edge_pair_features(x)
            pred_abs = jnp.concatenate(
                [self.fc_xyz(pair), self.fc_wpqr(pair)], axis=-1)

        pred_rel = jnp.concatenate(
            [self.fc_xyz_r(e), self.fc_wpqr_r(e)], axis=-1)
        if use_compact:
            # scatter compact per-edge predictions back into the dense
            # API grid (zeros at non-edges — never read by the protocol)
            pred_rel = graph_ops.scatter_edge_values(
                pred_rel, edges[0], edges[1], edges[2], x.shape[-2])
        # aux carries the PRE-GNN node embeddings so the evaluator can pick
        # the reference anchor neighbor — the first kNN edge into node 0 of
        # the graph built from backbone features (testing/test.py:227-229;
        # torch-cluster orders neighbors by distance, so "first edge" ==
        # nearest pre-GNN neighbor) — without a second backbone pass.
        # Post-GNN states are exposed separately for diagnostics.
        aux = {"node_feats": x_pre_gnn, "node_feats_post": x}
        return pred_abs, pred_rel, adj, aux

    @staticmethod
    def compute_rp(p: jax.Array) -> jax.Array:
        """Dense relative-pose targets RP[s, t] = p[s] - p[t]
        (posenet.py:1021-1031 vectorized)."""
        return graph_ops.relative_pose_targets(p)
