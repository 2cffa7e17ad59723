"""Dense edge-featured message-passing GNN layers.

TPU-native re-design of the torch-geometric layers in
`modules/my_gnn_layer.py`.  The reference operates on sparse edge lists with
CUDA scatter-mean; our graphs are fixed-size (N nodes), so each layer works on
dense tensors

    x   : [..., N, D]       node features
    e   : [..., N, N, De]   edge features for every ordered pair (s, t)
    adj : [..., N, N]       boolean adjacency mask (s -> t)

and every MLP application is one big batched matmul over N*N pairs — padded
dense compute that XLA maps straight onto the MXU, instead of gather/scatter.
Masked positions are computed and discarded; for N=8 that waste is at most
2x and buys fully static shapes.

Layer semantics match `simpleConvEdge_upt` (my_gnn_layer.py:277-311), the
production layer:

    e'[s,t]  = MLP_edge([x_s, x_t, e_st])             (edge update, :295-297)
    msg[s,t] = Att(MLP_msg([x_s, e'_st]))             (message, :304-307;
               note x_j == x[row] == source features under the default
               'source_to_target' flow)
    aggr[t]  = mean over {s : adj[s,t]} of msg[s,t]   (aggr='mean', :279)
    x'[t]    = MLP_upd([x_t, aggr[t]])                (update, :309-311)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relpose_gnn_tpu.models.attention import AttentionBlock
from relpose_gnn_tpu.ops.graph import (compact_mean_aggregate,
                                       masked_mean_aggregate)


class MLP2(nn.Module):
    """Linear -> ReLU -> Linear (the `Seq(Linear, ReLU, Linear)` unit used by
    every reference GNN MLP, my_gnn_layer.py:224-239)."""

    hidden: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class _LinParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias}) so
    PairMLP2 checkpoints are interchangeable with MLP2's."""

    in_dim: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_dim, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))


class PairMLP2(nn.Module):
    """MLP2 over all ordered node pairs, computed in split-weight form.

    The concat formulation applies fc1 to [x_src | x_tgt | e] per pair —
    re-multiplying each node's features N times (once per partner).  Here
    fc1's kernel (stored in the SAME concat layout [sum(in), hidden] as
    MLP2, so converted reference checkpoints load unchanged) is sliced per
    operand: node operands hit the MXU once at [B, N, D] and broadcast-add
    into the [B, N, N, hidden] grid where only the edge operand pays
    per-pair FLOPs.  At the production config (N=8, D=2048) this cuts the
    GNN's FLOPs by ~36% and removes the [B*N*N, 3D] concat buffer; it is
    exactly the same function up to float summation order.

    Measured (v5e, B=256, R3): serving-path GNN FLOPs 1914 -> 1313 GFLOP;
    together with the fused attention kernel (ops/att_pallas.py) the GNN
    stage went 53.8 -> 13.1 ms.  DESIGN.md "serving roofline" has the
    full bisect.

    `operands`: sequence of (array, kind) with kind 's' ([B.., N, D]
    broadcast over the target axis), 't' ([B.., N, D] broadcast over the
    source axis) or 'e' ([B.., N, N, De]).  Kind order must match the
    reference's concat order for checkpoint parity.

    Compact edge-list mode: with `src`/`tgt` (int [B.., E] endpoint
    indices), node operands keep the one-matmul-per-node slab form but
    the [B.., N, H] slab outputs are GATHERED to the edge list instead of
    broadcast into the N x N grid, and 'e' operands are compact
    [B.., E, De] — so fc2 and the edge slab pay E instead of N^2 pair
    FLOPs (half at the production kNN serving graph: E = N*k = 32 vs 64).
    Same per-edge values as the dense grid (checkpoints unchanged).
    """

    in_dims: tuple
    hidden: int
    out: int
    dtype: Any = None

    def setup(self):
        self.fc1 = _LinParams(sum(self.in_dims), self.hidden)
        self.fc2 = _LinParams(self.hidden, self.out)

    def __call__(self, operands, src: jax.Array | None = None,
                 tgt: jax.Array | None = None) -> jax.Array:
        assert len(operands) == len(self.in_dims)
        assert (src is None) == (tgt is None)
        k1 = self.fc1.kernel
        dt = self.dtype or k1.dtype

        def take(part, idx):  # [.., N, H] -> [.., E, H] at edge endpoints
            return jnp.take_along_axis(part, idx[..., None], axis=-2)

        h = None
        off = 0
        for (arr, kind), d in zip(operands, self.in_dims):
            assert arr.shape[-1] == d, (arr.shape, d)
            slab = k1[off:off + d]
            off += d
            part = jnp.dot(arr.astype(dt), slab.astype(dt))
            if kind == "s":                      # [.., N, H] -> source rows
                part = take(part, src) if src is not None \
                    else part[..., :, None, :]
            elif kind == "t":                    # [.., N, H] -> target cols
                part = take(part, tgt) if tgt is not None \
                    else part[..., None, :, :]
            else:
                assert kind == "e", kind
            h = part if h is None else h + part
        h = nn.relu(h + self.fc1.bias.astype(dt))
        return (jnp.dot(h, self.fc2.kernel.astype(dt))
                + self.fc2.bias.astype(dt))


class DenseEdgeGNN(nn.Module):
    """Dense equivalent of `simpleConvEdge_upt` (my_gnn_layer.py:277-311).

    Two computation modes over the SAME parameters:
      * dense grid (edges=None): e is [.., N, N, De], every ordered pair
        computed, masked-mean aggregation — fully static, adjacency can
        be anything.
      * compact edge list (edges=(src, tgt, emask), each [.., E]): e is
        [.., E, De], only listed edges pay pair FLOPs; aggregation is a
        one-hot matmul.  Exact same per-edge math (tests assert equality
        to the dense grid at every real edge) — at the production kNN
        serving graph (k=4, N=8 -> E=32 vs 64 pairs) this halves the GNN
        stage's message/attention work.
    """

    node_dim: int
    edge_dim: int
    out_dim: int
    use_attention: bool = True
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay fp32

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array, adj: jax.Array,
                 edges: tuple[jax.Array, jax.Array, jax.Array] | None = None
                 ) -> tuple[jax.Array, jax.Array]:
        d = x.shape[-1]
        src, tgt, emask = edges if edges is not None else (None, None, None)

        # Edge update: e' = MLP([x_source, x_target, e]) — split-weight
        # form: node slabs hit the MXU once per node, not once per pair
        e_new = PairMLP2((d, d, e.shape[-1]), self.edge_dim, self.edge_dim,
                         dtype=self.dtype, name="edge_mlp")(
            [(x, "s"), (x, "t"), (e, "e")], src, tgt)

        # Message: m = Att(MLP([x_source, e']))
        msg = PairMLP2((d, self.edge_dim), self.out_dim, self.out_dim,
                       dtype=self.dtype, name="msg_mlp")(
            [(x, "s"), (e_new, "e")], src, tgt)
        if self.use_attention:
            msg = AttentionBlock(self.out_dim, dtype=self.dtype,
                                 name="att")(msg)

        # Mean aggregation at targets (scatter-mean semantics).
        if edges is not None:
            aggr = compact_mean_aggregate(msg, tgt, emask, x.shape[-2])
        else:
            aggr = masked_mean_aggregate(msg, adj)

        # Node update: x' = MLP([x, aggr])
        x_new = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                     name="upd_mlp")(jnp.concatenate([x, aggr], axis=-1))
        return x_new, e_new


class EdgeModelAtt(nn.Module):
    """Dense equivalent of `simpleEdgeModelAtt` (my_gnn_layer.py:203-221):
    edge update MLP followed by an AttentionBlock on the edge output.

    Unused-ablation parity note: the reference constructs
    `AttentionBlock(in_channels)` but applies it to the `out_channels`-dim
    MLP output (:214, :220) — it only runs when in == out; we parameterize
    the attention by the output dim, the only working configuration.
    """

    node_dim: int
    edge_dim: int
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array) -> jax.Array:
        d = x.shape[-1]
        e_new = PairMLP2((d, d, e.shape[-1]), self.out_dim, self.out_dim,
                         dtype=self.dtype, name="edge_mlp")(
            [(x, "s"), (x, "t"), (e, "e")])
        return AttentionBlock(self.out_dim, dtype=self.dtype,
                              name="att")(e_new)


class DenseEdgeGNNSplit(nn.Module):
    """Dense equivalent of `simpleConvEdge2` (my_gnn_layer.py:355-391):
    split-head message `concat(mlp1([x_t, x_s, e']), mlp2([x_t, x_s, e']))`
    (PyG message(x_i, x_j, e): target-then-source order), mean-aggregated;
    the aggregate IS the new node state (no update MLP).  Node output dim is
    2 * out_dim."""

    node_dim: int
    edge_dim: int
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array,
                 adj: jax.Array) -> tuple[jax.Array, jax.Array]:
        d = x.shape[-1]
        e_new = PairMLP2((d, d, e.shape[-1]), self.edge_dim, self.edge_dim,
                         dtype=self.dtype, name="edge_mlp")(
            [(x, "s"), (x, "t"), (e, "e")])
        # PyG message(x_i, x_j, e): target-then-source order
        m_ops = [(x, "t"), (x, "s"), (e_new, "e")]
        m_dims = (d, d, self.edge_dim)
        p1 = PairMLP2(m_dims, self.out_dim, self.out_dim, dtype=self.dtype,
                      name="mlp1")(m_ops)
        p2 = PairMLP2(m_dims, self.out_dim, self.out_dim, dtype=self.dtype,
                      name="mlp2")(m_ops)
        msg = jnp.concatenate([p1, p2], axis=-1)
        return masked_mean_aggregate(msg, adj), e_new


class DenseEdgeGNNGated(nn.Module):
    """Dense equivalent of `simpleConvEdge_upt_att` (my_gnn_layer.py:314-352):
    message uses [x_s, x_t, e'] and a sigmoid gate MLP on e'."""

    node_dim: int
    edge_dim: int
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array,
                 adj: jax.Array) -> tuple[jax.Array, jax.Array]:
        d = x.shape[-1]
        e_new = PairMLP2((d, d, e.shape[-1]), self.edge_dim, self.edge_dim,
                         dtype=self.dtype, name="edge_mlp")(
            [(x, "s"), (x, "t"), (e, "e")])
        # PyG message(x_i, x_j, e): TARGET-then-source order
        # (my_gnn_layer.py:343-344) — unlike the production layer's
        # [x_source, e'] message
        msg = PairMLP2((d, d, self.edge_dim), self.out_dim, self.out_dim,
                       dtype=self.dtype, name="msg_mlp")(
            [(x, "t"), (x, "s"), (e_new, "e")])
        gate = nn.sigmoid(MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                               name="gate_mlp")(e_new))
        aggr = masked_mean_aggregate(msg * gate, adj)
        x_new = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                     name="upd_mlp")(jnp.concatenate([x, aggr], axis=-1))
        return x_new, e_new


class DenseEdgeGNNNoUpdate(nn.Module):
    """Dense equivalent of `simpleConvEdge` (my_gnn_layer.py:242-274):
    edge update like the production layer, but the message MLP reads
    [x_target, x_source, e'] and the aggregated mean IS the new node state
    (no update MLP)."""

    node_dim: int
    edge_dim: int
    out_dim: int
    use_attention: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array,
                 adj: jax.Array) -> tuple[jax.Array, jax.Array]:
        d = x.shape[-1]
        e_new = PairMLP2((d, d, e.shape[-1]), self.edge_dim, self.edge_dim,
                         dtype=self.dtype, name="edge_mlp")(
            [(x, "s"), (x, "t"), (e, "e")])
        # PyG message(x_i, x_j, e): target-then-source order (:266-274)
        msg = PairMLP2((d, d, self.edge_dim), self.out_dim, self.out_dim,
                       dtype=self.dtype, name="msg_mlp")(
            [(x, "t"), (x, "s"), (e_new, "e")])
        if self.use_attention:
            msg = AttentionBlock(self.out_dim, dtype=self.dtype,
                                 name="att")(msg)
        return masked_mean_aggregate(msg, adj), e_new


class EdgeConvRotDense(nn.Module):
    """Dense equivalent of `EdgeConvRot` (my_gnn_layer.py:415-449).

    Flow is 'target_to_source': messages aggregate (mean) at the *source*
    node.  Message = MLP([x_s, x_t, e]) when node features are wide, or
    MLP0(e) for the narrow (pose-only) ablation (:432-440).  Returns
    (aggregated messages [.., N, D], per-edge messages [.., N, N, D])."""

    node_dim: int
    edge_dim: int
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array,
                 adj: jax.Array) -> tuple[jax.Array, jax.Array]:
        n = x.shape[-2]
        xs = jnp.broadcast_to(x[..., :, None, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))
        xt = jnp.broadcast_to(x[..., None, :, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))
        if x.shape[-1] > 5:
            msg = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                       name="mlp")(jnp.concatenate([xs, xt, e], axis=-1))
        else:
            msg = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                       name="mlp0")(e)
        # aggregate at the source: mean over targets t with adj[s, t]
        m = adj.astype(msg.dtype)[..., None]
        s = jnp.sum(msg * m, axis=-2)
        cnt = jnp.sum(m, axis=-2)
        return s / jnp.maximum(cnt, 1.0), msg


def cosine_gate(x_i: jax.Array, x_j: jax.Array) -> jax.Array:
    """Channelwise sigmoid(cosine similarity) attention gate
    (`batch_cosine_similarity`, my_gnn_layer.py:12-43): features viewed as
    [..., C, P], cosine over P per channel, sigmoid."""
    num = jnp.sum(x_i * x_j, axis=-1)
    den = (jnp.linalg.norm(x_i, axis=-1)
           * jnp.linalg.norm(x_j, axis=-1))
    return jax.nn.sigmoid(num / jnp.maximum(den, 1e-8))


class ConvMapGNN(nn.Module):
    """Dense equivalent of the conv-map message-passing layer `myGNN`
    (my_gnn_layer.py:46-176): node states are unpooled feature maps
    [..., N, H, W, C]; message/edge/update are two-layer 3x3 conv+BN+ReLU
    stacks on channel-concatenated maps; aggregation is masked sum
    (aggr='add', :49); optional cosine-similarity attention gate (:157).

    Ablation-scale component — the production models pool before the GNN.
    """

    channels: int
    use_attention: bool = False
    dtype: Any = None

    def _conv_stack(self, name: str, x: jax.Array, train: bool) -> jax.Array:
        for layer in (1, 2):
            x = nn.Conv(self.channels, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype, name=f"{name}_conv{layer}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"{name}_bn{layer}")(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array, adj: jax.Array,
                 train: bool = False) -> tuple[jax.Array, jax.Array]:
        """x: [B, N, H, W, C]; e: [B, N, N, H, W, Ce]; adj: [B, N, N]."""
        b, n, h, w, c = x.shape
        xs = jnp.broadcast_to(x[:, :, None], (b, n, n, h, w, c))
        xt = jnp.broadcast_to(x[:, None, :], (b, n, n, h, w, c))

        # edge update (EdgeModel, my_gnn_layer.py:178-200)
        e_in = jnp.concatenate([xs, xt, e], axis=-1).reshape(
            b * n * n, h, w, -1)
        e_new = self._conv_stack("edge", e_in, train).reshape(
            b, n, n, h, w, self.channels)

        # message (conv_message on [x_i, x_j, e'], :138-160; x_i = target)
        m_in = jnp.concatenate(
            [xt, xs, e_new], axis=-1).reshape(b * n * n, h, w, -1)
        msg = self._conv_stack("message", m_in, train).reshape(
            b, n, n, h, w, self.channels)
        if self.use_attention:
            gate = cosine_gate(
                jnp.swapaxes(xt.reshape(b, n, n, h * w, c), -1, -2),
                jnp.swapaxes(xs.reshape(b, n, n, h * w, c), -1, -2))
            msg = msg * gate[:, :, :, None, None, :]

        # masked SUM aggregation at targets (aggr='add')
        mask = adj.astype(msg.dtype)[..., None, None, None]
        aggr = jnp.sum(msg * mask, axis=1)  # over sources

        # node update (conv_updating on [x, aggr], :162-171)
        u_in = jnp.concatenate([x, aggr], axis=-1).reshape(b * n, h, w, -1)
        x_new = self._conv_stack("update", u_in, train).reshape(
            b, n, h, w, self.channels)
        return x_new, e_new


class DenseConv(nn.Module):
    """Dense equivalent of the edge-less `simpleConv`
    (my_gnn_layer.py:394-412): msg = MLP([x_t, x_s]), mean-aggregated.
    No node-update MLP; returns aggregated messages directly."""

    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        d = x.shape[-1]
        # PyG message(x_i, x_j) concatenates target-then-source (:407-412)
        msg = PairMLP2((d, d), self.out_dim, self.out_dim,
                       dtype=self.dtype, name="msg_mlp")(
            [(x, "t"), (x, "s")])
        return masked_mean_aggregate(msg, adj)
