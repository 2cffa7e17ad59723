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
from relpose_gnn_tpu.ops.graph import masked_mean_aggregate


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


class DenseEdgeGNN(nn.Module):
    """Dense equivalent of `simpleConvEdge_upt` (my_gnn_layer.py:277-311)."""

    node_dim: int
    edge_dim: int
    out_dim: int
    use_attention: bool = True
    dtype: Any = None  # compute dtype (e.g. jnp.bfloat16); params stay fp32

    @nn.compact
    def __call__(self, x: jax.Array, e: jax.Array,
                 adj: jax.Array) -> tuple[jax.Array, jax.Array]:
        n = x.shape[-2]
        xs = jnp.broadcast_to(x[..., :, None, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))
        xt = jnp.broadcast_to(x[..., None, :, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))

        # Edge update: e' = MLP([x_source, x_target, e])
        e_new = MLP2(self.edge_dim, self.edge_dim, dtype=self.dtype,
                     name="edge_mlp")(
            jnp.concatenate([xs, xt, e], axis=-1))

        # Message: m = Att(MLP([x_source, e']))
        msg = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                   name="msg_mlp")(jnp.concatenate([xs, e_new], axis=-1))
        if self.use_attention:
            msg = AttentionBlock(self.out_dim, name="att")(msg)

        # Masked mean aggregation at targets (scatter-mean semantics).
        aggr = masked_mean_aggregate(msg, adj)

        # Node update: x' = MLP([x, aggr])
        x_new = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                     name="upd_mlp")(jnp.concatenate([x, aggr], axis=-1))
        return x_new, e_new


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
        n = x.shape[-2]
        xs = jnp.broadcast_to(x[..., :, None, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))
        xt = jnp.broadcast_to(x[..., None, :, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))
        e_new = MLP2(self.edge_dim, self.edge_dim, dtype=self.dtype,
                     name="edge_mlp")(jnp.concatenate([xs, xt, e], axis=-1))
        msg = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                   name="msg_mlp")(jnp.concatenate([xs, xt, e_new], axis=-1))
        gate = nn.sigmoid(MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                               name="gate_mlp")(e_new))
        aggr = masked_mean_aggregate(msg * gate, adj)
        x_new = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                     name="upd_mlp")(jnp.concatenate([x, aggr], axis=-1))
        return x_new, e_new


class DenseConv(nn.Module):
    """Dense equivalent of the edge-less `simpleConv`
    (my_gnn_layer.py:394-412): msg = MLP([x_t, x_s]), mean-aggregated.
    No node-update MLP; returns aggregated messages directly."""

    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        n = x.shape[-2]
        xs = jnp.broadcast_to(x[..., :, None, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))
        xt = jnp.broadcast_to(x[..., None, :, :],
                              x.shape[:-2] + (n, n, x.shape[-1]))
        # PyG message(x_i, x_j) concatenates target-then-source (:407-412)
        msg = MLP2(self.out_dim, self.out_dim, dtype=self.dtype,
                   name="msg_mlp")(jnp.concatenate([xt, xs], axis=-1))
        return masked_mean_aggregate(msg, adj)
