"""NetVLAD pooling + full image-retrieval encoder.

Re-design of the reference NetVLAD
(external/sanet_relocal_demo/relocal/vlad_net.py:9-89): the per-cluster
Python loop over 64 clusters (vlad_net.py:79-83, a deliberate
memory-for-speed tradeoff on GPU) becomes two einsums — one soft-assignment
matmul and one residual-aggregation matmul — which XLA fuses and tiles onto
the MXU.

    a[n, p, k]   = softmax_k(conv1x1(x))            soft assignment
    vlad[n,k,c]  = sum_p a[n,p,k] * x[n,p,c]  -  (sum_p a[n,p,k]) * cent[k,c]

followed by intra-normalization over c, flatten, and L2 normalization
(vlad_net.py:85-88).  Output: [B, num_clusters * dim] = [B, 32768].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relpose_gnn_tpu.models.vgg import VGG16Features

_EPS = 1e-12


def _l2norm(x: jax.Array, axis: int) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), _EPS)


class NetVLAD(nn.Module):
    num_clusters: int = 64
    dim: int = 512
    normalize_input: bool = True
    vladv2: bool = False  # vladv1: assignment conv has no bias
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: [B, H, W, C] feature map -> [B, K*C] VLAD descriptor."""
        b = x.shape[0]
        if self.normalize_input:
            x = _l2norm(x, axis=-1)  # across descriptor dim (vlad_net.py:69)

        assign = nn.Conv(self.num_clusters, (1, 1), use_bias=self.vladv2,
                         dtype=self.dtype, name="assign_conv")(x)
        flat_x = x.reshape(b, -1, self.dim)                   # [B, P, C]
        flat_a = jax.nn.softmax(assign.reshape(b, -1, self.num_clusters),
                                axis=-1)                      # [B, P, K]

        centroids = self.param("centroids", nn.initializers.uniform(1.0),
                               (self.num_clusters, self.dim))

        agg = jnp.einsum("bpk,bpc->bkc", flat_a, flat_x)      # [B, K, C]
        mass = jnp.sum(flat_a, axis=1)                        # [B, K]
        vlad = agg - mass[..., None] * centroids[None]
        vlad = _l2norm(vlad.astype(jnp.float32), axis=-1)     # intra-norm
        vlad = vlad.reshape(b, -1)
        return _l2norm(vlad, axis=-1)                         # final L2


class NetVLADEncoder(nn.Module):
    """VGG16 trunk + NetVLAD pooling: the full retrieval descriptor model
    (vlad_encoder.py:17-36 equivalent; weights convertible from the released
    `netvlad_vgg16.tar` via models/convert.py)."""

    num_clusters: int = 64
    encoder_dim: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: [B, H, W, 3] (ImageNet-normalized) -> [B, 32768]."""
        feats = VGG16Features(dtype=self.dtype, name="encoder")(images)
        return NetVLAD(num_clusters=self.num_clusters, dim=self.encoder_dim,
                       dtype=self.dtype, name="pool")(feats)
