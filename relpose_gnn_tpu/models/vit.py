"""ViT node encoder — the stretch backbone config (BASELINE.json configs[4]).

A standard pre-norm ViT (patchify -> transformer -> CLS readout -> linear
projection to `feat_dim`), ViT-B/16 by default.  Pretrained timm/DINOv2-
style checkpoints load through `models/convert.py::convert_vit` (fused-qkv
split, layer-scale gammas when present, bicubic pos-embed interpolation;
`training/checkpoints.py::load_vit_weights` is the warm-start entry).
The MLP GELU is the tanh approximation (jax.nn.gelu default) — exact-GELU
checkpoints (timm default) warm-start with a ~1e-3 activation delta, which
the from-scratch `fc` head absorbs.  Not present in the reference repo;
listed as the stretch node encoder in BASELINE.json.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    dtype: Any = None
    layer_scale: bool = False
    # ^ DINOv2-style LayerScale: per-channel learnable gamma on each
    #   residual branch (ls1 after attention, ls2 after the MLP).
    #   convert_vit enables it when the checkpoint carries ls gammas.

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype)(y, y)
        if self.layer_scale:
            y = y * self.param("ls1", nn.initializers.ones,
                               (self.dim,)).astype(y.dtype)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        if self.layer_scale:
            y = y * self.param("ls2", nn.initializers.ones,
                               (self.dim,)).astype(y.dtype)
        return x + y


class ViTEncoder(nn.Module):
    feat_dim: int = 2048
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    dtype: Any = None
    layer_scale: bool = False  # see TransformerBlock.layer_scale

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: [B, H, W, 3] -> [B, feat_dim].  H, W need not be multiples of
        `patch`; the trailing remainder rows/cols are cropped (static)."""
        del train  # no BN; dropout-free encoder
        b, h, w, _ = x.shape
        hp, wp = h // self.patch, w // self.patch
        x = x[:, :hp * self.patch, :wp * self.patch, :]
        x = x.astype(self.dtype or x.dtype)
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch_embed")(x)
        x = x.reshape(b, hp * wp, self.dim)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x],
                            axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, hp * wp + 1, self.dim))
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, dtype=self.dtype,
                                 layer_scale=self.layer_scale,
                                 name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.feat_dim, name="fc")(x[:, 0].astype(jnp.float32))
