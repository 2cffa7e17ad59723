"""Flax ResNet (NHWC, TPU-friendly) node encoder.

Re-implementation of the torchvision `resnet34` backbone the reference uses
(training/train.py:173, modules/posenet.py:941-945), with the classification
head replaced by `AdaptiveAvgPool2d(1)` + `Linear(512, feat_dim)` exactly as
the reference does.

TPU design notes:
  * NHWC layout (XLA's preferred conv layout on TPU).
  * Optional bfloat16 compute dtype; parameters and BatchNorm statistics stay
    float32 for stability.
  * BatchNorm uses running statistics at eval; `momentum=0.9` here equals
    torch's `momentum=0.1` convention (flax keeps `momentum` fraction of the
    old stat).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-ReLU-3x3-BN + projection shortcut.

    With `folded=True` the BN layers are gone and the convs carry a bias —
    the inference-time form produced by `fold_batchnorm` below."""

    filters: int
    stride: int = 1
    dtype: Any = None
    folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.folded:
            norm = lambda name: (lambda y: y)  # noqa: E731
        else:
            norm = lambda name: nn.BatchNorm(  # noqa: E731
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name)
        bias = self.folded
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=bias, dtype=self.dtype,
                    name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=bias,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape[-1] != self.filters or self.stride != 1:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=bias, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Generic BasicBlock ResNet trunk + pooled linear projection head."""

    stage_sizes: Sequence[int]
    feat_dim: int = 2048
    dtype: Any = None
    folded: bool = False  # BN folded into conv weights (inference form)
    s2d_stem: bool = False  # space-to-depth form of conv1 (serving form;
    #                         weights transformed by
    #                         fold_bn.space_to_depth_conv1 — NOT retrained)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: [B, H, W, 3] NHWC -> [B, feat_dim]."""
        x = x.astype(self.dtype or x.dtype)
        if self.s2d_stem:
            # Space-to-depth stem: the 7x7/s2 conv over 3 channels keeps
            # the MXU contraction dim at 3 (padded to the full register
            # lane, mostly wasted).  Mathematically identical form: pack
            # 2x2 pixel blocks into channels ([B,H/2,W/2,12]) and run the
            # transformed 4x4/s1 kernel (zero-padded 7->8, regrouped) with
            # asymmetric padding (2,1) — output bitwise-equivalent modulo
            # f32 reassociation (tests/test_fold_bn.py asserts <=1e-5).
            b, h, w, c = x.shape
            ph, pw = h % 2, w % 2
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            h2, w2 = (h + ph) // 2, (w + pw) // 2
            x = x.reshape(b, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(b, h2, w2, 4 * c)
            x = nn.Conv(64, (4, 4), strides=(1, 1),
                        padding=((2, 1), (2, 1)), use_bias=self.folded,
                        dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3,
                        use_bias=self.folded, dtype=self.dtype,
                        name="conv1")(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, num_blocks in enumerate(self.stage_sizes):
            filters = 64 * (2 ** stage)
            for block in range(num_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(filters, stride=stride, dtype=self.dtype,
                               folded=self.folded,
                               name=f"layer{stage + 1}_{block}")(x, train)

        # AdaptiveAvgPool2d(1) + Linear(512 -> feat_dim)
        # (modules/posenet.py:941-945); accumulate the mean in fp32.
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.feat_dim, name="fc")(x)


def ResNet34(feat_dim: int = 2048, dtype: Any = None) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), feat_dim=feat_dim, dtype=dtype)


def ResNet18(feat_dim: int = 2048, dtype: Any = None) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), feat_dim=feat_dim, dtype=dtype)
