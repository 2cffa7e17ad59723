"""Flax VGG16 convolutional trunk (NetVLAD encoder backbone).

Equivalent of torchvision `vgg16.features[:-1]` as used by the reference's
NetVLAD encoder (external/sanet_relocal_demo/relocal/vlad_encoder.py:17-25):
thirteen 3x3 conv+ReLU layers with 2x2 max-pools after each stage, final
max-pool dropped, output stride 16, 512 channels.  NHWC for TPU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import flax.linen as nn

# torchvision cfg 'D': channels per conv, 'M' = 2x2 max pool
VGG16_CFG: Sequence = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                       512, 512, 512, "M", 512, 512, 512)


class VGG16Features(nn.Module):
    """Conv trunk: [B, H, W, 3] -> [B, H/16, W/16, 512]."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype or x.dtype)
        conv_idx = 0
        for c in VGG16_CFG:
            if c == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(c, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
        return x
