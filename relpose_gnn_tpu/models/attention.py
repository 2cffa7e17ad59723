"""Bottleneck self-attention block over the channel axis.

Reference: `AttentionBlock` (modules/att.py:7-34).  For each item the block
projects the C-dim feature into three C/8-dim vectors (g, theta, phi), forms
the rank-1 logit matrix

    f[i, j] = phi(x)_i * theta(x)_j            # [C/8, C/8] outer product

softmaxes each *row* over j (att.py:26, `softmax(dim=-1)`), and mixes g(x)
across bottleneck channels with those weights:

    y_i = sum_j softmax_j(phi_i * theta_j) * g_j
    z   = x + W(y)

Although the "sequence" has length one, the softmax runs over the C/8
bottleneck axis and is NOT a no-op: theta/phi are live parameters.  (An
earlier revision of this module wrongly reduced the block to x + W(g(x));
see ADVICE.md round 1, finding #1.)

Leading dims are arbitrary — the GNN applies this per edge on
[..., N, N, C] message tensors.  The [..., C/8, C/8] logit tensor is
materialised; at the production dim 2048 that is a 256x256 block per item,
which XLA fuses with the surrounding matmuls (production configs have
use_attention=False, so this path is ablation-scale).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

# Session-wide override for modules constructed without an explicit
# use_pallas (e.g. inside the GNN layers): None = auto (TPU + lane-aligned
# bottleneck), True/False = force.  A/B escape hatch.
USE_PALLAS_DEFAULT: bool | None = None


class AttentionBlock(nn.Module):
    in_channels: int
    dtype: Any = None  # compute dtype; params stay fp32
    use_pallas: bool | None = None  # None = auto (TPU + lane-aligned C/8)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c8 = self.in_channels // 8
        g_x = nn.Dense(c8, dtype=self.dtype, name="g")(x)
        theta_x = nn.Dense(c8, dtype=self.dtype, name="theta")(x)
        phi_x = nn.Dense(c8, dtype=self.dtype, name="phi")(x)
        # f = phi_x @ theta_x^T with both viewed as [.., C/8, 1] (att.py:20-25)
        # then row-softmax over j and mixing of g (att.py:26-28).  On TPU
        # the [.., C/8, C/8] logits are pure HBM waste (three consumers, so
        # XLA materializes them); the fused Pallas core keeps them in VMEM
        # (ops/att_pallas.py, measured ~23x on the production shape).
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = USE_PALLAS_DEFAULT
        if use_pallas is None:
            # auto: single TPU chip with a lane-aligned bottleneck only.
            # Under a multi-device mesh the Mosaic custom call has no SPMD
            # partitioning rule, so GSPMD would replicate/all-gather the
            # sharded activations (or fail to partition); the XLA branch
            # shards cleanly, so multi-chip keeps it until the kernel
            # grows a shard_map/custom-partitioning wrapper.
            use_pallas = (jax.default_backend() == "tpu"
                          and len(jax.devices()) == 1 and c8 % 128 == 0)
        if use_pallas:
            from relpose_gnn_tpu.ops.att_pallas import attention_core
            lead = phi_x.shape[:-1]
            y = attention_core(phi_x.reshape(-1, c8),
                               theta_x.reshape(-1, c8),
                               g_x.reshape(-1, c8))
            y = y.reshape(*lead, c8).astype(g_x.dtype)
        else:
            # same math as the kernel's parity oracle — call it, don't
            # re-implement it (divergence risk)
            from relpose_gnn_tpu.ops.att_pallas import attention_core_xla
            y = attention_core_xla(phi_x, theta_x, g_x)  # rows over j
        return x + nn.Dense(self.in_channels, dtype=self.dtype, name="W")(y)
