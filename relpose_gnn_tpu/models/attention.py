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
[..., N, N, C] message tensors, i.e. in the production R3 config this
block runs on EVERY message of every GNN recursion (the model-level
`use_attention` flag is a separate, off-by-default ablation).  On the
XLA path the [..., C/8, C/8] logit tensor is materialised in HBM — pure
bandwidth waste that the fused Pallas core (ops/att_pallas.py) avoids.

Kernel gating (trace-time):
  * explicit `use_pallas` / module-level USE_PALLAS_DEFAULT force a branch;
  * auto = TPU backend + lane-aligned bottleneck (C/8 % 128 == 0);
  * under an ambient mesh (jax.set_mesh context with >1 device) the kernel
    runs through the shard_map wrapper `attention_core_sharded` — the E
    axis shards over `data` with no collectives — provided E divides the
    axis; otherwise the XLA branch (which GSPMD partitions natively) is
    used and logged once (this fallback applies to FORCED Pallas too —
    forcing never trips the wrapper's divisibility assert).  Pure-TP
    meshes (data axis size 1) always take the XLA branch: rows are not
    sharded over `model`, so shard_mapping E over it would insert
    boundary collectives (ops/att_pallas.sharded_axis_for).  Programs
    with NO ambient mesh are single-device by construction (even on a
    multi-chip host), so they keep the plain kernel (ADVICE r2 #4).
    Repo convention: every multi-device program runs under
    `jax.set_mesh` (experiment.py, dryrun, tests).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

# Session-wide override for modules constructed without an explicit
# use_pallas (e.g. inside the GNN layers): None = auto (see module
# docstring), True/False = force.  A/B escape hatch; forcing True on a
# non-TPU backend runs the kernel in interpret mode (tests/dryrun).
USE_PALLAS_DEFAULT: bool | None = None

_logged_fallback = set()  # one log per distinct auto-disable reason


def _log_once(reason: str) -> None:
    if reason not in _logged_fallback:
        _logged_fallback.add(reason)
        import logging
        logging.getLogger("relpose_gnn_tpu").info(
            "AttentionBlock: fused Pallas kernel auto-disabled (%s); "
            "using the XLA branch (set models.attention.USE_PALLAS_DEFAULT "
            "to force)", reason)


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
        from relpose_gnn_tpu.ops.att_pallas import (attention_core,
                                                    attention_core_sharded,
                                                    sharded_axis_for)
        lead = phi_x.shape[:-1]
        e_total = 1
        for d in lead:
            e_total *= d
        mesh = jax.sharding.get_abstract_mesh()
        axis = sharded_axis_for(mesh)  # None = no/trivial ambient mesh

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = USE_PALLAS_DEFAULT
        if use_pallas is None:
            # auto: TPU backend + lane-aligned bottleneck.  No ambient
            # mesh -> the program is single-device (even on a multi-chip
            # host): plain kernel.  Ambient mesh -> shard_map wrapper,
            # provided E divides the data axis; else the XLA branch,
            # which GSPMD partitions natively.
            if jax.default_backend() != "tpu":
                use_pallas = False
            elif c8 % 128 != 0:
                use_pallas = False
                _log_once(f"bottleneck dim {c8} not lane-aligned")
            elif axis is not None and e_total % mesh.shape[axis] != 0:
                use_pallas = False
                _log_once(f"E={e_total} not divisible by mesh axis "
                          f"{axis}={mesh.shape[axis]}")
            else:
                use_pallas = True
        if use_pallas and axis is not None \
                and e_total % mesh.shape[axis] != 0:
            # forced-Pallas (use_pallas=True / USE_PALLAS_DEFAULT) under a
            # mesh axis that does not divide E: the shard_map wrapper
            # cannot host the kernel — fall back like the auto path
            # instead of tripping attention_core_sharded's assert
            use_pallas = False
            _log_once(f"E={e_total} not divisible by mesh axis "
                      f"{axis}={mesh.shape[axis]} (forced)")
        if use_pallas:
            # forcing True on a non-TPU backend (tests, CPU-mesh dryrun)
            # runs the kernel in interpret mode
            interpret = jax.default_backend() != "tpu"
            p2, t2, g2 = (a.reshape(-1, c8) for a in (phi_x, theta_x, g_x))
            if axis is not None:
                y = attention_core_sharded(p2, t2, g2, mesh,
                                           interpret=interpret)
            else:
                y = attention_core(p2, t2, g2, interpret=interpret)
            y = y.reshape(*lead, c8).astype(g_x.dtype)
        else:
            # same math as the kernel's parity oracle — call it, don't
            # re-implement it (divergence risk)
            from relpose_gnn_tpu.ops.att_pallas import attention_core_xla
            y = attention_core_xla(phi_x, theta_x, g_x)  # rows over j
        return x + nn.Dense(self.in_channels, dtype=self.dtype, name="W")(y)
