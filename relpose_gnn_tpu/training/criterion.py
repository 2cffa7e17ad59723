"""Pose regression criteria with learnable homoscedastic weights.

Functional port of `PoseNetCriterion` (modules/criterion.py:33-60):

    loss = exp(-sax) * L1(pred_t, targ_t) + sax
         + exp(-saq) * L1(pred_q, targ_q) + saq

`sax`/`saq` are learnable scalars optimized jointly with the model
(training/train.py:203-211 adds them to the Adam param list); here they live
in a small param pytree passed through the same optimizer.

The dense-graph variant takes an `[..., N, N]` edge mask so the mean matches
torch's `nn.L1Loss` mean over the E real edges only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_criterion_params(sax: float = 0.0, saq: float = 0.0) -> dict:
    return {"sax": jnp.asarray(sax, jnp.float32),
            "saq": jnp.asarray(saq, jnp.float32)}


def _masked_l1(pred: jax.Array, targ: jax.Array,
               mask: jax.Array | None) -> jax.Array:
    """Mean absolute error; with `mask` (broadcast over the feature axis) the
    mean is over unmasked positions only (matches nn.L1Loss over E edges)."""
    err = jnp.abs(pred - targ)
    if mask is None:
        return jnp.mean(err)
    w = mask.astype(err.dtype)[..., None]
    total = jnp.sum(err * w)
    count = jnp.sum(w) * err.shape[-1]
    return total / jnp.maximum(count, 1.0)


def pose_net_criterion(params: dict, pred: jax.Array, targ: jax.Array,
                       mask: jax.Array | None = None
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Homoscedastic-uncertainty L1 on [..., 6] = [t(3), logq(3)] poses.

    Returns (total_loss, t_loss, q_loss) like criterion.py:42-60.
    """
    t_loss = _masked_l1(pred[..., :3], targ[..., :3], mask)
    q_loss = _masked_l1(pred[..., 3:], targ[..., 3:], mask)
    loss = (jnp.exp(-params["sax"]) * t_loss + params["sax"]
            + jnp.exp(-params["saq"]) * q_loss + params["saq"])
    return loss, t_loss, q_loss


def pose_net_trans_criterion(params: dict, pred: jax.Array, targ: jax.Array,
                             mask: jax.Array | None = None) -> jax.Array:
    """Translation-only variant (criterion.py:63-85)."""
    t_loss = _masked_l1(pred[..., :3], targ[..., :3], mask)
    return jnp.exp(-params["sax"]) * t_loss + params["sax"]


def pose_net_rot_criterion(params: dict, pred: jax.Array, targ: jax.Array,
                           mask: jax.Array | None = None) -> jax.Array:
    """Rotation-only variant (criterion.py:88-110)."""
    q_loss = _masked_l1(pred[..., 3:], targ[..., 3:], mask)
    return jnp.exp(-params["saq"]) * q_loss + params["saq"]


def quaternion_loss(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Huynh quaternion distance `mean(1 - <q1,q2>^2)` (criterion.py:13-30)."""
    d = jnp.sum(q1 * q2, axis=-1)
    return jnp.mean(1.0 - d * d)


def init_mapnet_criterion_params(sax: float = -1.0, saq: float = -4.0,
                                 srx: float = -1.0, srq: float = -4.0) -> dict:
    return {"sax": jnp.asarray(sax, jnp.float32),
            "saq": jnp.asarray(saq, jnp.float32),
            "srx": jnp.asarray(srx, jnp.float32),
            "srq": jnp.asarray(srq, jnp.float32)}


def mapnet_criterion(params: dict, pred: jax.Array, targ: jax.Array
                     ) -> jax.Array:
    """Absolute + consecutive-VO loss (criterion.py:113-168).

    pred/targ: [B, T, 6]; VO terms from vectorized `calc_vos_simple`.
    """
    abs_loss = (jnp.exp(-params["sax"]) * _masked_l1(pred[..., :3],
                                                     targ[..., :3], None)
                + params["sax"]
                + jnp.exp(-params["saq"]) * _masked_l1(pred[..., 3:],
                                                       targ[..., 3:], None)
                + params["saq"])
    pred_vos = pred[..., 1:, :] - pred[..., :-1, :]
    targ_vos = targ[..., 1:, :] - targ[..., :-1, :]
    vo_loss = (jnp.exp(-params["srx"]) * _masked_l1(pred_vos[..., :3],
                                                    targ_vos[..., :3], None)
               + params["srx"]
               + jnp.exp(-params["srq"]) * _masked_l1(pred_vos[..., 3:],
                                                      targ_vos[..., 3:], None)
               + params["srq"])
    return abs_loss + vo_loss
