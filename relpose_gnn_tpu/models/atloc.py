"""Absolute-pose baselines: PoseNet, MapNet, AtLoc(+), FourDirectionalLSTM.

TPU-native equivalents of the reference's baseline model family
(modules/att.py:37-133 `FourDirectionalLSTM`/`AtLoc`/`AtLocPlus`;
modules/posenet.py:39-105 `PoseNet`/`MapNet`).  All share the ResNet34
trunk with `AdaptiveAvgPool2d(1)` + `Linear(512, feat_dim)` head
replacement and regress pose6 = [t(3), logq(3)].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from relpose_gnn_tpu.models.attention import AttentionBlock
from relpose_gnn_tpu.models.resnet import ResNet


class FourDirectionalLSTM(nn.Module):
    """Bidirectional LSTMs over a feature map folded two ways
    (att.py:37-64): the feature vector reshaped to [seq, feat] is scanned
    left-right and (transposed) up-down; the four final hidden states
    concatenate to [4 * hidden].

    The reference initializes LSTM hidden states with *random noise each
    forward* (att.py:48-50); we default to zeros (deterministic) and expose
    `random_init` for faithful replication.
    """

    seq_size: int = 32
    origin_feat_size: int = 2048
    hidden_size: int = 256
    random_init: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        feat = self.origin_feat_size // self.seq_size
        x_rl = x.reshape(b, self.seq_size, feat)
        x_du = jnp.swapaxes(x_rl, 1, 2)

        def bidir_lstm(name, seq, in_feat):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"{name}_fwd")
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         reverse=True, name=f"{name}_bwd")
            if self.random_init:
                rng = self.make_rng("lstm_init")
                k1, k2 = jax.random.split(rng)
                carry_f = (jax.random.normal(k1, (b, self.hidden_size)),
                           jax.random.normal(k2, (b, self.hidden_size)))
                hf = fwd(seq, initial_carry=carry_f)
                hb = bwd(seq, initial_carry=carry_f)
            else:
                hf = fwd(seq)
                hb = bwd(seq)
            # flax RNN(reverse=True, keep_order=False) emits outputs in
            # PROCESSING order: [:, -1] is the backward LSTM's final
            # hidden after consuming the whole sequence (reference
            # att.py:58-63 concatenates hidden_state[1]); [:, 0] would be
            # a one-step encoding of the original last element (verified
            # empirically — review finding)
            return hf[:, -1], hb[:, -1]

        h_lr_f, h_lr_b = bidir_lstm("rightleft", x_rl, feat)
        h_du_f, h_du_b = bidir_lstm("downup", x_du, self.seq_size)
        return jnp.concatenate([h_lr_f, h_lr_b, h_du_f, h_du_b], axis=1)


class PoseNet(nn.Module):
    """Plain absolute-pose regressor: backbone -> relu -> dropout -> heads
    (posenet.py:39-76 semantics)."""

    feat_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = ResNet(stage_sizes=(3, 4, 6, 3), feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(images, train=train)
        x = nn.relu(x)
        if self.droprate > 0:
            x = nn.Dropout(self.droprate)(
                x, deterministic=not (train or self.eval_dropout))
        xyz = nn.Dense(3, name="fc_xyz")(x)
        wpqr = nn.Dense(3, name="fc_wpqr")(x)
        return jnp.concatenate([xyz, wpqr], axis=1)


class PoseNetNoLog(nn.Module):
    """PoseNet variant with a 4-D quaternion head instead of the 3-D logq
    head (`PoseNet_nolog`, posenet.py:1258): predicts [t(3), q(4)]."""

    feat_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = ResNet(stage_sizes=(3, 4, 6, 3), feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(images, train=train)
        x = nn.relu(x)
        if self.droprate > 0:
            x = nn.Dropout(self.droprate)(
                x, deterministic=not (train or self.eval_dropout))
        xyz = nn.Dense(3, name="fc_xyz")(x)
        wpqr = nn.Dense(4, name="fc_wpqr")(x)
        return jnp.concatenate([xyz, wpqr], axis=1)


class MapNet(nn.Module):
    """PoseNet applied framewise to a sequence [B, T, H, W, 3] -> [B, T, 6]
    (posenet.py:79-105); pairs with `mapnet_criterion` (abs + VO terms).

    Reference quirk NOT replicated: `MapNet.forward` reshapes the
    [N, T, C, H, W] blob with `view(N, 3, 256, -1)` (posenet.py:99),
    folding the T frames into the WIDTH axis of a single image instead of
    the batch axis (the sane `view(-1, *s[2:])` is commented out at :100).
    That collapses a sequence into one 3x256x(T*W) pseudo-image — a
    layout accident with no usable semantics; this module applies the
    regressor per frame, which is what the MapNet paper and the
    commented-out line specify."""

    feat_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        b, t = images.shape[:2]
        flat = images.reshape((b * t,) + images.shape[2:])
        poses = PoseNet(self.feat_dim, self.droprate, self.eval_dropout,
                        self.dtype, name="posenet")(flat, train=train)
        return poses.reshape(b, t, 6)


class AtLoc(nn.Module):
    """Attention-guided absolute pose regression (att.py:67-120):
    backbone -> relu -> AttentionBlock (or FourDirectionalLSTM) ->
    dropout -> heads."""

    feat_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    lstm: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        x = ResNet(stage_sizes=(3, 4, 6, 3), feat_dim=self.feat_dim,
                   dtype=self.dtype, name="encoder")(images, train=train)
        x = nn.relu(x)
        if self.lstm:
            x = FourDirectionalLSTM(seq_size=32,
                                    origin_feat_size=self.feat_dim,
                                    hidden_size=256, name="lstm4dir")(x)
        else:
            x = AttentionBlock(self.feat_dim, name="att")(x)
        if self.droprate > 0:
            x = nn.Dropout(self.droprate)(
                x, deterministic=not (train or self.eval_dropout))
        xyz = nn.Dense(3, name="fc_xyz")(x)
        wpqr = nn.Dense(3, name="fc_wpqr")(x)
        return jnp.concatenate([xyz, wpqr], axis=1)


class AtLocPlus(nn.Module):
    """Sequence wrapper around AtLoc (att.py:123-133): [B, T, H, W, 3] ->
    [B, T, 6]; pairs with `AtLocPlusCriterion` semantics
    (mapnet_criterion)."""

    feat_dim: int = 2048
    droprate: float = 0.5
    eval_dropout: bool = False  # replicate F.dropout(training=True) quirk
    dtype: Any = None

    @nn.compact
    def __call__(self, images: jax.Array, train: bool = False) -> jax.Array:
        b, t = images.shape[:2]
        flat = images.reshape((b * t,) + images.shape[2:])
        poses = AtLoc(self.feat_dim, self.droprate,
                      eval_dropout=self.eval_dropout, dtype=self.dtype,
                      name="atloc")(flat, train=train)
        return poses.reshape(b, t, 6)
