"""Training loop: jitted, mesh-sharded train/eval steps.

Re-designs `MultiModelTrainer` (training/train.py:42-346) as functional JAX:

  * one jitted `train_step` (forward + loss + grads + Adam update) instead of
    a Python loop body with per-batch H2D sync;
  * batch sharded over the mesh `data` axis, params optionally tensor-parallel
    over `model` (parallel/sharding.py) — the compiler inserts gradient
    all-reduces over ICI;
  * torch `Adam(lr, weight_decay)` == optax add_decayed_weights -> adam,
    with the reference's step-decay schedule (x0.1 every `lr_decay_step`
    epochs, train.py:224-227);
  * learnable criterion weights (sax/saq) live in the same param tree and
    optimizer, matching train.py:203-211.

Quirk (train.py:238-247): the reference's train-time edge dropout masks only
`data.edge_attr`, which the production model never reads — an effective
no-op.  `edge_dropout_effective=False` (default) replicates that faithfully;
setting it True applies the mask to the adjacency for real.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import unfreeze

from relpose_gnn_tpu.models.posenet import RelPoseGNN
from relpose_gnn_tpu.ops import graph as graph_ops
from relpose_gnn_tpu.training import criterion as crit


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Hyperparameters; defaults mirror train.py:44-77 and its argparse."""

    lr: float = 1e-4
    lr_decay: float = 0.1
    lr_decay_step: int = 50          # epochs between decays (train.py:379)
    weight_decay: float = 5e-4       # train.py:65
    sax: float = 0.0                 # train.py:66
    saq: float = -2.0                # argparse default (train.py:368)
    srx: float = 0.0                 # train.py:68
    srq: float = -2.0                # train.py:367
    lambda_ap: float = 0.0           # absolute-pose loss weight (train.py:71)
    use_vo_loss: bool = True         # train.py:60
    edge_keep_factor: float = 0.5    # train.py:72
    edge_dropout_effective: bool = False  # replicate the no-op quirk
    filter_nans: bool = False        # zero non-finite grads before Adam
    #                                  (posenet.py:30-36 backward-hook parity)
    steps_per_epoch: int = 1000
    grad_accum: int = 1


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 term added to the gradient before the
    Adam moments, then step-decayed learning rate."""
    # with gradient accumulation, optax.MultiSteps makes the inner
    # schedule count OPTIMIZER updates (one per k micro-steps), so the
    # epoch length must be expressed in updates or the x0.1 step decay
    # lands k times too late (review finding)
    updates_per_epoch = max(1, cfg.steps_per_epoch // max(1, cfg.grad_accum))
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=cfg.lr_decay_step * updates_per_epoch,
        decay_rate=cfg.lr_decay,
        staircase=True)
    parts = []
    if cfg.filter_nans:
        # closest optax analog of the reference's NaN-filter backward hook
        # (modules/posenet.py:30-36, off by default there too)
        parts.append(optax.zero_nans())
    parts += [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule)]
    tx = optax.chain(*parts)
    if cfg.grad_accum > 1:
        # gradient accumulation: k micro-batches per optimizer update
        # (no analog in the reference; enables reference-scale effective
        # batches on memory-tight configs)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def create_train_state(rng: jax.Array, model: RelPoseGNN, cfg: TrainerConfig,
                       sample_images: jax.Array,
                       sample_adj: jax.Array,
                       variables=None) -> TrainState:
    """Pass `variables` to skip the eager `model.init` — through the TPU
    tunnel eager init dispatches one tiny op per param initializer at
    ~30 ms RTT each (~95 s for ResNet34); tunnel-side callers should
    `jax.jit(lambda k: model.init(...))(key)` and hand the result in
    (benchmarks/bench_train.py does)."""
    if variables is None:
        variables = model.init({"params": rng, "dropout": rng},
                               sample_images, sample_adj, train=False)
    params = {"model": variables["params"],
              "criterion": crit.init_criterion_params(cfg.sax, cfg.saq),
              "criterion_R": crit.init_criterion_params(cfg.srx, cfg.srq)}
    # model.apply(..., mutable=['batch_stats']) returns a PLAIN dict, so
    # the state must hold one too or its pytree TYPE flips after the first
    # step — which breaks AOT-compiled executables (pytree mismatch) for
    # BN-free backbones (ViT preset) where the default branch is taken.
    batch_stats = unfreeze(variables.get("batch_stats", {}))
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params), tx=tx,
                      apply_fn=model.apply)


def loss_fn(params, batch_stats, apply_fn, batch, dropout_rng,
            cfg: TrainerConfig):
    """Forward + homoscedastic relative-pose loss (train.py:255-264)."""
    (pred_abs, pred_rel, adj, _aux), new_vars = apply_fn(
        {"params": params["model"], "batch_stats": batch_stats},
        batch["images"], batch["adj"], train=True,
        rngs={"dropout": dropout_rng}, mutable=["batch_stats"])

    target_rel = graph_ops.relative_pose_targets(batch["poses"])
    loss_r, t_loss, q_loss = crit.pose_net_criterion(
        params["criterion_R"], pred_rel, target_rel, mask=adj)

    if cfg.use_vo_loss:
        total = loss_r
    else:
        total, t_loss, q_loss = crit.pose_net_criterion(
            params["criterion"], pred_abs, batch["poses"])
    if cfg.lambda_ap > 0:
        abs_loss, _, _ = crit.pose_net_criterion(
            params["criterion"], pred_abs, batch["poses"])
        total = total + cfg.lambda_ap * abs_loss

    metrics = {"loss": total, "t_loss": t_loss, "q_loss": q_loss,
               "sax_R": params["criterion_R"]["sax"],
               "saq_R": params["criterion_R"]["saq"]}
    return total, (new_vars["batch_stats"], metrics)


def make_train_step(cfg: TrainerConfig):
    """Build the jitted train step. Donates state for in-place updates."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        drop_rng, edge_rng = jax.random.split(jax.random.fold_in(
            rng, state.step))

        if cfg.edge_dropout_effective:
            n = batch["adj"].shape[-1]
            keep = graph_ops.edge_dropout_mask(
                edge_rng, n, cfg.edge_keep_factor,
                batch_shape=batch["adj"].shape[:-2])
            keep = graph_ops.ensure_nonempty(keep)
            batch = dict(batch, adj=batch["adj"] & keep)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, state.apply_fn, batch,
            drop_rng, cfg)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, metrics

    return train_step


def fuse_pose_estimates(est: jax.Array, mask: jax.Array,
                        fuse: str) -> jax.Array:
    """Fuse the per-source absolute-pose estimates for one query node:
    `est [B, N, 6]` (estimate from each potential source node), masked by
    `mask [B, N]` (True where an edge source -> query exists).

    fuse='mean' is the masked mean; for this model's vector-difference
    relative-pose convention a pose-graph least-squares over the star
    graph with fixed neighbor poses reduces in closed form to exactly
    this mean, so it is the PGO-optimal fusion (see make_eval_step's
    docstring).  fuse='median' is the masked per-dimension median.
    Shared by the full-pixel eval step and the cached-serving step
    (evaluation/serving.py) so both paths fuse identically.

    PRECONDITION: every row needs >= 1 incoming edge (mask.sum(1) >= 1).
    A zero-edge row silently fuses to an all-zero pose (mean) or +inf
    (median) — garbage medians with no error — so both eval steps emit a
    `fuse_ok` flag and their host loops raise on it (ADVICE r4 #4); a
    pathological/rebuilt adjacency cannot slip through."""
    if fuse == "mean":
        w = mask.astype(est.dtype)[..., None]
        return jnp.sum(est * w, 1) / jnp.maximum(jnp.sum(w, 1), 1.0)
    assert fuse == "median", fuse
    # masked median per dim: sort with +inf fill
    big = jnp.where(mask[..., None], est, jnp.inf)
    srt = jnp.sort(big, axis=1)
    cnt = jnp.sum(mask, axis=1)                     # [B]
    lo = jnp.clip((cnt - 1) // 2, 0, est.shape[1] - 1)
    hi = jnp.clip(cnt // 2, 0, est.shape[1] - 1)
    take = lambda k: jnp.take_along_axis(  # noqa: E731
        srt, k[:, None, None].repeat(6, 2), axis=1)[:, 0]
    return 0.5 * (take(lo) + take(hi))


def check_fuse_ok(out: dict, where: str) -> None:
    """Host-side guard on an eval step's `fuse_ok` flag (see
    fuse_pose_estimates' PRECONDITION).  No-op for outputs without the
    flag (fuse='first' never fuses over a mask)."""
    if "fuse_ok" in out and not bool(out["fuse_ok"]):
        raise ValueError(
            f"{where}: a query row has ZERO incoming edges in the fuse "
            "mask — fuse='mean'/'median' would silently produce an "
            "all-zero pose or +inf median for it. The adjacency feeding "
            "this eval is pathological (or was rebuilt with knn too "
            "small); fix the graph construction")


def make_eval_step(ref_node: int = 0, fuse: str = "first",
                   static_anchor: int | None = None):
    """Build the jitted batched eval step.

    fuse='first' (default, reference parity): recover the query's absolute
    pose from ONE predicted relative pose anchored at the nearest database
    neighbor in feature space — the dense equivalent of
    testing/test.py:227-233 (first kNN edge into node 0; torch-cluster
    lists a center's neighbors in ascending distance, so "first" == nearest
    in PRE-GNN feature space).

    static_anchor: with a STATIC graph (knn=0) the reference instead picks
    the first edge into node 0 in *construction order* — for the fc edge
    table that is always node 1 (ops/graph.first_edge_anchor), not the
    feature-space nearest neighbor.  Pass that node index here to replicate;
    None keeps the feature-space rule (correct for knn>0).

    fuse='mean' | 'median': fuse ALL incoming estimates
    `poses[s] - pred_rel[s, 0]` over edges s -> query (opt-in extension;
    the reference discards the other N-2 predicted edges).  Note that for
    this model's vector-difference relative-pose convention, a pose-graph
    least-squares over the star graph with fixed neighbor poses reduces in
    closed form to exactly this masked mean — so fuse='mean' IS the
    PGO-optimal fusion here (ops/pgo.py covers the general geometric case).

    Returns per-graph (pred_pose6, target_pose6) for the query node; error
    statistics are computed host-side in float64 by the evaluator.
    """
    assert fuse in ("first", "mean", "median"), fuse

    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        pred_abs, pred_rel, adj, aux = state.apply_fn(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats},
            batch["images"], batch["adj"], train=False)
        if static_anchor is not None:
            nbr = jnp.full(pred_rel.shape[0], static_anchor, jnp.int32)
        else:
            feats = aux["node_feats"]
            nbr = graph_ops.nearest_neighbor(feats, node=ref_node)  # [B]
        b = pred_rel.shape[0]
        out = {}
        if fuse == "first":
            rp = pred_rel[jnp.arange(b), nbr, ref_node]         # [B, 6]
            anchor = batch["poses"][jnp.arange(b), nbr]         # GT neighbor
            pred_query = anchor - rp                            # test.py:230
        else:
            # all estimates poses[s] - RP[s, ref] over incoming edges
            est = batch["poses"] - pred_rel[:, :, ref_node]     # [B, N, 6]
            mask = adj[:, :, ref_node]                          # [B, N]
            pred_query = fuse_pose_estimates(est, mask, fuse)
            # fuse precondition (see fuse_pose_estimates): a zero-edge
            # row fuses to garbage silently; one cheap reduce lets the
            # host loop fail loudly instead
            out["fuse_ok"] = jnp.all(jnp.sum(mask, axis=1) >= 1)
        target_query = batch["poses"][:, ref_node]
        out.update({"pred": pred_query, "target": target_query,
                    "pred_abs": pred_abs[:, ref_node], "nbr": nbr})
        return out

    return eval_step
