"""Trainer integration tests on tiny shapes: convergence, criterion math,
eval-step pose recovery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relpose_gnn_tpu.data.synthetic import synthetic_batch
from relpose_gnn_tpu.models.posenet import RelPoseGNN, RelPoseGNNConfig
from relpose_gnn_tpu.ops import graph as graph_ops
from relpose_gnn_tpu.training import criterion as crit
from relpose_gnn_tpu.training.trainer import (
    TrainerConfig, create_train_state, make_eval_step, make_train_step)


def tiny_model(knn=2, num_nodes=4):
    cfg = RelPoseGNNConfig(num_nodes=num_nodes, feat_dim=32, edge_dim=32,
                           node_dim=32, knn=knn, gnn_recursion=2,
                           backbone="resnet18", droprate=0.0)
    return RelPoseGNN(cfg)


def tiny_batch(seed=0, b=2, n=4, h=32, w=40, learnable=False):
    rng = np.random.default_rng(seed)
    batch = synthetic_batch(rng, batch_size=b, num_nodes=n, height=h,
                            width=w, learnable=learnable)
    return jax.tree.map(jnp.asarray, batch)


class TestCriterion:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(10, 6)).astype(np.float32)
        targ = rng.normal(size=(10, 6)).astype(np.float32)
        params = crit.init_criterion_params(sax=0.3, saq=-2.0)
        loss, t_loss, q_loss = crit.pose_net_criterion(
            params, jnp.asarray(pred), jnp.asarray(targ))
        want_t = np.abs(pred[:, :3] - targ[:, :3]).mean()
        want_q = np.abs(pred[:, 3:] - targ[:, 3:]).mean()
        want = (np.exp(-0.3) * want_t + 0.3 + np.exp(2.0) * want_q - 2.0)
        np.testing.assert_allclose(float(t_loss), want_t, rtol=1e-5)
        np.testing.assert_allclose(float(q_loss), want_q, rtol=1e-5)
        np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    def test_masked_mean_over_edges_only(self):
        rng = np.random.default_rng(1)
        pred = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
        targ = rng.normal(size=(2, 4, 4, 6)).astype(np.float32)
        mask = rng.random((2, 4, 4)) < 0.5
        params = crit.init_criterion_params()
        _, t_loss, _ = crit.pose_net_criterion(
            params, jnp.asarray(pred), jnp.asarray(targ), jnp.asarray(mask))
        err = np.abs(pred[..., :3] - targ[..., :3])
        want = err[mask].mean()
        np.testing.assert_allclose(float(t_loss), want, rtol=1e-5)

    def test_grad_flows_to_sax(self):
        params = crit.init_criterion_params()
        pred = jnp.ones((4, 6))
        targ = jnp.zeros((4, 6))
        g = jax.grad(lambda p: crit.pose_net_criterion(p, pred, targ)[0])(
            params)
        # d/dsax [exp(-sax) L + sax] = 1 - exp(-sax) L = 1 - 1 = 0 at L=1
        np.testing.assert_allclose(float(g["sax"]), 1 - 1.0, atol=1e-5)
        assert abs(float(g["saq"])) < 1e-5


class TestTrainStep:
    def test_loss_decreases(self):
        model = tiny_model(knn=0)
        tcfg = TrainerConfig(lr=3e-4, steps_per_epoch=10,
                             weight_decay=0.0)
        batch = tiny_batch(learnable=True)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        step = make_train_step(tcfg)
        rng = jax.random.PRNGKey(42)
        losses = []
        for i in range(30):
            state, metrics = step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0] - 0.1, losses[::10]
        assert int(state.step) == 30

    def test_criterion_params_update(self):
        model = tiny_model(knn=2)
        tcfg = TrainerConfig(lr=1e-3, steps_per_epoch=10)
        batch = tiny_batch()
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        step = make_train_step(tcfg)
        s0 = float(state.params["criterion_R"]["sax"])
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        assert float(state.params["criterion_R"]["sax"]) != s0

    def test_edge_dropout_effective_changes_loss(self):
        model = tiny_model(knn=0)
        batch = tiny_batch()
        losses = {}
        for eff in (False, True):
            tcfg = TrainerConfig(steps_per_epoch=10,
                                 edge_dropout_effective=eff,
                                 edge_keep_factor=0.3)
            state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                       batch["images"], batch["adj"])
            step = make_train_step(tcfg)
            _, metrics = step(state, batch, jax.random.PRNGKey(7))
            losses[eff] = float(metrics["loss"])
        assert losses[False] != losses[True]


class TestEvalStep:
    def test_perfect_predictions_give_zero_error(self):
        """If pred_rel matches p[s]-p[t] exactly, the recovered absolute
        pose must equal the query's ground truth (test.py:227-233 math)."""
        batch = tiny_batch(seed=3)
        poses = np.asarray(batch["poses"])
        rp = poses[:, :, None, :] - poses[:, None, :, :]
        nbr = np.array([1, 2])
        pred = poses[np.arange(2), nbr] - rp[np.arange(2), nbr, 0]
        np.testing.assert_allclose(pred, poses[:, 0], atol=1e-6)

    def test_eval_step_contract(self):
        model = tiny_model(knn=2)
        tcfg = TrainerConfig(steps_per_epoch=10)
        batch = tiny_batch(b=3)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        eval_step = make_eval_step(ref_node=0)
        out = eval_step(state, batch)
        assert out["pred"].shape == (3, 6)
        assert out["target"].shape == (3, 6)
        np.testing.assert_allclose(np.asarray(out["target"]),
                                   np.asarray(batch["poses"][:, 0]),
                                   atol=1e-6)
        # anchor identity: pred = poses[nbr] - pred_rel[nbr, 0]
        nbr = np.asarray(out["nbr"])
        assert nbr.shape == (3,)
        assert (nbr != 0).all()

    def test_eval_deterministic(self):
        model = tiny_model(knn=2)
        tcfg = TrainerConfig(steps_per_epoch=10)
        batch = tiny_batch(b=2)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        eval_step = make_eval_step()
        o1 = eval_step(state, batch)
        o2 = eval_step(state, batch)
        np.testing.assert_array_equal(np.asarray(o1["pred"]),
                                      np.asarray(o2["pred"]))


class TestLRSchedule:
    def test_step_decay(self):
        from relpose_gnn_tpu.training.trainer import make_optimizer
        tcfg = TrainerConfig(lr=1e-2, lr_decay=0.1, lr_decay_step=2,
                             steps_per_epoch=5)
        import optax
        sched = optax.exponential_decay(1e-2, 2 * 5, 0.1, staircase=True)
        assert abs(sched(0) - 1e-2) < 1e-9
        assert abs(sched(9) - 1e-2) < 1e-9
        assert abs(sched(10) - 1e-3) < 1e-9
        assert abs(sched(20) - 1e-4) < 1e-10
        make_optimizer(tcfg)  # constructs without error


if __name__ == "__main__":
    pytest.main([__file__, "-q", "-x"])


class TestFusedEval:
    def test_mean_and_median_fusion(self):
        model = tiny_model(knn=0)
        tcfg = TrainerConfig(steps_per_epoch=10)
        batch = tiny_batch(b=3)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        out_first = make_eval_step(fuse="first")(state, batch)
        out_mean = make_eval_step(fuse="mean")(state, batch)
        out_med = make_eval_step(fuse="median")(state, batch)
        for o in (out_first, out_mean, out_med):
            assert o["pred"].shape == (3, 6)
            assert np.isfinite(np.asarray(o["pred"])).all()
        # fusion modes generally differ from the single-edge estimate
        assert not np.allclose(np.asarray(out_first["pred"]),
                               np.asarray(out_mean["pred"]))

    def test_mean_fusion_matches_numpy(self):
        """With a static fc graph, mean fusion == numpy masked mean of
        poses[s] - pred_rel[s, 0]."""
        model = tiny_model(knn=0)
        tcfg = TrainerConfig(steps_per_epoch=10)
        batch = tiny_batch(b=2)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        # grab raw predictions
        pred_abs, pred_rel, adj, aux = state.apply_fn(
            {"params": state.params["model"],
             "batch_stats": state.batch_stats},
            batch["images"], batch["adj"], train=False)
        pred_rel = np.asarray(pred_rel)
        adj_np = np.asarray(adj)
        poses = np.asarray(batch["poses"])
        want = []
        for b in range(2):
            ests = [poses[b, s] - pred_rel[b, s, 0]
                    for s in range(4) if adj_np[b, s, 0]]
            want.append(np.mean(ests, axis=0))
        out = make_eval_step(fuse="mean")(state, batch)
        np.testing.assert_allclose(np.asarray(out["pred"]), want, atol=1e-5)


class TestBNFreeTrainState:
    """create_train_state must hold batch_stats as the SAME pytree type
    model.apply(mutable=['batch_stats']) returns (a plain dict): the old
    FrozenDict() default meant a BN-free backbone (the ViT preset) flipped
    the state's pytree TYPE after step 1, so AOT-compiled executables
    (benchmarks/bench_train.py's .lower().compile() pattern) rejected the
    step-2 state with a pytree TypeError.  jit hides this by retracing."""

    def test_aot_train_step_survives_bn_free_state(self):
        import flax.linen as nn

        class BNFree(nn.Module):
            @nn.compact
            def __call__(self, images, adj, train=False):
                b, n = images.shape[:2]
                f = nn.Dense(8)(images.reshape(b, n, -1))
                f = nn.Dropout(0.1, deterministic=not train)(f)
                pred_abs = nn.Dense(6)(f)
                pred_rel = (pred_abs[:, :, None, :]
                            - pred_abs[:, None, :, :])
                return pred_abs, pred_rel, adj, {"node_feats": f}

        model = BNFree()
        tcfg = TrainerConfig(steps_per_epoch=10)
        batch = tiny_batch()
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               batch["images"][:1], batch["adj"][:1],
                               train=False)
        assert "batch_stats" not in variables  # genuinely BN-free
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"][:1], batch["adj"][:1],
                                   variables=variables)
        step = make_train_step(tcfg)
        rng = jax.random.PRNGKey(1)
        compiled = step.lower(state, batch, rng).compile()
        state, _ = compiled(state, batch, rng)
        # pre-fix this second call raised: batch_stats FrozenDict -> dict
        state, m = compiled(state, batch, rng)
        assert np.isfinite(float(m["loss"]))
        assert int(state.step) == 2


class TestGradAccum:
    def test_params_update_every_k_steps(self):
        model = tiny_model(knn=0)
        tcfg = TrainerConfig(lr=1e-3, steps_per_epoch=10, grad_accum=2,
                             weight_decay=0.0)
        batch = tiny_batch()
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        step = make_train_step(tcfg)
        p0 = np.asarray(jax.tree.leaves(state.params["model"])[0]).copy()
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        p1 = np.asarray(jax.tree.leaves(state.params["model"])[0])
        np.testing.assert_array_equal(p0, p1)  # accumulating, no update yet
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        p2 = np.asarray(jax.tree.leaves(state.params["model"])[0])
        assert not np.array_equal(p1, p2)      # k-th micro-step applies


class TestFuseOkGuard:
    """ADVICE r4 #4: fuse='mean'/'median' silently produces garbage for
    a query row with zero incoming edges — the eval step emits fuse_ok
    and check_fuse_ok raises on it host-side."""

    def _state_and_batch(self):
        model = tiny_model(knn=0)
        tcfg = TrainerConfig(steps_per_epoch=10)
        batch = tiny_batch(b=2)
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                   batch["images"], batch["adj"])
        return state, batch

    def test_healthy_adjacency_is_ok(self):
        from relpose_gnn_tpu.training.trainer import check_fuse_ok
        state, batch = self._state_and_batch()
        out = make_eval_step(fuse="mean")(state, batch)
        assert bool(out["fuse_ok"])
        check_fuse_ok(out, "test")  # no-op

    def test_zero_edge_row_fails_loudly(self):
        import pytest
        from relpose_gnn_tpu.training.trainer import check_fuse_ok
        state, batch = self._state_and_batch()
        adj = np.asarray(batch["adj"]).copy()
        adj[0, :, 0] = False  # row 0's query node: no incoming edges
        batch = dict(batch, adj=jnp.asarray(adj))
        out = make_eval_step(fuse="mean")(state, batch)
        assert not bool(out["fuse_ok"])
        with pytest.raises(ValueError, match="ZERO incoming"):
            check_fuse_ok(out, "test")

    def test_first_mode_has_no_flag(self):
        from relpose_gnn_tpu.training.trainer import check_fuse_ok
        state, batch = self._state_and_batch()
        out = make_eval_step(fuse="first")(state, batch)
        assert "fuse_ok" not in out
        check_fuse_ok(out, "test")  # no-op
