"""Pallas fused pair-MLP kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from relpose_gnn_tpu.ops.gnn_pallas import fused_pair_mlp, pair_mlp_apply


def reference_mlp(xs, xt, e, w1a, w1b, w1c, b1, w2, b2):
    h = np.maximum(xs @ w1a + xt @ w1b + e @ w1c + b1, 0.0)
    return h @ w2 + b2


class TestFusedPairMLP:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        E, D, De, H, Do = 256, 32, 16, 512, 64
        xs = rng.normal(size=(E, D)).astype(np.float32)
        xt = rng.normal(size=(E, D)).astype(np.float32)
        e = rng.normal(size=(E, De)).astype(np.float32)
        w1a = rng.normal(size=(D, H)).astype(np.float32) * 0.1
        w1b = rng.normal(size=(D, H)).astype(np.float32) * 0.1
        w1c = rng.normal(size=(De, H)).astype(np.float32) * 0.1
        b1 = rng.normal(size=H).astype(np.float32)
        w2 = rng.normal(size=(H, Do)).astype(np.float32) * 0.1
        b2 = rng.normal(size=Do).astype(np.float32)

        got = fused_pair_mlp(
            jnp.asarray(xs), jnp.asarray(xt), jnp.asarray(e),
            jnp.asarray(w1a), jnp.asarray(w1b), jnp.asarray(w1c),
            jnp.asarray(b1), jnp.asarray(w2), jnp.asarray(b2),
            block_e=128, block_h=256, interpret=True)
        want = reference_mlp(xs, xt, e, w1a, w1b, w1c, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-3)

    def test_multi_hidden_tile_accumulation(self):
        rng = np.random.default_rng(1)
        E, D, H, Do = 128, 16, 1024, 32  # 4 hidden tiles of 256
        xs = rng.normal(size=(E, D)).astype(np.float32)
        xt = rng.normal(size=(E, D)).astype(np.float32)
        e = rng.normal(size=(E, D)).astype(np.float32)
        mats = [rng.normal(size=(D, H)).astype(np.float32) * 0.05
                for _ in range(3)]
        b1 = np.zeros(H, np.float32)
        w2 = rng.normal(size=(H, Do)).astype(np.float32) * 0.05
        b2 = np.ones(Do, np.float32)
        got = fused_pair_mlp(
            jnp.asarray(xs), jnp.asarray(xt), jnp.asarray(e),
            *(jnp.asarray(m) for m in mats), jnp.asarray(b1),
            jnp.asarray(w2), jnp.asarray(b2),
            block_e=128, block_h=256, interpret=True)
        want = reference_mlp(xs, xt, e, *mats, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-3)


class TestPairMLPApply:
    def test_edge_mode_matches_dense_layer_math(self):
        """pair_mlp_apply(mode='edge') == MLP2 over concat([xs, xt, e])."""
        rng = np.random.default_rng(2)
        B, N, D, De = 2, 6, 24, 8  # E = 72 -> padded to 128
        x = rng.normal(size=(B, N, D)).astype(np.float32)
        e = rng.normal(size=(B, N, N, De)).astype(np.float32)
        fc1_k = (rng.normal(size=(2 * D + De, 40)) * 0.1).astype(np.float32)
        fc1_b = rng.normal(size=40).astype(np.float32)
        fc2_k = (rng.normal(size=(40, De)) * 0.1).astype(np.float32)
        fc2_b = rng.normal(size=De).astype(np.float32)

        got = pair_mlp_apply(jnp.asarray(x), jnp.asarray(e),
                             jnp.asarray(fc1_k), jnp.asarray(fc1_b),
                             jnp.asarray(fc2_k), jnp.asarray(fc2_b),
                             mode="edge", dtype=jnp.float32,
                             block_e=128, block_h=128, interpret=True)
        xs = np.broadcast_to(x[:, :, None, :], (B, N, N, D))
        xt = np.broadcast_to(x[:, None, :, :], (B, N, N, D))
        inp = np.concatenate([xs, xt, e], axis=-1)
        want = np.maximum(inp @ fc1_k + fc1_b, 0) @ fc2_k + fc2_b
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-3)

    def test_msg_mode(self):
        rng = np.random.default_rng(3)
        B, N, D, De = 1, 4, 16, 16
        x = rng.normal(size=(B, N, D)).astype(np.float32)
        e = rng.normal(size=(B, N, N, De)).astype(np.float32)
        fc1_k = (rng.normal(size=(D + De, 32)) * 0.1).astype(np.float32)
        fc1_b = np.zeros(32, np.float32)
        fc2_k = (rng.normal(size=(32, D)) * 0.1).astype(np.float32)
        fc2_b = np.zeros(D, np.float32)
        got = pair_mlp_apply(jnp.asarray(x), jnp.asarray(e),
                             jnp.asarray(fc1_k), jnp.asarray(fc1_b),
                             jnp.asarray(fc2_k), jnp.asarray(fc2_b),
                             mode="msg", dtype=jnp.float32,
                             block_e=128, block_h=128, interpret=True)
        xs = np.broadcast_to(x[:, :, None, :], (B, N, N, D))
        inp = np.concatenate([xs, e], axis=-1)
        want = np.maximum(inp @ fc1_k + fc1_b, 0) @ fc2_k + fc2_b
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4,
                                   atol=1e-3)
