"""Synthetic relocalization-graph data for tests and benchmarks.

Generates batches with the exact tensor contract of the real pipeline
(images [B, N, H, W, 3] float32, poses [B, N, 6], adj [B, N, N] bool) plus a
*learnable* toy task variant where the image content encodes the pose, so
integration tests can verify the loss actually decreases.
"""

from __future__ import annotations

import numpy as np

from relpose_gnn_tpu.ops import graph as graph_ops


def synthetic_batch(rng: np.random.Generator, batch_size: int = 8,
                    num_nodes: int = 8, height: int = 256, width: int = 341,
                    learnable: bool = False) -> dict:
    """One batch in the training tensor contract.

    With `learnable=True` each pose component fills a full-height vertical
    stripe (all channels), so the signal survives the backbone's global
    average pooling and a model can regress relative poses from pixels
    within a few hundred from-scratch steps — used by convergence smoke
    tests on tiny shapes.  (An earlier tiny-corner-patch encoding carried
    ~1/64 of the pooled signal and was not learnable at smoke-test scale.)
    """
    images = rng.normal(size=(batch_size, num_nodes, height, width, 3))
    images = images.astype(np.float32)
    poses = rng.normal(size=(batch_size, num_nodes, 6)).astype(np.float32)
    poses[..., 3:] *= 0.3  # plausible logq magnitudes
    if learnable:
        w6 = width // 6
        for comp in range(6):
            block = poses[..., comp][..., None, None, None]
            images[:, :, :, comp * w6:(comp + 1) * w6, :] = block
    adj = np.broadcast_to(graph_ops.fc_adjacency(num_nodes),
                          (batch_size, num_nodes, num_nodes)).copy()
    return {"images": images, "poses": poses, "adj": adj}


def synthetic_batches(seed: int, n_batches: int, **kwargs):
    rng = np.random.default_rng(seed)
    for _ in range(n_batches):
        yield synthetic_batch(rng, **kwargs)


def make_device_batch_fn(batch_size: int, num_nodes: int, height: int,
                         width: int, learnable: bool = True):
    """Jitted on-device generator of the learnable synthetic task.

    Avoids host->device uploads entirely (the dev tunnel moves ~GB/min):
    every call with a fresh key yields a brand-new batch, so training
    scripts can test *generalization* rather than memorization.
    """
    import jax
    import jax.numpy as jnp

    from relpose_gnn_tpu.ops import graph as graph_ops

    adj = jnp.asarray(np.broadcast_to(
        graph_ops.fc_adjacency(num_nodes),
        (batch_size, num_nodes, num_nodes)).copy())
    w6 = width // 6

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        images = jax.random.normal(
            k1, (batch_size, num_nodes, height, width, 3), jnp.float32)
        poses = jax.random.normal(k2, (batch_size, num_nodes, 6),
                                  jnp.float32)
        poses = poses.at[..., 3:].multiply(0.3)
        if learnable:
            for comp in range(6):  # full-height stripes (see synthetic_batch)
                b = jnp.broadcast_to(
                    poses[..., comp][..., None, None, None],
                    (batch_size, num_nodes, height, w6, 3))
                images = images.at[
                    :, :, :, comp * w6:(comp + 1) * w6, :].set(b)
        return {"images": images, "poses": poses, "adj": adj}

    return gen
