"""Single-token bottleneck attention block.

Reference: `AttentionBlock` (modules/att.py:7-34).  Each item attends over a
sequence of length one, so the softmax `softmax(phi(x) @ theta(x)^T)` is a
softmax over a single logit and is *identically 1*.  The block therefore
reduces exactly to a bottleneck residual:

    z = x + W(g(x))

We implement that reduction directly (saves two matmuls and a softmax) but
keep `theta`/`phi` as parameters so converted PyTorch checkpoints load
one-to-one; they are mathematically dead in the reference too.
"""

from __future__ import annotations

import jax
import flax.linen as nn


class AttentionBlock(nn.Module):
    in_channels: int
    # keep dead theta/phi params for checkpoint-layout parity with the
    # reference (their contribution is exactly the identity — see module doc)
    keep_dead_params: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c8 = self.in_channels // 8
        g = nn.Dense(c8, name="g")
        w = nn.Dense(self.in_channels, name="W")
        if self.keep_dead_params:
            # instantiate for parameter-tree parity; outputs are unused
            # because softmax over a length-1 axis == 1 (att.py:25-26), so
            # XLA dead-code-eliminates these matmuls under jit.
            nn.Dense(c8, name="theta")(x)
            nn.Dense(c8, name="phi")(x)
        return x + w(g(x))
