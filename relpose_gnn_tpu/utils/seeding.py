"""Seeding utilities.

`seed_everything` (training/train.py:395-400 parity) seeds the host-side
RNGs (python `random`, numpy legacy global).  JAX randomness is explicit —
every stochastic op takes a `jax.random` key — so the returned key is the
root for device-side randomness; there is no hidden global to seed.
"""

from __future__ import annotations

import random

import numpy as np
import jax


def seed_everything(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def worker_rngs(seed: int, n: int) -> list[np.random.Generator]:
    """Independent numpy generators for host worker threads (the analog of
    the reference's seeded DataLoader workers, testing/test.py:184-194)."""
    root = np.random.SeedSequence(seed)
    return [np.random.default_rng(s) for s in root.spawn(n)]
