"""Neighbor subsampling: similarity ranking -> diverse graph neighbors.

Replicates the retrieval post-processing of `obtain_KNNs`
(datasets/dataset_7Scenes_multi.py:198-264):

  1. rank database frames by descending cosine similarity;
  2. drop invalid candidates (the query itself, or same-sequence frames when
     `cross_connect`);
  3. randomly drop each surviving candidate with p=0.5
     (dataset_7Scenes_multi.py:255-257);
  4. keep every `sampling_period`-th of the survivors starting at a random
     offset in [0, sampling_period) (:258-260);
  5. take the top `k` of what remains (:264).

Two implementations with identical semantics:
  * `subsample_ranked_numpy` — host-side, used by the offline graph builder;
  * `subsample_neighbors` — jittable, static shapes, for the on-device
    retrieval path (rank -> mask -> compacted stride via cumsum -> top_k).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def subsample_ranked_numpy(sorted_indices: np.ndarray, k: int,
                           sampling_period: int,
                           rng: np.random.Generator) -> np.ndarray:
    """Steps 3-5 on an already-ranked, already-filtered index list."""
    survive = rng.random(sorted_indices.shape[0]) < 0.5
    kept = sorted_indices[survive]
    start = int(rng.integers(0, sampling_period))
    strided = kept[start::sampling_period]
    return strided[:k]


def rank_and_filter_numpy(similarity: np.ndarray,
                          invalid: np.ndarray | None = None) -> np.ndarray:
    """Steps 1-2: descending-similarity ranking with invalid entries removed.

    `invalid`: bool mask over database entries (True = excluded)."""
    order = np.argsort(1.0 - similarity, kind="stable")
    if invalid is not None:
        order = order[~invalid[order]]
    return order


def subsample_neighbors(rng: jax.Array, similarity: jax.Array,
                        invalid: jax.Array, k: int,
                        sampling_period: int) -> jax.Array:
    """Jittable full pipeline: similarity [M] + invalid mask [M] -> idx [k].

    Static output shape: if fewer than `k` candidates survive, the tail
    repeats the best surviving candidate (callers building fixed-size graphs
    need k neighbors regardless; the reference simply crashes/truncates in
    that case, which cannot happen at its dataset sizes).
    """
    m = similarity.shape[0]
    drop_rng, start_rng = jax.random.split(rng)

    order = jnp.argsort(1.0 - similarity, stable=True)          # ranked idx
    inv_sorted = invalid[order]
    survive = (jax.random.uniform(drop_rng, (m,)) < 0.5) & ~inv_sorted
    # position of each ranked candidate among the survivors
    pos = jnp.cumsum(survive.astype(jnp.int32)) - 1
    start = jax.random.randint(start_rng, (), 0, sampling_period)
    selected = survive & ((pos - start) % sampling_period == 0) & (pos >= start)
    # take the first k selected in rank order
    rank_score = jnp.where(selected, -jnp.arange(m), -jnp.inf)
    _, take = jax.lax.top_k(rank_score, k)
    # if fewer than k selected, top_k returns arbitrary -inf slots: clamp
    # to the best selected candidate; with ZERO survivors fall back to the
    # best-ranked VALID candidate (rank 0 may be an excluded entry — the
    # query itself / a same-sequence frame — and must never fill the graph)
    any_sel = jnp.any(selected)
    first_sel = jnp.argmax(selected)
    first_valid = jnp.argmax(~inv_sorted)  # 0 only if ALL are invalid
    take = jnp.where(selected[take], take,
                     jnp.where(any_sel, first_sel, first_valid))
    return order[take]


def cosine_topk(db: jax.Array, queries: jax.Array, k: int
                ) -> tuple[jax.Array, jax.Array]:
    """Plain batched cosine top-k (the BallTree replacement,
    external/VLAD/VLADlib/VLAD.py:237-257): one matmul + top_k.

    db [M, D] and queries [Q, D] are L2-normalized descriptors.
    Returns (scores [Q, k], indices [Q, k]).
    """
    sim = jnp.matmul(queries, db.T,
                    precision=jax.lax.Precision.HIGHEST)  # feeds top_k
    return jax.lax.top_k(sim, k)
