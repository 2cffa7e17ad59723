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
    retrieval path (rank -> mask -> compacted stride via cumsum -> top_k);
    `subsample_neighbors_batch` is the batched form with an exact windowed
    fast path (top-C ranking instead of the full-M argsort).
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


def _select_from_ranked(rng: jax.Array, order: jax.Array,
                        inv_sorted: jax.Array, k: int,
                        sampling_period: int, m_full: int
                        ) -> tuple[jax.Array, jax.Array]:
    """Steps 3-5 on a ranked candidate window `order` (full list or a
    top-C prefix of it).  `m_full` is the FULL database size: the drop
    mask is always drawn over (m_full,) and sliced, so a windowed call
    consumes bit-identical mask entries to the full-list call and the two
    agree exactly whenever the window holds enough selections.

    Returns (idx [k], enough) where `enough` says the window supplied k
    true selections (when False the idx tail holds clamp/fallback values
    — exactly the full path's semantics if `order` IS the full list)."""
    c = order.shape[0]
    drop_rng, start_rng = jax.random.split(rng)
    survive = (jax.random.uniform(drop_rng, (m_full,))[:c] < 0.5) \
        & ~inv_sorted
    # position of each ranked candidate among the survivors
    pos = jnp.cumsum(survive.astype(jnp.int32)) - 1
    start = jax.random.randint(start_rng, (), 0, sampling_period)
    selected = survive & ((pos - start) % sampling_period == 0) \
        & (pos >= start)
    # take the first k selected in rank order
    rank_score = jnp.where(selected, -jnp.arange(c), -jnp.inf)
    _, take = jax.lax.top_k(rank_score, k)
    # if fewer than k selected, top_k returns arbitrary -inf slots: clamp
    # to the best selected candidate; with ZERO survivors fall back to the
    # best-ranked VALID candidate (rank 0 may be an excluded entry — the
    # query itself / a same-sequence frame — and must never fill the graph)
    enough = jnp.count_nonzero(selected) >= k
    any_sel = jnp.any(selected)
    first_sel = jnp.argmax(selected)
    first_valid = jnp.argmax(~inv_sorted)  # 0 only if ALL are invalid
    take = jnp.where(selected[take], take,
                     jnp.where(any_sel, first_sel, first_valid))
    return order[take], enough


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
    # invalid entries rank LAST (+inf key), like the host pipeline's
    # filter-before-draw order (rank_and_filter_numpy feeds
    # subsample_ranked_numpy an already-filtered list): they never
    # consume drop-mask bits, so the selection is invariant to WHERE in
    # the database the invalid slots sit — the contract
    # RelocalizationService.compact_database relies on
    order = jnp.argsort(jnp.where(invalid, jnp.inf, 1.0 - similarity),
                        stable=True)                            # ranked idx
    idx, _ = _select_from_ranked(rng, order, invalid[order], k,
                                 sampling_period, m)
    return idx


_MASK_CHUNK = 256


def _drop_mask(rng: jax.Array, b: int, n: int) -> jax.Array:
    """Bernoulli(0.5) drop mask [b, n] drawn in fixed _MASK_CHUNK-wide
    chunks (chunk j from fold_in(rng, j)), so a prefix of any length that
    is a multiple of the chunk is bit-identical regardless of how much of
    the mask the caller materializes — the windowed fast path and the
    full-M fallback of `subsample_neighbors_batch` therefore agree
    exactly, and the window only pays for the bits it consumes."""
    chunks = [jax.random.uniform(jax.random.fold_in(rng, j),
                                 (b, min(_MASK_CHUNK, n - j * _MASK_CHUNK)))
              for j in range((n + _MASK_CHUNK - 1) // _MASK_CHUNK)]
    u = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
    return u < 0.5


def _select_ranked_batch(order: jax.Array, inv_sorted: jax.Array,
                         survive_bits: jax.Array, starts: jax.Array,
                         k: int, sampling_period: int
                         ) -> tuple[jax.Array, jax.Array]:
    """Batched steps 3-5 on ranked windows: order/inv_sorted/survive_bits
    [B, C], starts [B] -> (idx [B, k], enough [B])."""
    b, c = order.shape
    survive = survive_bits & ~inv_sorted
    pos = jnp.cumsum(survive.astype(jnp.int32), axis=1) - 1
    st = starts[:, None]
    selected = survive & ((pos - st) % sampling_period == 0) & (pos >= st)
    rank_score = jnp.where(selected, -jnp.arange(c), -jnp.inf)
    _, take = jax.lax.top_k(rank_score, k)
    enough = jnp.count_nonzero(selected, axis=1) >= k
    # same shortfall clamping as subsample_neighbors
    any_sel = jnp.any(selected, axis=1, keepdims=True)
    first_sel = jnp.argmax(selected, axis=1, keepdims=True)
    first_valid = jnp.argmax(~inv_sorted, axis=1, keepdims=True)
    take = jnp.where(jnp.take_along_axis(selected, take, 1), take,
                     jnp.where(any_sel, first_sel, first_valid))
    return jnp.take_along_axis(order, take, 1), enough


def subsample_neighbors_batch(rng: jax.Array, similarity: jax.Array,
                              invalid: jax.Array, k: int,
                              sampling_period: int,
                              candidates: int | None = None) -> jax.Array:
    """Batched jittable pipeline: rng (one key), similarity [B, M],
    invalid [M] or [B, M] -> neighbor indices [B, k].

    `candidates` (static) enables the windowed fast path: per query only
    the top-`candidates` ranked entries are considered.  The full-M
    stable argsort plus per-query threefry masks were the serving query
    program's hidden cost (measured: 6.1 ms of a 48 ms step at B=128,
    M=4096 — the similarity matmul is ~0.2 ms), while the
    stride-subsample only ever CONSUMES the first
    `start + (k-1)*sampling_period + 1` survivors (= 35 at the production
    k=7, sp=5).  The window path is EXACT, not approximate:

      * ranking: `lax.top_k` on the negated argsort key reproduces the
        same float rounding and the same lower-index-first tie rule as
        `argsort(1.0 - sim, stable=True)` (negation is exact in IEEE);
      * drop mask: chunked draws (`_drop_mask`) make the window's bits a
        bit-identical prefix of the full path's;
      * if ANY query cannot fill k selections inside its window (heavy
        invalid masks, pathological drop runs: P ~ 1e-31 per query at
        candidates=256 with no invalids), the WHOLE batch recomputes via
        the full-M path under `lax.cond` — correctness never depends on
        the window size, only the fast-path hit rate does.

    Results across different `candidates` settings (including None =
    always full-M) are bit-identical for the same rng; the per-query
    `subsample_neighbors` uses a different (per-query-key) mask stream
    and matches only in distribution.
    """
    b, m = similarity.shape
    invalid = jnp.broadcast_to(invalid, (b, m))
    drop_rng, start_rng = jax.random.split(rng)
    starts = jax.random.randint(start_rng, (b,), 0, sampling_period)
    # invalid entries rank LAST (+inf key) in BOTH branches: the host
    # pipeline's filter-before-draw order (they never consume drop-mask
    # bits), which (a) makes results invariant to where the invalid
    # slots sit — the RelocalizationService.compact_database exactness
    # contract — and (b) keeps the top-C window from being clogged by
    # entries the selection can never take
    key = jnp.where(invalid, jnp.inf, 1.0 - similarity)

    def full_path():
        order = jnp.argsort(key, axis=1, stable=True)
        idx, _ = _select_ranked_batch(
            order, jnp.take_along_axis(invalid, order, 1),
            _drop_mask(drop_rng, b, m), starts, k, sampling_period)
        return idx

    if candidates is None or candidates >= m:
        return full_path()
    if candidates < 1:
        raise ValueError(f"candidates must be >= 1 or None, got {candidates}")
    # Round the window (after clamping up to k) to whole mask chunks:
    # _drop_mask draws whole chunks, so a non-multiple window would
    # consume DIFFERENT bits than the full path and silently break the
    # bit-identical-across-candidates contract.  c == m is fine even when
    # m is not a multiple — the draw is then literally the full path's.
    c = min(m, ((max(int(candidates), k) + _MASK_CHUNK - 1) // _MASK_CHUNK)
            * _MASK_CHUNK)

    # same key/rounding as the full path's argsort: negation is exact,
    # and top_k's equal-value lower-index-first order == the stable sort
    _, order_c = jax.lax.top_k(-key, c)
    win_idx, win_ok = _select_ranked_batch(
        order_c, jnp.take_along_axis(invalid, order_c, 1),
        _drop_mask(drop_rng, b, c), starts, k, sampling_period)
    return jax.lax.cond(jnp.all(win_ok), lambda: win_idx, full_path)


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
