"""Multi-host (multi-process) execution: the DCN layer above the chip mesh.

The reference is strictly single-GPU (SURVEY.md §2.4: no DistributedDataParallel,
no torch.distributed anywhere).  Single-host multi-chip scaling lives in
parallel/mesh.py (one process, all chips over ICI); this module adds the
standard JAX multi-host recipe for TPU pods / multi-host slices, where each
host runs one process that can only address its local chips:

    jax.distributed.initialize()          (once per process, before device use)
      -> create_mesh() over jax.devices() (the GLOBAL device list)
      -> per-process batch assembly with jax.make_array_from_process_local_data
         (each host uploads only ITS rows of the global batch; the only
          cross-host traffic is the gradient all-reduce XLA inserts, which
          rides ICI within a slice and DCN across slices)

`put_like` is the single placement primitive: single-process it is exactly
`jax.device_put(x, sharding)`; multi-process it slices the caller's
process-local block out of a (process-identical) host array and assembles
the global jax.Array without any cross-host data movement.  `host_read`
is the inverse for result tensors that are sharded across processes.

Validated end-to-end on TWO CPU PROCESSES with gloo collectives
(tests/test_multihost.py): a full `run_training` over a dp=8 mesh split
4+4 across two processes produces the same per-epoch losses as the same
mesh in one process.
"""

from __future__ import annotations

import os

import numpy as np
import jax


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: int | None = None) -> None:
    """Join a multi-process JAX job (call before any device use).

    On TPU pods the runtime discovers everything from the environment and
    `jax.distributed.initialize()` could equally be called with no
    arguments; the explicit form here also serves CPU test rigs, where
    cross-process collectives need the gloo implementation and
    `local_device_count` virtual devices per process.
    """
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # gloo is the only cross-process collective implementation for
        # XLA:CPU; must be set before the backend initializes.  The
        # explicit jax_platforms config update matters: distributed
        # device discovery probes every registered PJRT plugin unless the
        # config (not just the env var) pins the platform list
        jax.config.update("jax_platforms", "cpu")
        if local_device_count is not None:
            jax.config.update("jax_num_cpu_devices", local_device_count)
        if num_processes > 1:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if num_processes <= 1:
        # single process: no distributed client, but local_device_count
        # still applies (CLI mesh runs on one-process CPU rigs)
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def _local_block(sharding, global_shape: tuple) -> tuple:
    """Bounding-box slices of this process's addressable portion.

    For a replicated dim the box spans the whole axis; for a sharded dim,
    exactly this process's rows/cols.  Device order within a mesh axis is
    process-contiguous on standard meshes, so the addressable shards tile
    a contiguous box; the volume check below guards that assumption
    against exotic device orders (distinct shard regions of a sharding
    are pairwise disjoint, so they tile the box iff their volumes sum to
    the box volume — a non-contiguous layout leaves a hole and fails).
    """
    idx_map = sharding.addressable_devices_indices_map(global_shape)
    nd = len(global_shape)
    starts = [None] * nd
    stops = [None] * nd
    regions = set()   # distinct (start, stop) index regions (replicas dedup)
    for slices in idx_map.values():
        region = []
        for d, sl in enumerate(slices):
            a = sl.start if sl.start is not None else 0
            b = sl.stop if sl.stop is not None else global_shape[d]
            starts[d] = a if starts[d] is None else min(starts[d], a)
            stops[d] = b if stops[d] is None else max(stops[d], b)
            region.append((a, b))
        regions.add(tuple(region))
    box_vol = 1
    for a, b in zip(starts, stops):
        box_vol *= b - a
    shard_vol = sum(int(np.prod([b - a for a, b in r])) for r in regions)
    if shard_vol != box_vol:
        raise ValueError(
            "this process's addressable shards do not tile a contiguous "
            f"block (shard volume {shard_vol} != bounding box {box_vol}); "
            f"put_like cannot slice a local block for {sharding} over "
            f"shape {global_shape}")
    return tuple(slice(a, b) for a, b in zip(starts, stops))


def put_like(x, sharding) -> jax.Array:
    """Place a host array onto `sharding`, multi-process aware.

    `x` must hold the GLOBAL value (identical on every process — true for
    params initialized from the same seed and for seeded data iterators);
    each process uploads only its local block, so no host pays for rows
    it does not own.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    local = x[_local_block(sharding, x.shape)]
    return jax.make_array_from_process_local_data(sharding, local, x.shape)


def host_read(x) -> np.ndarray:
    """Fetch a (possibly cross-process-sharded) jax.Array to host numpy.

    Single-process (or fully-replicated arrays): plain np.asarray.
    Multi-process sharded results: an all-gather across processes so every
    host sees the full tensor (jax.experimental.multihost_utils)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
