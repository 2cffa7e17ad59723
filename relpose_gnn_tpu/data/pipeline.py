"""Input pipeline: shuffled batching + background host threads + device
prefetch with on-device normalization.

Replaces the torch DataLoader worker-pool (train.py:132-134, num_workers=8)
with a double-buffered prefetcher: a host thread assembles the next batches
from the packed memmaps while the device computes, and uint8 -> normalized
float conversion runs on device (jitted), so the host only ever moves raw
bytes (4x less PCIe/DMA traffic than the reference's float32 tensors).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp

from relpose_gnn_tpu.parallel.multihost import put_like


def make_normalizer(mean: np.ndarray, std: np.ndarray):
    """Jitted on-device uint8 -> normalized float32 [B, N, H, W, 3]."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    @jax.jit
    def normalize(images_u8: jax.Array) -> jax.Array:
        x = images_u8.astype(jnp.float32)
        if images_u8.dtype == jnp.uint8:
            x = x / 255.0
        return (x - mean) / std

    return normalize


@jax.jit
def normalize_per_record(images_u8: jax.Array, mean: jax.Array,
                         std: jax.Array) -> jax.Array:
    """Per-RECORD stats [B, 3]: a multi-scene batch normalizes each row
    with its own scene's stats (the reference normalizes every scene with
    its own stats.txt — one global mean/std would mis-normalize all but
    one scene)."""
    x = images_u8.astype(jnp.float32)
    if images_u8.dtype == jnp.uint8:
        x = x / 255.0
    extra = x.ndim - 2  # broadcast [B, 3] over N/H/W axes
    m = mean.reshape(mean.shape[:1] + (1,) * extra + (3,))
    s = std.reshape(std.shape[:1] + (1,) * extra + (3,))
    return (x - m) / s


def batch_indices(rng: np.random.Generator, n: int, batch_size: int,
                  shuffle: bool, drop_remainder: bool = True
                  ) -> Iterator[np.ndarray]:
    order = rng.permutation(n) if shuffle else np.arange(n)
    end = n - (n % batch_size) if drop_remainder else n
    for i in range(0, end, batch_size):
        yield order[i:i + batch_size]


def data_iterator(dataset, batch_size: int, seed: int = 0,
                  shuffle: bool = True, epochs: int | None = 1,
                  drop_remainder: bool = True) -> Iterator[dict]:
    """Host-side batch iterator over a Packed/Concat dataset."""
    epoch = 0
    while epochs is None or epoch < epochs:
        rng = np.random.default_rng(seed + epoch)
        for idx in batch_indices(rng, len(dataset), batch_size, shuffle,
                                 drop_remainder):
            yield dataset.batch(idx)
        epoch += 1


def native_data_iterator(root: str, batch_size: int, seed: int = 0,
                         shuffle: bool = True, epochs: int | None = 1,
                         drop_remainder: bool = True,
                         threads: int = 4) -> Iterator[dict]:
    """Batch iterator backed by the C++ graphio runtime (mmap + thread-pool
    gather + async prefetch, native/graphio.cc).  Falls back to the numpy
    path when the native library is unavailable."""
    from relpose_gnn_tpu.data import native_io
    from relpose_gnn_tpu.data.packed import PackedGraphDataset

    if not native_io.available():
        yield from data_iterator(PackedGraphDataset(root), batch_size,
                                 seed=seed, shuffle=shuffle, epochs=epochs,
                                 drop_remainder=drop_remainder)
        return
    loader = native_io.NativeBatchLoader(root, threads=threads)
    try:
        epoch = 0
        while epochs is None or epoch < epochs:
            rng = np.random.default_rng(seed + epoch)
            yield from loader.epoch(rng, batch_size, shuffle=shuffle,
                                    drop_remainder=drop_remainder)
            epoch += 1
    finally:
        loader.close()


def device_prefetch(host_iter: Iterator[dict], mean: np.ndarray,
                    std: np.ndarray, prefetch: int = 2,
                    sharding=None) -> Iterator[dict]:
    """Background thread stages batches onto the device ahead of compute.

    Yields batches with `images` already normalized float32 on device.
    `sharding`: optional dict of key -> jax.sharding.Sharding for multi-chip.

    Multi-chip note: with `sharding` set, the worker thread only does host
    work + async transfers; the (jitted) normalize runs on the CONSUMER
    thread.  Launching multi-device programs from two host threads at once
    can starve XLA:CPU's collective rendezvous on low-core hosts (the
    participant executions must co-schedule within a 40 s hard deadline —
    rendezvous.cc aborts the process past it), and on real multi-chip it
    serializes launch order, which keeps collective programs from
    interleaving between threads.
    """
    normalize = make_normalizer(mean, std)
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def put_device(batch: dict) -> dict:
        out = {}
        for k, v in batch.items():
            if sharding is not None and k in sharding:
                # host -> per-shard in ONE step; jnp.asarray first would
                # commit the full batch to device 0 and then redistribute
                # (an extra full-batch hop per key per step).  put_like is
                # device_put single-process, and under multi-host
                # (jax.process_count() > 1) uploads only this process's
                # rows of the (process-identical, seeded) global batch
                out[k] = put_like(np.asarray(v), sharding[k])
            else:
                out[k] = jnp.asarray(v)
        if sharding is None:
            out = apply_norm(out)
        return out

    def apply_norm(item: dict) -> dict:
        if "norm_mean" in item:
            item["images"] = normalize_per_record(
                item["images"], item.pop("norm_mean"), item.pop("norm_std"))
        else:
            item["images"] = normalize(item["images"])
        return item

    # a worker-thread exception must FAIL the consumer's epoch, not
    # silently truncate it (a swallowed per-batch error would let training
    # 'succeed' on a biased prefix of the data)
    error: list[BaseException] = []

    def worker():
        try:
            for batch in host_iter:
                q.put(put_device(batch))
        except BaseException as exc:  # noqa: BLE001 - re-raised below
            error.append(exc)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if sharding is not None:
            item = apply_norm(item)
        yield item
    if error:
        raise error[0]
