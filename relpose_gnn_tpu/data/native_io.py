"""ctypes binding for the native graphio runtime (native/graphio.cc).

Compiles `libgraphio.so` on first use (g++, cached next to the source) and
exposes:
  * `NativeArray` — mmap'd .npy record store with multithreaded gather;
  * `NativeBatchLoader` — async prefetching batch loader over a packed
    graph dataset directory (images/poses/adj), the C++ replacement for the
    reference's DataLoader worker processes.

Falls back cleanly: `available()` is False when no compiler is present, and
`data/pipeline.py` keeps working on pure-numpy memmaps.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))), "native")
_SO_PATH = osp.join(_NATIVE_DIR, "libgraphio.so")
_SRC_PATH = osp.join(_NATIVE_DIR, "graphio.cc")

_lib = None
_lib_lock = threading.Lock()


def _build() -> str:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO_PATH,
           _SRC_PATH, "-lpthread"]
    subprocess.check_call(cmd)
    return _SO_PATH


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not osp.isfile(_SO_PATH) or (osp.getmtime(_SO_PATH)
                                        < osp.getmtime(_SRC_PATH)):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.gio_open.restype = ctypes.c_void_p
        lib.gio_open.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.gio_close.argtypes = [ctypes.c_void_p]
        lib.gio_gather.restype = ctypes.c_int
        lib.gio_gather.argtypes = [ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.c_int64, ctypes.c_void_p,
                                   ctypes.c_int]
        lib.gpf_create.restype = ctypes.c_void_p
        lib.gpf_create.argtypes = [ctypes.POINTER(ctypes.c_void_p),
                                   ctypes.POINTER(ctypes.c_uint64),
                                   ctypes.c_int, ctypes.c_int]
        lib.gpf_submit.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_int64),
                                   ctypes.c_int64,
                                   ctypes.POINTER(ctypes.c_void_p)]
        lib.gpf_wait.argtypes = [ctypes.c_void_p]
        lib.gpf_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _npy_header(path: str) -> tuple[int, tuple, np.dtype]:
    """Parse a .npy header -> (data_offset, shape, dtype)."""
    with open(path, "rb") as f:
        version = np.lib.format.read_magic(f)
        shape, fortran, dtype = np.lib.format._read_array_header(f, version)
        assert not fortran
        return f.tell(), shape, dtype


class NativeArray:
    """One mmap'd .npy array with native multithreaded record gather."""

    def __init__(self, path: str):
        self._lib = _load()
        offset, shape, dtype = _npy_header(path)
        self.shape = shape
        self.dtype = dtype
        self.rec_shape = shape[1:]
        self.rec_bytes = int(np.prod(shape[1:], dtype=np.int64)
                             * dtype.itemsize)
        self._h = self._lib.gio_open(path.encode(), offset)
        if not self._h:
            raise OSError(f"gio_open failed: {path}")

    def gather(self, indices: np.ndarray, out: np.ndarray | None = None,
               threads: int = 4) -> np.ndarray:
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        if out is None:
            out = np.empty((n,) + self.rec_shape, self.dtype)
        assert out.flags["C_CONTIGUOUS"] and out.nbytes == n * self.rec_bytes
        rc = self._lib.gio_gather(
            self._h, self.rec_bytes,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            out.ctypes.data_as(ctypes.c_void_p), threads)
        assert rc == 0
        return out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.gio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeConcatDataset:
    """Multi-root concat view with native block gathers — a drop-in for
    `ConcatPackedDataset.batch` (same keys, mean/std, __len__) that the
    training feed uses when the C++ runtime is available.

    Per batch: indices are grouped by source store (stable sort), each
    group is gathered by the native thread pool directly into a contiguous
    slice of the preallocated output, so a multi-scene batch costs one
    gather call per touched store instead of a Python loop per record.
    Rows come out grouped by store — irrelevant for shuffled training
    batches (and deterministic given the indices).

    Respects each store's meta.json `num_graphs` (shrunk stores keep
    longer preallocated memmaps — see data/packed.py).
    """

    KEYS = ("images", "poses", "adj")

    def __init__(self, roots: list[str], threads: int = 4):
        import json

        self.threads = threads
        self.parts = []
        sizes = []
        for root in roots:
            with open(osp.join(root, "meta.json")) as f:
                meta = json.load(f)
            arrays = {k: NativeArray(osp.join(root, f"{k}.npy"))
                      for k in self.KEYS}
            self.parts.append(arrays)
            sizes.append(meta["num_graphs"])
            self._means = getattr(self, "_means", [])
            self._stds = getattr(self, "_stds", [])
            self._means.append(np.asarray(meta["mean"], np.float32))
            self._stds.append(np.asarray(meta["std"], np.float32))
            if not hasattr(self, "mean"):
                self.mean = np.asarray(meta["mean"], np.float32)
                self.std = np.asarray(meta["std"], np.float32)
        rec0 = self.parts[0]["images"].rec_shape
        assert all(p["images"].rec_shape == rec0 for p in self.parts), \
            "stores must share graph shape"
        # the native gather memcpys raw record bytes into one output
        # buffer: dtypes must agree exactly (a uint8 store's bytes
        # reinterpreted as float32 would be garbage, not even a cast)
        for k in self.KEYS:
            d0 = self.parts[0][k].dtype
            if any(p[k].dtype != d0 for p in self.parts):
                raise ValueError(
                    f"mixed {k} dtypes across stores {roots}; rebuild "
                    f"with one dtype (PackedGraphWriter dtype=)")
        self._offsets = np.concatenate([[0], np.cumsum(sizes)])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def batch(self, indices: np.ndarray) -> dict:
        indices = np.asarray(indices)
        which = np.searchsorted(self._offsets, indices, side="right") - 1
        local = (indices - self._offsets[which]).astype(np.int64)
        order = np.argsort(which, kind="stable")
        which, local = which[order], local[order]
        n = len(indices)
        out = {k: np.empty((n,) + self.parts[0][k].rec_shape,
                           self.parts[0][k].dtype) for k in self.KEYS}
        lo = 0
        while lo < n:
            hi = lo
            while hi < n and which[hi] == which[lo]:
                hi += 1
            arrays = self.parts[int(which[lo])]
            for k in self.KEYS:
                arrays[k].gather(local[lo:hi], out=out[k][lo:hi],
                                 threads=self.threads)
            lo = hi
        # per-record normalization stats: each scene normalizes with its
        # OWN header stats (see ConcatPackedDataset.batch)
        out["norm_mean"] = np.stack(self._means)[which]
        out["norm_std"] = np.stack(self._stds)[which]
        return out

    def close(self):
        for p in getattr(self, "parts", []):
            for a in p.values():
                a.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeBatchLoader:
    """Async double-buffered batch loader over a packed dataset directory.

    Usage:
        loader = NativeBatchLoader(root)
        for batch in loader.epoch(rng, batch_size=8):  # dict of np arrays
            ...
    """

    KEYS = ("images", "poses", "adj")

    def __init__(self, root: str, threads: int = 4):
        import json

        self._lib = _load()
        self.arrays = {k: NativeArray(osp.join(root, f"{k}.npy"))
                       for k in self.KEYS}
        # shrunk stores (skipped frames) keep longer preallocated memmaps;
        # meta.json num_graphs is the number of VALID records — indexing
        # past it would feed unwritten all-zero graphs (see data/packed.py)
        self.num_records = self.arrays["images"].shape[0]
        meta_path = osp.join(root, "meta.json")
        if osp.isfile(meta_path):
            with open(meta_path) as f:
                n = json.load(f).get("num_graphs")
            if n is not None:
                self.num_records = min(self.num_records, int(n))
        handles = (ctypes.c_void_p * 3)(
            *[self.arrays[k]._h for k in self.KEYS])
        recs = (ctypes.c_uint64 * 3)(
            *[self.arrays[k].rec_bytes for k in self.KEYS])
        self._pf = self._lib.gpf_create(handles, recs, 3, threads)
        self._pending: dict | None = None

    def __len__(self):
        return self.num_records

    def _alloc(self, n: int) -> dict:
        return {k: np.empty((n,) + self.arrays[k].rec_shape,
                            self.arrays[k].dtype) for k in self.KEYS}

    def _submit(self, indices: np.ndarray) -> dict:
        indices = np.ascontiguousarray(indices, np.int64)
        bufs = self._alloc(len(indices))
        ptrs = (ctypes.c_void_p * 3)(
            *[bufs[k].ctypes.data_as(ctypes.c_void_p).value
              for k in self.KEYS])
        self._lib.gpf_submit(
            self._pf,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices), ptrs)
        # keep references alive until wait()
        return {"bufs": bufs, "indices": indices, "ptrs": ptrs}

    def epoch(self, rng: np.random.Generator, batch_size: int,
              shuffle: bool = True, drop_remainder: bool = True):
        order = (rng.permutation(self.num_records) if shuffle
                 else np.arange(self.num_records))
        end = (self.num_records - self.num_records % batch_size
               if drop_remainder else self.num_records)
        starts = list(range(0, end, batch_size))
        if not starts:
            return
        pending = self._submit(order[starts[0]:starts[0] + batch_size])
        for s in starts[1:]:
            self._lib.gpf_wait(self._pf)
            ready = pending["bufs"]
            pending = self._submit(order[s:s + batch_size])
            yield ready
        self._lib.gpf_wait(self._pf)
        yield pending["bufs"]

    def close(self):
        if getattr(self, "_pf", None):
            self._lib.gpf_destroy(self._pf)
            self._pf = None
        for a in self.arrays.values():
            a.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
