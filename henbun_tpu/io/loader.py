"""Python bindings for the C++ out-of-core minibatch loader.

Binds `csrc/dataloader.cpp` via ctypes (the image has no pybind11); the
shared library is built on first use with g++ and cached next to the source.
See :class:`OutOfCoreLoader` and :func:`henbun_tpu.io.streaming.optimize_streaming`
for the training integration.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "csrc")
_SO_PATH = os.path.join(_SRC_DIR, "_dataloader.so")
_LIB = None
_LOCK = threading.Lock()


def _build():
    src = os.path.join(_SRC_DIR, "dataloader.cpp")
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        src, "-o", _SO_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        src = os.path.join(_SRC_DIR, "dataloader.cpp")
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(src):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        lib.hb_loader_open.restype = ctypes.c_void_p
        lib.hb_loader_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.hb_loader_next.restype = ctypes.POINTER(ctypes.c_float)
        lib.hb_loader_next.argtypes = [ctypes.c_void_p]
        lib.hb_loader_release.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)
        ]
        lib.hb_loader_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def write_dataset(path, *arrays):
    """Write float32 arrays (same leading dim) as one row-major binary file of
    concatenated rows; returns (n_rows, row_floats, column slices)."""
    arrays = [np.ascontiguousarray(a, dtype=np.float32) for a in arrays]
    n = arrays[0].shape[0]
    flat = [a.reshape(n, -1) for a in arrays]
    assert all(f.shape[0] == n for f in flat)
    rows = np.concatenate(flat, axis=1)
    rows.tofile(path)
    slices, off = [], 0
    for f in flat:
        slices.append((off, off + f.shape[1]))
        off += f.shape[1]
    return n, rows.shape[1], slices


class OutOfCoreLoader:
    """Streams random megabatches from a binary float32 row file.

    Worker threads prefetch into a ring of `n_buffers` buffers while the
    device computes, so disk latency overlaps with training. Rows are sampled
    with replacement from the first `train_rows` rows (the Indexer's
    train-split contract).

    `block_rows > 0` switches to block-then-row sampling: each megabatch is
    assembled from random CONTIGUOUS runs of `block_rows` rows instead of
    independent rows. Random 40-byte-row reads amplify page IO ~100x on a
    >RAM file (each row touches a 4KB page); contiguous runs make the disk
    reads sequential. Requires a pre-shuffled file (rows within a run are
    file-neighbors) — the same contract as the on-device 'block' minibatch
    mode.
    """

    def __init__(self, path, n_rows, row_floats, batch_rows,
                 n_buffers=3, n_threads=2, seed=0, train_rows=0,
                 block_rows=0):
        self._lib = _lib()
        self.batch_rows = int(batch_rows)
        self.row_floats = int(row_floats)
        self._h = self._lib.hb_loader_open(
            str(path).encode(), int(n_rows), int(row_floats), int(batch_rows),
            int(n_buffers), int(n_threads), int(seed), int(train_rows),
            int(block_rows),
        )
        if not self._h:
            raise IOError("failed to open dataset %s" % path)

    def next(self):
        """Block until a prefetched megabatch is ready; returns a numpy COPY
        (the underlying buffer is immediately recycled to the prefetch ring)."""
        ptr = self._lib.hb_loader_next(self._h)
        n = self.batch_rows * self.row_floats
        arr = np.ctypeslib.as_array(ptr, shape=(self.batch_rows, self.row_floats))
        out = np.array(arr)  # copy out of the ring buffer
        self._lib.hb_loader_release(self._h, ptr)
        return out

    def close(self):
        if self._h:
            self._lib.hb_loader_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
