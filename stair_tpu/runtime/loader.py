"""ctypes bindings for the native runtime + the prefetching input pipeline.

The C++ library (:file:`native.cpp`) is compiled on demand with the system
toolchain and cached next to the source; every entry point has a numpy
fallback so the framework degrades gracefully on hosts without a compiler.

``FeatureArena`` packs all per-video features into one contiguous float32
block (one allocation, zero per-batch Python object traffic) and assembles
padded batches with the native multithreaded gather. ``PrefetchIterator``
runs any batch generator on a background thread with a bounded queue so host
packing overlaps device compute — the role torch DataLoader workers play in
the reference (train_module.py:282-283).
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "_native.so")
_lib = None
_lib_tried = False


def native_lib():
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.stair_native_version.restype = ctypes.c_int
        assert lib.stair_native_version() == 1
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.stair_gather_pad_f32.argtypes = [
            f32p, i64p, i32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, f32p, f32p, ctypes.c_int,
        ]
        lib.stair_span_to_attention.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int,
        ]
        lib.stair_gather_rows_f32.argtypes = [
            f32p, i64p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


DEFAULT_THREADS = min(16, os.cpu_count() or 1)


class FeatureArena:
    """All video features in one contiguous [total_rows, D] float32 block."""

    def __init__(self, feats: dict[str, np.ndarray]):
        self.dim = next(iter(feats.values())).shape[-1]
        self.offsets: dict[str, int] = {}
        self.lengths: dict[str, int] = {}
        total = 0
        for vid, arr in feats.items():
            self.offsets[vid] = total
            self.lengths[vid] = len(arr)
            total += len(arr)
        self.arena = np.empty((total, self.dim), np.float32)
        for vid, arr in feats.items():
            o = self.offsets[vid]
            self.arena[o:o + len(arr)] = arr

    def gather(self, video_ids: list[str], max_rows: int):
        """-> (feats [B, F, D], mask [B, F])."""
        B = len(video_ids)
        offsets = np.array(
            [self.offsets[v] for v in video_ids], np.int64
        )
        lengths = np.array(
            [self.lengths[v] for v in video_ids], np.int32
        )
        out = np.empty((B, max_rows, self.dim), np.float32)
        mask = np.empty((B, max_rows), np.float32)
        lib = native_lib()
        if lib is not None:
            lib.stair_gather_pad_f32(
                self.arena, offsets, lengths, B, max_rows, self.dim,
                out, mask, DEFAULT_THREADS,
            )
            return out, mask
        out.fill(0.0)
        mask.fill(0.0)
        for b, vid in enumerate(video_ids):
            n = min(self.lengths[vid], max_rows)
            o = self.offsets[vid]
            out[b, :n] = self.arena[o:o + n]
            mask[b, :n] = 1.0
        return out, mask


def span_to_attention_batch(intervals: np.ndarray, frames: int) -> np.ndarray:
    """[N, 2] fractional intervals -> [N, frames] weights (native or numpy)."""
    intervals = np.ascontiguousarray(intervals, np.float32)
    n = len(intervals)
    out = np.empty((n, frames), np.float32)
    lib = native_lib()
    if lib is not None:
        lib.stair_span_to_attention(intervals, n, frames, out,
                                    DEFAULT_THREADS)
        return out
    from stair_tpu.data.dataset import span_to_attention

    for i in range(n):
        out[i] = span_to_attention(tuple(intervals[i]), frames)
    return out


class PrefetchIterator:
    """Run a batch generator on a background thread with a bounded queue."""

    _DONE = object()

    def __init__(self, generator, depth: int = 2):
        self.queue: queue.Queue = queue.Queue(maxsize=depth)
        self.error = None

        def worker():
            try:
                for item in generator:
                    self.queue.put(item)
            except BaseException as err:  # propagate to the consumer
                self.error = err
            finally:
                self.queue.put(self._DONE)

        self.thread = threading.Thread(target=worker, daemon=True)
        self.thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self.queue.get()
        if item is self._DONE:
            if self.error is not None:
                raise self.error
            raise StopIteration
        return item
