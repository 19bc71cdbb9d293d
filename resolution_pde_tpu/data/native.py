"""ctypes bindings for the native (C++) data-pipeline kernels, with an
automatic build-on-first-use and a numpy fallback.

The native library (resolution_pde_tpu/native/fast_pipeline.cpp) provides
multithreaded batch gather and fused gather+standardize — the host-side hot
loop that feeds device batches. Use `gather(src, idx)` /
`gather_encode(src, idx, mean, std)`; both fall back to numpy when the
toolchain or the .so is unavailable (NATIVE_AVAILABLE tells you which path
is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "fast_pipeline.cpp")
_SO = os.path.join(_HERE, "..", "native", "libfast_pipeline.so")

_lib = None
_lock = threading.Lock()
NATIVE_AVAILABLE = False

# ABI version this binding expects; must match native_pipeline_version()
# in fast_pipeline.cpp. Bump BOTH whenever exported symbols change so a
# stale gitignored .so is rebuilt instead of silently disabling the
# native path.
_EXPECTED_ABI = 2


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _stale() -> bool:
    """The .so must be rebuilt: missing, older than the source, or built
    from a source with a different ABI version."""
    if not os.path.exists(_SO):
        return True
    if os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        return True
    try:
        lib = ctypes.CDLL(_SO)
        lib.native_pipeline_version.restype = ctypes.c_int
        return int(lib.native_pipeline_version()) != _EXPECTED_ABI
    except (OSError, AttributeError):
        return True


def _load():
    global _lib, NATIVE_AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        if os.path.exists(_SRC) and _stale():
            if not _build():
                _lib = False
                return False
        try:
            lib = ctypes.CDLL(_SO)
            lib.batch_gather_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.batch_gather_encode_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.c_float, ctypes.c_float,
            ]
            lib.pipeline_create.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.pipeline_create.restype = ctypes.c_void_p
            lib.pipeline_acquire.argtypes = [ctypes.c_void_p]
            lib.pipeline_acquire.restype = ctypes.c_int64
            lib.pipeline_slot.argtypes = [ctypes.c_void_p]
            lib.pipeline_slot.restype = ctypes.c_int64
            lib.pipeline_release.argtypes = [ctypes.c_void_p]
            lib.pipeline_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
            NATIVE_AVAILABLE = True
        except Exception:
            _lib = False
    return _lib


def _ptr_f32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ptr_i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def gather(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """src (N, ...) f32 contiguous, idx (B,) -> (B, ...) f32."""
    lib = _load()
    if not lib or src.dtype != np.float32 or not src.flags.c_contiguous:
        return np.ascontiguousarray(src[idx])
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    row = int(np.prod(src.shape[1:]))
    out = np.empty((len(idx), *src.shape[1:]), dtype=np.float32)
    lib.batch_gather_f32(_ptr_f32(src), _ptr_i64(idx), _ptr_f32(out),
                         len(idx), row)
    return out


def gather_encode(src: np.ndarray, idx: np.ndarray, mean: float,
                  std_plus_eps: float) -> np.ndarray:
    """Fused src[idx] standardization: (src[idx] - mean) / std_plus_eps."""
    lib = _load()
    if not lib or src.dtype != np.float32 or not src.flags.c_contiguous:
        return ((src[idx] - mean) / std_plus_eps).astype(np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    row = int(np.prod(src.shape[1:]))
    out = np.empty((len(idx), *src.shape[1:]), dtype=np.float32)
    lib.batch_gather_encode_f32(_ptr_f32(src), _ptr_i64(idx), _ptr_f32(out),
                                len(idx), row, float(mean),
                                float(std_plus_eps))
    return out


class BatchPipeline:
    """Background batch producer over (x, y) arrays: a C++ thread assembles
    batches for a given epoch order into a ring of preallocated buffers
    while the consumer runs the device step (the native input-pipeline
    runtime; see fast_pipeline.cpp pipeline_*).

    Iterate to receive (x_batch, y_batch). By default batches are COPIES
    (safe to hold); with copy=False they are views into the ring, valid
    only until the next iteration step — use only when the consumer
    transfers them immediately (e.g. jax.device_put).
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, order: np.ndarray,
                 batch_size: int, depth: int = 3, copy: bool = True):
        self.copy = copy
        assert x.dtype == np.float32 and x.flags.c_contiguous
        assert y.dtype == np.float32 and y.flags.c_contiguous
        self._x, self._y = x, y  # keep alive
        self._order = np.ascontiguousarray(order, dtype=np.int64)
        self.batch_size = batch_size
        xrow = int(np.prod(x.shape[1:]))
        yrow = int(np.prod(y.shape[1:]))
        self._xbufs = [np.empty((batch_size, *x.shape[1:]), np.float32)
                       for _ in range(depth)]
        self._ybufs = [np.empty((batch_size, *y.shape[1:]), np.float32)
                       for _ in range(depth)]
        xptrs = (ctypes.POINTER(ctypes.c_float) * depth)(
            *[_ptr_f32(b) for b in self._xbufs])
        yptrs = (ctypes.POINTER(ctypes.c_float) * depth)(
            *[_ptr_f32(b) for b in self._ybufs])
        lib = _load()
        self._lib = lib
        self._h = lib.pipeline_create(
            _ptr_f32(x), _ptr_f32(y), xrow, yrow, _ptr_i64(self._order),
            len(self._order), batch_size, depth, xptrs, yptrs)
        self._held = False

    def __iter__(self):
        return self

    def __next__(self):
        if self._h is None:
            raise StopIteration
        if self._held:
            self._lib.pipeline_release(self._h)
            self._held = False
        rows = self._lib.pipeline_acquire(self._h)
        if rows < 0:
            self.close()
            raise StopIteration
        slot = self._lib.pipeline_slot(self._h)
        self._held = True
        bx = self._xbufs[slot][:rows]
        by = self._ybufs[slot][:rows]
        if self.copy:
            return bx.copy(), by.copy()
        return bx, by

    def close(self):
        if self._h is not None:
            if self._held:
                self._lib.pipeline_release(self._h)
                self._held = False
            self._lib.pipeline_destroy(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
