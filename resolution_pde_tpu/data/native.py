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


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _SO, _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib, NATIVE_AVAILABLE
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) and os.path.exists(_SRC):
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
