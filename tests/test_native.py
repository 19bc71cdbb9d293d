"""Native C++ pipeline tests: correctness vs numpy, build path."""

import numpy as np
import pytest

from resolution_pde_tpu.data import native


def test_native_gather_matches_numpy(rng):
    src = rng.standard_normal((100, 4, 32)).astype(np.float32)
    idx = rng.integers(0, 100, size=16)
    out = native.gather(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_native_gather_encode_matches_numpy(rng):
    src = rng.standard_normal((64, 2, 16)).astype(np.float32)
    idx = rng.integers(0, 64, size=24)
    mean, std = 0.5, 2.0
    out = native.gather_encode(src, idx, mean, std)
    np.testing.assert_allclose(out, (src[idx] - mean) / std, rtol=1e-6)


def test_native_library_builds():
    """The C++ library should build and load in this environment (g++ is
    part of the baked toolchain)."""
    native._load()
    assert native.NATIVE_AVAILABLE, "native pipeline failed to build/load"


def test_native_gather_large_parallel_path(rng):
    """Exercise the multithreaded branch (work > threshold)."""
    src = rng.standard_normal((512, 64, 64)).astype(np.float32)
    idx = rng.permutation(512)[:128]
    out = native.gather(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_non_contiguous_falls_back(rng):
    src = rng.standard_normal((32, 8, 8)).astype(np.float32)[:, ::2]
    idx = np.arange(8)
    out = native.gather(src, idx)  # silently numpy path
    np.testing.assert_array_equal(out, src[idx])
