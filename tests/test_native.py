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


def test_batch_pipeline_matches_plain_gather():
    """The background producer ring yields exactly the plain loader's
    batches in order (including the short straggler)."""
    from resolution_pde_tpu.data import native

    if not native._load():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, 3, 8)).astype(np.float32)
    y = rng.standard_normal((37, 1, 8)).astype(np.float32)
    order = rng.permutation(37)
    got = []
    pipe = native.BatchPipeline(x, y, order, batch_size=8)
    for bx, by in pipe:
        got.append((bx.copy(), by.copy()))  # views are slot-recycled
    assert len(got) == 5
    for i, (bx, by) in enumerate(got):
        sel = order[i * 8:(i + 1) * 8]
        np.testing.assert_array_equal(bx, x[sel])
        np.testing.assert_array_equal(by, y[sel])


def test_loader_uses_pipeline_and_matches_fallback():
    from resolution_pde_tpu.data.dataset import ArrayDataset
    from resolution_pde_tpu.data.loader import Loader
    from resolution_pde_tpu.data import native

    rng = np.random.default_rng(1)
    ds = ArrayDataset(rng.standard_normal((20, 2, 4)).astype(np.float32),
                      rng.standard_normal((20, 2, 4)).astype(np.float32))
    a = Loader(ds, 6, shuffle=True, seed=7)
    b = Loader(ds, 6, shuffle=True, seed=7)
    b.use_pipeline = False
    batches_a = [(bx.copy(), by.copy()) for bx, by in a]
    batches_b = list(b)
    assert len(batches_a) == len(batches_b)
    for (ax, ay), (bx, by) in zip(batches_a, batches_b):
        np.testing.assert_array_equal(ax, bx)
        np.testing.assert_array_equal(ay, by)


def test_native_abi_version_matches_binding():
    """A stale gitignored .so (older source / different ABI) must be
    rebuilt by _load(), never silently fall back to numpy: after a
    successful load the exported version equals the binding's expectation."""
    import ctypes

    from resolution_pde_tpu.data import native

    lib = native._load()
    if not lib:
        import pytest
        pytest.skip("no native toolchain")
    lib.native_pipeline_version.restype = ctypes.c_int
    assert int(lib.native_pipeline_version()) == native._EXPECTED_ABI
    assert not native._stale()
