"""Driver-contract regression tests: entry() compile-check and the
multichip dryrun on the virtual CPU mesh."""

import sys

import numpy as np
import jax


def _load_graft():
    sys.path.insert(0, "/root/repo")
    try:
        import __graft_entry__ as g
        return g
    finally:
        sys.path.remove("/root/repo")


def test_entry_compiles_and_runs():
    g = _load_graft()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (4, 1, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    g = _load_graft()
    g.dryrun_multichip(8)  # raises on failure


def test_dryrun_multichip_odd_device_count():
    """Pure-dp fallback when the count isn't even."""
    g = _load_graft()
    g.dryrun_multichip(1)
