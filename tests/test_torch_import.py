"""Torch checkpoint import tests: save a reference-format checkpoint, import
to flax params, forward parity."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference checkout not available",
)


def test_import_ffno1d_checkpoint(tmp_path, rng):
    import torch
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.ffno import FFNO1D as RefFFNO1D
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models import FFNO1D
    from resolution_pde_tpu.utils.torch_import import (
        load_torch_state_dict, import_ffno1d)

    kw = dict(width=8, n_layers=2, n_modes=6, factor=2,
              ff_weight_norm=False, n_ff_layers=2, layer_norm=True,
              dropout=0.0, mode="full", activation="identity")
    ref = RefFFNO1D(in_channels=1, out_channels=1, **kw)
    ref.eval()
    path = str(tmp_path / "ckpt.pt")
    # the reference checkpoint format (main_1d.py:197-203)
    torch.save({"model_state_dict": ref.state_dict(), "loss_history": []},
               path)

    sd = load_torch_state_dict(path)
    params = import_ffno1d(sd, n_layers=2, n_ff_layers=2, layer_norm=True)

    x = rng.standard_normal((2, 1, 32)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    mine = FFNO1D(in_channels=1, out_channels=1, use_grid=False, **kw)
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_import_ffno1d_weight_normed(tmp_path, rng):
    """ff_weight_norm=True path (the shipped ffno_1d config uses it)."""
    import torch
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.ffno import FFNO1D as RefFFNO1D
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models import FFNO1D
    from resolution_pde_tpu.utils.torch_import import (
        load_torch_state_dict, import_ffno1d)

    kw = dict(width=8, n_layers=1, n_modes=4, factor=2,
              ff_weight_norm=True, n_ff_layers=2, layer_norm=False,
              dropout=0.0, mode="full", activation="identity")
    ref = RefFFNO1D(in_channels=1, out_channels=1, **kw)
    ref.eval()
    path = str(tmp_path / "ckpt.pt")
    torch.save({"model_state_dict": ref.state_dict()}, path)

    sd = load_torch_state_dict(path)
    params = import_ffno1d(sd, n_layers=1, n_ff_layers=2, layer_norm=False)

    x = rng.standard_normal((2, 1, 16)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    mine = FFNO1D(in_channels=1, out_channels=1, use_grid=False, **kw)
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_import_fno1d_checkpoint(tmp_path, rng):
    import torch
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.fno import FNO1d as RefFNO1d
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models import FNO1d
    from resolution_pde_tpu.utils.torch_import import (
        load_torch_state_dict, import_fno1d)

    ref = RefFNO1d(in_channels=1, out_channels=1, modes=6, width=8,
                   n_blocks=2)
    ref.eval()
    path = str(tmp_path / "ckpt.pt")
    torch.save({"model_state_dict": ref.state_dict()}, path)
    params = import_fno1d(load_torch_state_dict(path), n_blocks=2)

    x = rng.standard_normal((2, 1, 32)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    mine = FNO1d(in_channels=1, out_channels=1, modes=6, width=8, n_blocks=2)
    got = np.asarray(mine.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
