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


def test_import_unet2d_checkpoint(tmp_path, rng):
    """Reference UNet2d .pt -> our UNet2d; forward parity incl. BatchNorm
    running stats and the transposed-conv tap flips."""
    import torch
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.unet import UNet2d as RefUNet2d
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models.unet import UNet2d
    from resolution_pde_tpu.utils.torch_import import (
        load_torch_state_dict, import_unet2d)

    torch.manual_seed(0)
    ref = RefUNet2d(in_channels=2, out_channels=1, width=4)
    # make running stats non-trivial
    with torch.no_grad():
        ref.train()
        ref(torch.randn(4, 2, 32, 32))
    ref.eval()
    path = str(tmp_path / "unet2d.pt")
    torch.save({"model_state_dict": ref.state_dict()}, path)

    variables = import_unet2d(load_torch_state_dict(path))
    x = rng.standard_normal((2, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    mine = UNet2d(in_channels=2, out_channels=1, width=4)
    got = np.asarray(mine.apply(variables, jnp.asarray(x),
                                deterministic=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ndim", [1, 2])
def test_import_cno_checkpoint(tmp_path, rng, ndim):
    """Reference CNO1d/CNO2d .pt -> our CNO; forward parity across the
    interleaved encoder/ED_expansion/decoder block mapping."""
    import torch
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        if ndim == 1:
            from models.CNO1d import CNO1d as RefCNO
        else:
            from models.CNO2d import CNO2d as RefCNO
    finally:
        sys.path.remove(REF)
    from resolution_pde_tpu.models.cno import CNO1d, CNO2d
    from resolution_pde_tpu.utils.torch_import import (
        load_torch_state_dict, import_cno1d, import_cno2d)

    torch.manual_seed(1)
    size, nl, n_res, n_res_neck = 32, 2, 2, 2
    ref = RefCNO(in_dim=1, out_dim=1, size=size, N_layers=nl, N_res=n_res,
                 N_res_neck=n_res_neck, channel_multiplier=8, use_bn=True)
    shape = (3, 1, size) if ndim == 1 else (3, 1, size, size)
    with torch.no_grad():
        ref.train()
        ref(torch.randn(*shape))
    ref.eval()
    path = str(tmp_path / "cno.pt")
    torch.save({"model_state_dict": ref.state_dict()}, path)

    importer = import_cno1d if ndim == 1 else import_cno2d
    variables = importer(load_torch_state_dict(path), n_layers=nl,
                         n_res=n_res, n_res_neck=n_res_neck)
    cls = CNO1d if ndim == 1 else CNO2d
    mine = cls(in_dim=1, out_dim=1, size=size, N_layers=nl, N_res=n_res,
               N_res_neck=n_res_neck, channel_multiplier=8, use_bn=True)
    x = rng.standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(mine.apply(variables, jnp.asarray(x),
                                deterministic=True))
    # CNO forwards stack ~40 conv/BN/antialiased-resize ops; resize kernels
    # differ at ~1e-6 per op between torch and jax.image, so parity is
    # rel-L2 (matching the FFNO multi-res golden's criterion)
    rel = (np.linalg.norm(got - expected)
           / (np.linalg.norm(expected) + 1e-8))
    assert rel < 1e-4, f"rel-L2 {rel:.2e}"


def test_import_s4_model_checkpoint(tmp_path, rng):
    """Reference S4Model (DPLR S4Blocks) .pt -> our S4Model; forward
    parity (autoregressive_eval.py:121-122 reload path)."""
    import types

    import torch
    import jax
    import jax.numpy as jnp

    added = []
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        plu = types.ModuleType("pytorch_lightning.utilities")
        plu.rank_zero_only = lambda fn: fn
        pl.utilities = plu
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.utilities"] = plu
        added = ["pytorch_lightning", "pytorch_lightning.utilities"]
    sys.path.insert(0, REF)
    try:
        from models.s4_1d import S4Model as RefS4Model
    finally:
        sys.path.remove(REF)
        for m in added:
            sys.modules.pop(m, None)
    from resolution_pde_tpu.models.s4 import S4Model
    from resolution_pde_tpu.utils.torch_import import (
        load_torch_state_dict, import_s4_model)

    torch.manual_seed(2)
    h, L, n_layers = 8, 16, 2
    ref = RefS4Model(d_input=1, d_output=1, d_model=h, n_layers=n_layers,
                     dropout=0.0, prenorm=False)
    ref.eval()
    x = rng.standard_normal((2, 1, L)).astype(np.float32)
    with torch.no_grad():
        # first forward attunes each kernel's C-tilde to length L
        expected = ref(torch.from_numpy(x)).numpy()
    path = str(tmp_path / "s4.pt")
    torch.save({"model_state_dict": ref.state_dict()}, path)

    params = import_s4_model(load_torch_state_dict(path),
                             n_layers=n_layers)
    mine = S4Model(d_input=1, d_output=1, d_model=h, n_layers=n_layers,
                   dropout=0.0, prenorm=False, mode="dplr")
    got = np.asarray(jax.jit(
        lambda xx: mine.apply({"params": params}, xx))(jnp.asarray(x)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
