"""UNet and CNO model tests: shapes, BatchNorm state handling through the
Trainer, antialiased activation parity vs torch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resolution_pde_tpu.models import get_model
from resolution_pde_tpu.models.unet import UNet1d, UNet2d
from resolution_pde_tpu.models.cno import CNO1d, CNO2d
from resolution_pde_tpu.ops.interpolation import (
    bicubic_resize_1d,
    cno_lrelu_1d,
)
from resolution_pde_tpu.train import Trainer


def test_bicubic_resize_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    xt = torch.from_numpy(x).unsqueeze(2)
    for out in (32, 128):
        expected = F.interpolate(xt, size=(1, out), mode="bicubic",
                                 antialias=True)[:, :, 0].numpy()
        got = np.asarray(bicubic_resize_1d(jnp.asarray(x), out))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_cno_lrelu_matches_torch(rng):
    """Full CNO_LReLu chain: up 2x -> LeakyReLU -> down (CNO1d.py:41-45)."""
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((2, 4, 32)).astype(np.float32)
    xt = torch.from_numpy(x).unsqueeze(2)
    t = F.interpolate(xt, size=(1, 64), mode="bicubic", antialias=True)
    t = torch.nn.functional.leaky_relu(t)
    expected = F.interpolate(t, size=(1, 32), mode="bicubic",
                             antialias=True)[:, :, 0].numpy()
    got = np.asarray(cno_lrelu_1d(jnp.asarray(x), 32, 32))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_unet1d_shapes_and_batchstats(rng):
    model = UNet1d(in_channels=1, out_channels=1, width=8)
    x = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    assert "batch_stats" in variables
    y, updates = model.apply(variables, x, deterministic=False,
                             mutable=["batch_stats"])
    assert y.shape == (2, 1, 64)
    # eval mode uses running stats without mutation
    y_eval = model.apply(variables, x, deterministic=True)
    assert y_eval.shape == (2, 1, 64)


def test_unet1d_groupnorm_has_no_batchstats(rng):
    model = UNet1d(in_channels=1, out_channels=1, width=8, use_groupnorm=True)
    x = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    assert "batch_stats" not in variables


def test_unet2d_shapes(rng):
    model = UNet2d(in_channels=1, out_channels=1, width=8)
    x = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x, deterministic=True)
    assert y.shape == (2, 1, 32, 32)


def test_unet_trains_through_trainer(rng):
    """Trainer must thread batch_stats through train and eval steps."""
    model = UNet1d(in_channels=1, out_channels=1, width=8)
    x = rng.standard_normal((16, 1, 32)).astype(np.float32)
    y = np.roll(x, 2, axis=-1)
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init(x[:2])
    assert state.model_state  # batch_stats present
    old_stats = jax.tree_util.tree_leaves(state.model_state)[0].copy()
    state, loss = trainer.train_epoch(state, [(x, y)])
    new_stats = jax.tree_util.tree_leaves(state.model_state)[0]
    assert np.isfinite(loss)
    assert not np.allclose(np.asarray(old_stats), np.asarray(new_stats))
    val = trainer.evaluate(state, [(x, y)])
    assert np.isfinite(val)


def test_cno1d_shapes(rng):
    model = CNO1d(in_dim=1, out_dim=1, size=64, N_layers=2, N_res=1,
                  N_res_neck=1, channel_multiplier=8)
    x = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x, deterministic=True)
    assert y.shape == (2, 1, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_cno1d_rejects_wrong_size(rng):
    model = CNO1d(in_dim=1, out_dim=1, size=64, N_layers=2)
    x = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    with pytest.raises(ValueError, match="built for size"):
        model.init(jax.random.key(0), x)


def test_cno2d_shapes_and_training(rng):
    model = CNO2d(in_dim=1, out_dim=1, size=32, N_layers=2, N_res=1,
                  N_res_neck=1, channel_multiplier=8)
    x = rng.standard_normal((4, 1, 32, 32)).astype(np.float32)
    y = np.roll(x, 2, axis=-1)
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init(x[:2])
    state, loss = trainer.train_epoch(state, [(x, y)])
    assert np.isfinite(loss)


def test_registry_has_new_models():
    assert get_model("models.unet.UNet1d") is UNet1d
    assert get_model("models.CNO2d.CNO2d") is CNO2d
