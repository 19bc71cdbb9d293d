"""FNO/FFNO model tests: shapes, jit-ability, resolution generalization,
gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from resolution_pde_tpu.models import FNO1d, FNO2d, FFNO1D, FFNO2D


def test_fno1d_shapes_and_jit(rng):
    model = FNO1d(in_channels=1, out_channels=1, modes=12, width=16, n_blocks=2)
    x = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = jax.jit(model.apply)(params, x)
    assert y.shape == (2, 1, 64)
    assert np.isfinite(np.asarray(y)).all()


def test_fno2d_shapes(rng):
    model = FNO2d(in_channels=1, out_channels=1, modes1=6, modes2=6,
                  width=8, n_blocks=2)
    x = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 1, 32, 32)


def test_ffno1d_resolution_generalization(rng):
    """One parameter set must run at any resolution (effective-mode slicing)."""
    model = FFNO1D(in_channels=1, out_channels=1, width=16, n_layers=2,
                   n_modes=16)
    x64 = jnp.asarray(rng.standard_normal((2, 1, 64)), jnp.float32)
    params = model.init(jax.random.key(0), x64)
    for res in (16, 32, 64, 128):
        x = jnp.asarray(rng.standard_normal((2, 1, res)), jnp.float32)
        y = model.apply(params, x)
        assert y.shape == (2, 1, res)
        assert np.isfinite(np.asarray(y)).all()


def test_ffno2d_resolution_generalization(rng):
    model = FFNO2D(in_channels=1, out_channels=1, width=8, n_layers=2,
                   n_modes=8, ff_weight_norm=True, layer_norm=True,
                   n_ff_layers=2)
    x32 = jnp.asarray(rng.standard_normal((1, 1, 32, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x32)
    for res in (16, 32, 64):
        x = jnp.asarray(rng.standard_normal((1, 1, res, res)), jnp.float32)
        y = model.apply(params, x)
        assert y.shape == (1, 1, res, res)


def test_ffno1d_band_limited_consistency(rng):
    """FFNO predictions on a band-limited signal evaluated at two resolutions
    agree on the shared coarse grid — the core superresolution property."""
    model = FFNO1D(in_channels=1, out_channels=1, width=16, n_layers=2,
                   n_modes=8)
    n_hi, n_lo = 128, 64
    t_hi = np.arange(n_hi) / n_hi
    t_lo = np.arange(n_lo) / n_lo
    sig_hi = np.sin(2 * np.pi * 3 * t_hi) + 0.3 * np.cos(2 * np.pi * 5 * t_hi)
    sig_lo = np.sin(2 * np.pi * 3 * t_lo) + 0.3 * np.cos(2 * np.pi * 5 * t_lo)
    x_hi = jnp.asarray(sig_hi, jnp.float32)[None, None]
    x_lo = jnp.asarray(sig_lo, jnp.float32)[None, None]
    params = model.init(jax.random.key(0), x_hi)
    y_hi = np.asarray(model.apply(params, x_hi))[0, 0]
    y_lo = np.asarray(model.apply(params, x_lo))[0, 0]
    # FFNO ortho-norm FFT scales as 1/sqrt(N): outputs of band-limited inputs
    # at different N match on shared points up to the sqrt(N) ratio applied
    # inside each layer; with identical inputs sampled from the same function
    # the subsampled hi-res prediction should correlate strongly with lo-res.
    corr = np.corrcoef(y_hi[::2], y_lo)[0, 1]
    assert corr > 0.99


def test_fno1d_gradients_flow(rng):
    model = FNO1d(in_channels=1, out_channels=1, modes=8, width=8, n_blocks=1)
    x = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    def loss_fn(p):
        pred = model.apply(p, x)
        return jnp.mean((pred - y) ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_ffno_weight_norm_gradients(rng):
    model = FFNO1D(in_channels=1, out_channels=1, width=8, n_layers=1,
                   n_modes=4, ff_weight_norm=True, layer_norm=True)
    x = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    def loss_fn(p):
        return jnp.sum(model.apply(p, x) ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
