"""Spatial (sequence-parallel) sharding correctness: with the grid axis
sharded over the mesh, XLA inserts the collectives for the FFT/DFT paths —
the result must match the unsharded computation exactly (SURVEY.md §7
step 7: distributed spectral conv for >1-chip grids)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from resolution_pde_tpu.models import FFNO2D, FNO2d
from resolution_pde_tpu.parallel import make_mesh


@pytest.mark.parametrize("impl", ["fft", "dft"])
def test_ffno2d_spatial_sharding_matches_replicated(rng, impl):
    mesh = make_mesh({"data": 2, "spatial": 4})
    model = FFNO2D(in_channels=1, out_channels=1, width=8, n_layers=2,
                   n_modes=8, spectral_impl=impl)
    x = jnp.asarray(rng.standard_normal((4, 1, 32, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x)

    ref = model.apply(params, x)

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "spatial",
                                                 None)))
    with mesh:
        out = jax.jit(model.apply)(params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fno2d_spatial_sharding_matches_replicated(rng):
    mesh = make_mesh({"data": 2, "spatial": 4})
    model = FNO2d(in_channels=1, out_channels=1, modes1=6, modes2=6,
                  width=8, n_blocks=1)
    x = jnp.asarray(rng.standard_normal((4, 1, 32, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    ref = model.apply(params, x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "spatial",
                                                 None)))
    with mesh:
        out = jax.jit(model.apply)(params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_spatially_sharded_gradients_match(rng):
    """Gradients through the sharded spectral conv equal unsharded ones."""
    mesh = make_mesh({"data": 2, "spatial": 4})
    model = FFNO2D(in_channels=1, out_channels=1, width=8, n_layers=1,
                   n_modes=8)
    x = jnp.asarray(rng.standard_normal((4, 1, 16, 16)), jnp.float32)
    y = jnp.roll(x, 2, axis=-1)
    params = model.init(jax.random.key(0), x)

    def loss(p, xx, yy):
        return jnp.mean((model.apply(p, xx) - yy) ** 2)

    g_ref = jax.grad(loss)(params, x, y)
    sh = NamedSharding(mesh, P("data", None, "spatial", None))
    with mesh:
        g_sh = jax.jit(jax.grad(loss))(params, jax.device_put(x, sh),
                                       jax.device_put(y, sh))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-5)
