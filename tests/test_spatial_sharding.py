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


@pytest.mark.parametrize("impl", ["fft", "dft", "dft_v3"])
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


def test_straggler_batch_pad_and_mask():
    """A straggler batch (B % data-axis != 0) must produce EXACTLY the same
    loss and parameter update as the unpadded batch on a single device —
    pad rows are masked out of the loss (VERDICT r1 weak #4)."""
    from resolution_pde_tpu.models import FFNO1D
    from resolution_pde_tpu.parallel.mesh import make_mesh, shard_batch
    from resolution_pde_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 1, 32)), jnp.float32)  # 5 % 8 != 0
    y = jnp.roll(x, 3, axis=-1)
    model = FFNO1D(in_channels=1, out_channels=1, width=8, n_layers=1,
                   n_modes=4)

    mesh8 = make_mesh({"data": 8})
    tr8 = Trainer(model, learning_rate=1e-3, mesh=mesh8)
    s8 = tr8.init(x[:1])
    (xs, ys), w = shard_batch((x, y), mesh8)
    assert xs.shape[0] == 8 and w is not None
    assert float(jnp.sum(w)) == 5.0
    s8, loss8 = tr8._train_step(s8, xs, ys, None, w)

    mesh1 = make_mesh({"data": 1}, devices=jax.devices()[:1])
    tr1 = Trainer(model, learning_rate=1e-3, mesh=mesh1)
    s1 = tr1.init(x[:1])
    s1, loss1 = tr1._train_step(s1, x, y, None)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s8.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_three_axis_multislice_train_step():
    """One jitted train step over a (dcn=2, data=2, spatial=2) multislice
    mesh: batch sharded over (dcn, data), grid over spatial; XLA inserts
    the cross-slice gradient reduction (VERDICT r1 item #8)."""
    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.parallel.mesh import (
        batch_sharding, make_multislice_mesh, shard_batch)
    from resolution_pde_tpu.train import Trainer

    mesh = make_multislice_mesh(2, {"data": 2, "spatial": 2})
    assert mesh.axis_names == ("dcn", "data", "spatial")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 1, 16, 16)), jnp.float32)
    y = jnp.roll(x, 1, axis=-1)
    model = FFNO2D(in_channels=1, out_channels=1, width=8, n_layers=1,
                   n_modes=4)
    tr = Trainer(model, learning_rate=1e-3, mesh=mesh)
    state = tr.init(x[:1])
    (xs, ys), w = shard_batch((x, y), mesh)
    assert w is None  # 8 % (2*2) == 0
    # batch rides (dcn, data)
    spec = xs.sharding.spec
    assert spec[0] == ("dcn", "data")
    state, loss = tr._train_step(state, xs, ys, None)
    assert np.isfinite(float(loss))


def test_bn_model_straggler_replicates_for_exact_stats():
    """BatchNorm models couple samples through the batch statistics, so a
    padded straggler would skew the stats of real rows; the trainer must
    fall back to replicating those batches (exact) — one epoch over an
    indivisible batch must match the single-device run bit-close,
    INCLUDING the running batch_stats."""
    from resolution_pde_tpu.models.unet import UNet1d
    from resolution_pde_tpu.parallel.mesh import make_mesh
    from resolution_pde_tpu.train import Trainer

    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 1, 32)).astype(np.float32)  # 5 % 8 != 0
    y = np.roll(x, 3, axis=-1)
    model = UNet1d(in_channels=1, out_channels=1, width=4)

    mesh8 = make_mesh({"data": 8})
    tr8 = Trainer(model, learning_rate=1e-3, mesh=mesh8)
    s8 = tr8.init(jnp.asarray(x[:1]))
    assert s8.model_state, "UNet1d should carry batch_stats"
    s8, _ = tr8.train_epoch(s8, [(x, y)])

    mesh1 = make_mesh({"data": 1}, devices=jax.devices()[:1])
    tr1 = Trainer(model, learning_rate=1e-3, mesh=mesh1)
    s1 = tr1.init(jnp.asarray(x[:1]))
    s1, _ = tr1.train_epoch(s1, [(x, y)])

    for a, b in zip(jax.tree_util.tree_leaves(s8.model_state),
                    jax.tree_util.tree_leaves(s1.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s8.params),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
