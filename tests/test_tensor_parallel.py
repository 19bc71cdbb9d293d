"""Tensor parallelism (parallel/tp.py): Megatron-style sharding of the
FFNO feed-forward GEMMs over a "model" mesh axis.

Correctness bar: a dp x tp training run must produce the SAME losses and
parameters as the single-device run (TP is a layout, not an algorithm
change), and the hidden-dim weights must actually be sharded (each device
holds 1/n_model of them).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from resolution_pde_tpu.models import FFNO2D
from resolution_pde_tpu.parallel import (
    ffno_tp_specs,
    make_mesh,
    shard_batch,
    shard_train_state,
)
from resolution_pde_tpu.train import Trainer


def _model():
    return FFNO2D(in_channels=1, out_channels=1, width=8, n_layers=2,
                  n_modes=8, ff_weight_norm=True, n_ff_layers=3,
                  layer_norm=True)


def _data(rng, batch=8):
    x = rng.standard_normal((batch, 1, 16, 16)).astype(np.float32)
    return x, np.roll(x, 2, axis=-1).astype(np.float32)


def test_tp_specs_shard_ff_hidden_only(rng):
    mesh = make_mesh({"data": 2, "model": 4})
    model = _model()
    x, _ = _data(rng)
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    specs = ffno_tp_specs(params, mesh)

    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda l: isinstance(l, P))[0]
    as_names = {"/".join(getattr(p, "key", str(p)) for p in path): spec
                for path, spec in flat}
    col = [k for k, s in as_names.items() if s == P(None, "model")]
    row = [k for k, s in as_names.items() if s == P("model", None)]
    # every layer's FF: first linear column-parallel, second row-parallel
    assert len(col) == 2 and all("WNDense_0" in k for k in col)
    assert len(row) == 2 and all("WNDense_1" in k for k in row)
    # spectral weights and projections replicated
    for k, s in as_names.items():
        if "fourier" in k or "FeedForward" not in k:
            assert s == P(), k


@pytest.mark.parametrize("mesh_axes", [{"data": 2, "model": 4},
                                       {"model": 8}])
def test_tp_training_matches_single_device(rng, mesh_axes):
    model = _model()
    x, y = _data(rng)

    # single-device reference run
    ref = Trainer(model, learning_rate=1e-3,
                  mesh=make_mesh({"data": 1}, devices=jax.devices()[:1]))
    rstate = ref.init(x[:2])
    ref_losses = []
    for _ in range(3):
        rstate, loss = ref._train_step(rstate, jnp.asarray(x),
                                       jnp.asarray(y), None)
        ref_losses.append(float(loss))

    # dp x tp run
    mesh = make_mesh(mesh_axes)
    t = Trainer(model, learning_rate=1e-3, mesh=mesh)
    state = t.init(x[:2])
    specs = ffno_tp_specs(state.params, mesh)
    t = Trainer(model, learning_rate=1e-3, mesh=mesh, param_specs=specs)
    state = shard_train_state(state, mesh, specs, t.optimizer)

    n_model = mesh_axes.get("model", 1)
    # hidden-dim kernels are actually distributed
    k0 = state.params["FSpectralConv2d_0"]["FeedForward_0"]["WNDense_0"][
        "TorchLinear_0"]["kernel"]
    shard_shape = k0.sharding.shard_shape(k0.shape)
    assert shard_shape[1] == k0.shape[1] // n_model

    losses = []
    for _ in range(3):
        (xs, ys), w = shard_batch((jnp.asarray(x), jnp.asarray(y)), mesh)
        state, loss = t._train_step(state, xs, ys, None, w)
        losses.append(float(loss))

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=2e-6)
    # updated params still carry the TP sharding (constraint pins it)
    k0 = state.params["FSpectralConv2d_0"]["FeedForward_0"]["WNDense_0"][
        "TorchLinear_0"]["kernel"]
    assert k0.sharding.shard_shape(k0.shape)[1] == k0.shape[1] // n_model
    # and the final full parameters agree with the reference run
    pr = jax.tree_util.tree_map(np.asarray, rstate.params)
    pt = jax.tree_util.tree_map(np.asarray, state.params)
    for a, b in zip(jax.tree_util.tree_leaves(pr),
                    jax.tree_util.tree_leaves(pt)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_tp_specs_indivisible_dims_stay_replicated(rng):
    """A hidden dim that doesn't divide the model axis falls back to
    replicated instead of producing an invalid sharding."""
    mesh = make_mesh({"model": 8})
    model = FFNO2D(in_channels=1, out_channels=1, width=6, n_layers=1,
                   n_modes=4, n_ff_layers=2, factor=2)  # hidden 12, 8∤12
    x, _ = _data(rng, batch=4)
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]
    specs = ffno_tp_specs(params, mesh)
    for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda l: isinstance(l, P)):
        assert s == P()
