"""Poseidon adapter / Swin operator tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resolution_pde_tpu.models.poseidon import (
    SwinOperator2d,
    load_pretrained_poseidon,
)
from resolution_pde_tpu.train import Trainer


def test_swin_operator_shapes_and_time_conditioning(rng):
    model = SwinOperator2d(in_channels=1, out_channels=1, embed_dim=16,
                           depths=(1, 1), n_heads=2, window_size=4,
                           patch_size=2)
    x = jnp.asarray(rng.standard_normal((2, 1, 32, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x, 1.0)
    out = model.apply(params, x, jnp.asarray([0.5, 1.0]))
    assert out["output"].shape == (2, 1, 32, 32)
    # different lead times give different outputs (conditioning is live)
    out2 = model.apply(params, x, jnp.asarray([5.0, 10.0]))
    assert float(jnp.abs(out["output"] - out2["output"]).max()) > 1e-6


def test_swin_operator_trains(rng):
    """The 'pos' model path through the reference calling convention."""
    model = SwinOperator2d(in_channels=1, out_channels=1, embed_dim=16,
                           depths=(1,), n_heads=2, window_size=4,
                           patch_size=2)
    x = rng.standard_normal((4, 1, 16, 16)).astype(np.float32)
    y = np.roll(x, 2, axis=-1)
    import optax

    params = model.init(jax.random.key(0), jnp.asarray(x), 1.0)
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, jnp.asarray(x), 1.0)["output"]
            return jnp.mean((pred - jnp.asarray(y)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_pretrained_poseidon_requires_scot():
    with pytest.raises(ImportError, match="scOT"):
        load_pretrained_poseidon()
