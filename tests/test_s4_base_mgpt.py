"""Tests for the configurable S4 base/seq models, IO processors, and the
MoE-GPT operator."""

import numpy as np
import jax
import jax.numpy as jnp

from resolution_pde_tpu.models import io_processors as iop
from resolution_pde_tpu.models.s4_base import (
    S4BaseModel,
    S4SeqModel,
    OneToSeqModel,
    predict_chunked,
)
from resolution_pde_tpu.models.mgpt import MoEGPTNO, LinearAttention


def test_io_processor_roundtrips(rng):
    x = jnp.asarray(rng.standard_normal((2, 5, 8, 3)), jnp.float32)  # B,T,S,H
    bs = iop.batch_space(x)
    assert bs.shape == (16, 5, 3)
    back = iop.unbatch_space(bs, x.shape)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))

    sh = iop.space_to_hidden(x)
    assert sh.shape == (2, 5, 24)
    np.testing.assert_allclose(
        np.asarray(iop.space_from_hidden(sh, x.shape)), np.asarray(x))

    bt = iop.batch_time(x)
    assert bt.shape == (10, 8, 3)
    np.testing.assert_allclose(
        np.asarray(iop.unbatch_time(bt, x.shape)), np.asarray(x))


def test_grid_concat_processors(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 3)), jnp.float32)
    grid = jnp.asarray(rng.standard_normal((2, 8, 1)), jnp.float32)
    assert iop.concat(x, grid).shape == (2, 8, 4)
    assert iop.concat_nd(x, grid).shape == (2, 8, 3, 2)
    assert iop.concat_trans_squeeze_1d(
        x[..., :1], grid).shape == (2, 16)
    xt = jnp.asarray(rng.standard_normal((2, 8, 5, 3)), jnp.float32)
    assert iop.concat_trans(xt, grid).shape == (2, 5, 8, 4)
    assert iop.concat_flat_trans(xt, grid).shape == (2, 5, 8 * 3 + 8)


def test_s4_base_model(rng):
    model = S4BaseModel(d_input=2, d_output=1, d_model=16, n_layers=2,
                        ffn_type="ffn", residual_type="identity")
    x = jnp.asarray(rng.standard_normal((2, 32, 1)), jnp.float32)
    grid = jnp.asarray(np.linspace(0, 1, 32), jnp.float32)[None, :, None]
    grid = jnp.broadcast_to(grid, (2, 32, 1))
    params = model.init(jax.random.key(0), x, grid)
    y = model.apply(params, x, grid)
    assert y.shape == (2, 32, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_s4_seq_model(rng):
    model = S4SeqModel(d_input=1, d_output=1, d_model=8, n_layers=1)
    x = jnp.asarray(rng.standard_normal((2, 6, 16, 1)), jnp.float32)
    grid = jnp.broadcast_to(
        jnp.linspace(0, 1, 16)[None, :, None], (2, 16, 1))
    params = model.init(jax.random.key(0), x, grid)
    y = model.apply(params, x, grid)
    assert y.shape == (2, 6, 16, 1)


def test_one_to_seq_and_chunked_predict(rng):
    model = OneToSeqModel(d_input=2, d_output=1, d_model=8, n_layers=1,
                          n_timesteps=3)
    x0 = jnp.asarray(rng.standard_normal((2, 16, 1)), jnp.float32)
    grid = jnp.broadcast_to(
        jnp.linspace(0, 1, 16)[None, :, None], (2, 16, 1))
    params = model.init(jax.random.key(0), x0, grid)
    y = model.apply(params, x0, grid)
    assert y.shape == (2, 3, 16, 1)

    def apply_fn(state, g, steps):
        out = model.apply(params, state, g)
        return out[:, :steps]

    long = predict_chunked(apply_fn, x0, grid, n_timesteps=7,
                           train_timesteps=3)
    assert long.shape[1] == 7


def test_linear_attention_shapes(rng):
    attn = LinearAttention(n_embd=16, n_head=4)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    params = attn.init(jax.random.key(0), x, y)
    out = attn.apply(params, x, y)
    assert out.shape == (2, 10, 16)


def test_moe_gpt_operator(rng):
    model = MoEGPTNO(trunk_size=3, branch_size=2, space_dim=2,
                     output_size=1, n_layers=2, n_hidden=16, n_head=2,
                     n_experts=2)
    g = jnp.asarray(rng.standard_normal((2, 20, 3)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((2, 15, 2)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((2, 20, 2)), jnp.float32)
    params = model.init(jax.random.key(0), g, u, pos)
    out = model.apply(params, g, u, pos)
    assert out.shape == (2, 20, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_moe_gpt_fourier_embedding(rng):
    from resolution_pde_tpu.models.mgpt import horizontal_fourier_embedding

    x = jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)
    out = horizontal_fourier_embedding(x, n=3)
    assert out.shape == (2, 5, 3 * (4 * 3 + 3))
