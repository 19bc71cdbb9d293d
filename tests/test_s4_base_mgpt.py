"""Tests for the configurable S4 base/seq models, IO processors, and the
MoE-GPT operator."""

import numpy as np
import jax
import pytest
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


# ---------------------------------------------------------------------------
# seq-model family tail (s4seq_model.py:22,156,333,495) + recurrent stepping
# ---------------------------------------------------------------------------

def _seq_inputs(rng, b=2, t=10, s=6, v=1):
    x = jnp.asarray(rng.standard_normal((b, t, s, v)), jnp.float32)
    grid = jnp.asarray(
        np.broadcast_to(np.linspace(0, 1, s)[None, :, None], (b, s, 1)),
        jnp.float32)
    return x, grid


def test_s4baseseq_forward_shapes(rng):
    from resolution_pde_tpu.models.s4_base import S4BaseSeqModel

    x, grid = _seq_inputs(rng)
    m = S4BaseSeqModel(d_input=1, d_output=1, d_model=16, n_layers=2)
    p = m.init(jax.random.key(0), x, grid)
    y = m.apply(p, x, grid)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("mode,act", [("diag", None), ("dplr", None),
                                      ("diag", "gelu")])
def test_s4seq_conv_equals_recurrent_step(rng, mode, act):
    """Model-level: causal convolutional forward == lax.scan over the
    recurrent step built from the SAME params (the reference's
    setup_step/step contract, s4seq_model.py:58-113) — including with
    interlayer_act configured."""
    from resolution_pde_tpu.models.s4_base import (
        S4BaseSeqModel, s4seq_recurrent_fns)

    b, t, s, v, d = 2, 8, 4, 1, 12
    x, grid = _seq_inputs(rng, b, t, s, v)
    m = S4BaseSeqModel(d_input=v, d_output=1, d_model=d, n_layers=2,
                       mode=mode, interlayer_act=act)
    p = m.init(jax.random.key(0), x, grid)
    y_conv = np.asarray(m.apply(p, x, grid))  # (B, T, S, 1)

    init_state, step = s4seq_recurrent_fns(p, d, 2, mode, L_train=t,
                                           interlayer_act=act)
    # flatten space into batch exactly like the model does
    xt = np.moveaxis(np.asarray(x), 1, 2).reshape(b * s, t, v)
    gt = np.asarray(grid).reshape(b * s, 1)
    state = init_state(b * s)
    ys = []
    for k in range(t):
        y_k, state = step(state, jnp.asarray(xt[:, k]), jnp.asarray(gt))
        ys.append(np.asarray(y_k))
    y_rec = np.stack(ys, axis=1).reshape(b, s, t, 1)
    y_rec = np.moveaxis(y_rec, 1, 2)
    np.testing.assert_allclose(y_rec, y_conv, rtol=2e-3, atol=2e-4)


def test_s4dualseq_alternates_axes(rng):
    from resolution_pde_tpu.models.s4_base import S4DualSeqModel

    x, grid = _seq_inputs(rng, b=2, t=6, s=8)
    m = S4DualSeqModel(d_input=1, d_output=2, d_model=16, n_layers=2)
    p = m.init(jax.random.key(0), x, grid)
    y = m.apply(p, x, grid)
    assert y.shape == (2, 6, 8, 2)
    # causality of the time layers: changing a LATE timestep must not
    # change an early output
    x2 = x.at[:, -1].add(10.0)
    y2 = m.apply(p, x2, grid)
    np.testing.assert_allclose(np.asarray(y2[:, 0]), np.asarray(y[:, 0]),
                               rtol=1e-5, atol=1e-5)


def test_seqadd_and_chainmodel(rng):
    from resolution_pde_tpu.models.s4_base import (
        ChainModel, S4BaseSeqModel, SeqAdd)

    x, grid = _seq_inputs(rng, t=4)
    m1 = S4BaseSeqModel(d_input=1, d_output=1, d_model=8, n_layers=1)
    m2 = S4BaseSeqModel(d_input=1, d_output=1, d_model=8, n_layers=1)
    add = SeqAdd(model1=m1, model2=m2)
    p = add.init(jax.random.key(0), x, grid)
    y = add.apply(p, x, grid)
    assert y.shape == x.shape
    # sum semantics: equals applying each submodel with its own params
    y1 = m1.apply({"params": p["params"]["model1"]}, x, grid)
    y2 = m2.apply({"params": p["params"]["model2"]}, x, grid)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y1 + y2),
                               rtol=1e-5, atol=1e-6)

    chain = ChainModel(model=m1, chain_length=3)
    pc = chain.init(jax.random.key(1), x, grid)
    yc = chain.apply(pc, x, grid)
    assert yc.shape == x.shape  # one output per input timestep


def test_registry_resolves_seq_family():
    from resolution_pde_tpu.models import get_model

    for name in ("models.s4seq_model.S4BaseSeqModel",
                 "models.s4seq_model.S4DualSeqModel",
                 "models.s4seq_model.SeqAdd",
                 "models.s4seq_model.ChainModel"):
        get_model(name)


def test_gnot_point_cloud_end_to_end(tmp_path, rng):
    """Row-33 closure: the point-cloud (GNOT) path wired to a config and
    trained end-to-end — factory -> GNOTOperator -> Trainer, loss drops."""
    import h5py
    from resolution_pde_tpu.configs import (instantiate_dataset,
                                            instantiate_model, load_config)
    from resolution_pde_tpu.data.loader import Loader
    from resolution_pde_tpu.train import Trainer

    u = rng.standard_normal((6, 5, 8, 8)).astype(np.float32)
    # smooth fields so one step is learnable
    u = np.cumsum(np.cumsum(u, axis=2), axis=3) / 8.0
    with h5py.File(str(tmp_path / "ns_64_demo.h5"), "w") as f:
        f.create_dataset("u", data=u)

    cfg = load_config(model="mgpt", dataset="ns_gnot")
    out = instantiate_dataset(
        cfg.dataset.dataset_params,
        saved_folder=str(tmp_path))
    train, val, test = out[0], out[1], out[2]
    assert train.x.shape[-1] == 1 + 2  # features + 2D positions
    assert train.y.shape[-1] == 1

    model = instantiate_model(cfg.model, n_hidden=16, n_layers=1)
    trainer = Trainer(model, learning_rate=1e-3,
                      y_normalizer=out[5], use_normalizer=False)
    state = trainer.init(jnp.asarray(train.x[:2]))
    loader = Loader(train, 8, shuffle=True, seed=0)
    state, l0 = trainer.train_epoch(state, loader)
    for _ in range(4):
        state, l1 = trainer.train_epoch(state, loader)
    assert np.isfinite(l1) and l1 < l0


@pytest.mark.parametrize("mode", ["diag", "dplr"])
def test_s4dualseq_conv_equals_recurrent_step(rng, mode):
    """Dual space/time model: conv forward == stepping (the reference's
    S4DualSeqModel.step contract, s4seq_model.py:272-331)."""
    from resolution_pde_tpu.models.s4_base import (
        S4DualSeqModel, s4dualseq_recurrent_fns)

    b, t, s, v, d = 2, 6, 4, 1, 12
    x, grid = _seq_inputs(rng, b, t, s, v)
    m = S4DualSeqModel(d_input=v, d_output=1, d_model=d, n_layers=2,
                       layer_processors=("BatchTime", "BatchSpace"),
                       mode=mode)
    p = m.init(jax.random.key(0), x, grid)
    y_conv = np.asarray(m.apply(p, x, grid))

    init_state, step = s4dualseq_recurrent_fns(p, m, L_train=t)
    state = init_state(b * s)
    ys = []
    for k in range(t):
        y_k, state = step(state, x[:, k], grid)
        ys.append(np.asarray(y_k))
    y_rec = np.stack(ys, axis=1)
    np.testing.assert_allclose(y_rec, y_conv, rtol=2e-3, atol=2e-4)


def test_chain_predict_recurrent_rollout(rng):
    """ChainModel recurrent rollout (s4seq_model.py:514-546): finite
    multi-window output of the right shape, fed-back states."""
    from resolution_pde_tpu.models.s4_base import (
        ChainModel, S4BaseSeqModel, chain_predict)

    b, t, s, v, d = 2, 4, 4, 1, 8
    x, grid = _seq_inputs(rng, b, t, s, v)
    inner = S4BaseSeqModel(d_input=v, d_output=v, d_model=d, n_layers=1,
                           mode="diag")
    chain = ChainModel(model=inner, chain_length=2)
    p = chain.init(jax.random.key(0), x, grid)
    y = chain_predict(p, inner, x[:, 0], grid, n_timesteps=7,
                      train_timesteps=t, chain_length=2)
    assert y.shape == (b, 7, s, v)
    assert np.isfinite(np.asarray(y)).all()


def test_s4seq_kernel_args_conv_equals_recurrent_step(rng):
    """kernel_args (long-tail kernel options) thread through the seq model
    AND its recurrent builder: conv == scan-of-steps with
    disc='bilinear' + dt_fast set via kernel_args."""
    from resolution_pde_tpu.models.s4_base import (
        S4BaseSeqModel, s4seq_recurrent_fns)

    b, t, s, v, d = 2, 8, 4, 1, 12
    x, grid = _seq_inputs(rng, b, t, s, v)
    ka = dict(disc="bilinear", dt_fast=True, dt_transform="softplus")
    m = S4BaseSeqModel(d_input=v, d_output=1, d_model=d, n_layers=2,
                       mode="diag", kernel_args=ka)
    p = m.init(jax.random.key(0), x, grid)
    y_conv = np.asarray(m.apply(p, x, grid))

    init_state, step = s4seq_recurrent_fns(p, d, 2, "diag", L_train=t,
                                           kernel_args=ka)
    xt = np.moveaxis(np.asarray(x), 1, 2).reshape(b * s, t, v)
    gt = np.asarray(grid).reshape(b * s, 1)
    state = init_state(b * s)
    ys = []
    for k in range(t):
        y_k, state = step(state, jnp.asarray(xt[:, k]), jnp.asarray(gt))
        ys.append(np.asarray(y_k))
    y_rec = np.stack(ys, axis=1).reshape(b, s, t, 1)
    y_rec = np.moveaxis(y_rec, 1, 2)
    np.testing.assert_allclose(y_rec, y_conv, rtol=2e-3, atol=2e-4)
