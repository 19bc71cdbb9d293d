"""Fused Pallas FeedForward vs the unfused dense reference path.

Runs in interpret mode on CPU with compute_dtype=float32, where the fused
op must match the plain jnp chain to roundoff — forward and the full VJP
(dx, dW_i, db_i, dLN). TPU bf16 behavior is covered by the benchmark and
the model-level integration test below.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resolution_pde_tpu.ops.pallas.fused_ff import fused_feedforward


def _ref_ff(x, kernels, biases, ln, approx_gelu):
    h = x
    for i, (k, b) in enumerate(zip(kernels, biases)):
        h = h @ k + b
        if i < len(kernels) - 1:
            h = jax.nn.gelu(h, approximate=approx_gelu)
    if ln is not None:
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        h = (h - mu) / jnp.sqrt(var + 1e-5) * ln[0] + ln[1]
    return h


def _make(n_layers, dim, factor, seed=0):
    rng = np.random.default_rng(seed)
    dims = [dim] + [dim * factor] * (n_layers - 1) + [dim]
    kernels = tuple(
        jnp.asarray(rng.standard_normal((dims[i], dims[i + 1])) * 0.1,
                    jnp.float32)
        for i in range(n_layers))
    biases = tuple(
        jnp.asarray(rng.standard_normal(dims[i + 1]) * 0.1, jnp.float32)
        for i in range(n_layers))
    return kernels, biases


@pytest.mark.parametrize("n_layers,has_ln,approx", [
    (3, True, True),
    (3, True, False),
    (2, False, True),
])
def test_fused_ff_forward_and_vjp(n_layers, has_ln, approx):
    dim, factor, rows = 16, 4, 192  # 192 % 64 == 0
    kernels, biases = _make(n_layers, dim, factor)
    ln = ((jnp.ones(dim) * 1.1).astype(jnp.float32),
          (jnp.ones(dim) * -0.2).astype(jnp.float32)) if has_ln else None
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, rows // 3, dim)), jnp.float32)

    def fused(x, kernels, biases, ln):
        return fused_feedforward(x, kernels, biases, ln,
                                 approx_gelu=approx,
                                 compute_dtype=jnp.float32,
                                 interpret=True)

    out = fused(x, kernels, biases, ln)
    ref = _ref_ff(x, kernels, biases, ln, approx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_fused(x, kernels, biases, ln):
        return jnp.sum(jnp.sin(fused(x, kernels, biases, ln)))

    def loss_ref(x, kernels, biases, ln):
        return jnp.sum(jnp.sin(_ref_ff(x, kernels, biases, ln, approx)))

    args = (x, kernels, biases, ln)
    diff_idx = (0, 1, 2, 3) if has_ln else (0, 1, 2)
    g_fused = jax.grad(loss_fused, argnums=diff_idx)(*args)
    g_ref = jax.grad(loss_ref, argnums=diff_idx)(*args)
    for gf, gr in zip(jax.tree_util.tree_leaves(g_fused),
                      jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=5e-5, atol=5e-5)


def test_fused_ff_pads_unaligned_rows():
    kernels, biases = _make(2, 8, 2)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((7, 11, 8)), jnp.float32)  # 77 rows
    out = fused_feedforward(x, kernels, biases, None, approx_gelu=True,
                            compute_dtype=jnp.float32, interpret=True)
    ref = _ref_ff(x, kernels, biases, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # grads flow through the padded path too
    g = jax.grad(lambda x: jnp.sum(fused_feedforward(
        x, kernels, biases, None, approx_gelu=True,
        compute_dtype=jnp.float32, interpret=True)))(x)
    gr = jax.grad(lambda x: jnp.sum(_ref_ff(x, kernels, biases, None,
                                            True)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr),
                               rtol=5e-5, atol=5e-5)


def test_ffno2d_fused_ff_matches_dense():
    """Model-level: same params, same forward & grads across ff_impl."""
    from resolution_pde_tpu.models import FFNO2D

    kw = dict(in_channels=1, out_channels=1, width=12, n_layers=2,
              n_modes=6, factor=2, ff_weight_norm=True, n_ff_layers=3,
              layer_norm=True, dropout=0.0)
    dense = FFNO2D(**kw)
    fused = FFNO2D(**kw, ff_impl="fused")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 16)), jnp.float32)

    pd = dense.init(jax.random.key(0), x)
    pf = fused.init(jax.random.key(0), x)
    # identical param trees (names AND values) across impls
    assert (jax.tree_util.tree_structure(pd)
            == jax.tree_util.tree_structure(pf))
    for a, b in zip(jax.tree_util.tree_leaves(pd),
                    jax.tree_util.tree_leaves(pf)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    od = dense.apply(pd, x)
    of = fused.apply(pd, x)
    np.testing.assert_allclose(np.asarray(of), np.asarray(od),
                               rtol=2e-5, atol=2e-5)

    gd = jax.grad(lambda p: jnp.sum(dense.apply(p, x) ** 2))(pd)
    gf = jax.grad(lambda p: jnp.sum(fused.apply(p, x) ** 2))(pd)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("has_ln", [True, False])
def test_fused_ff_save_acts_matches_recompute(has_ln):
    """save_acts=True (saved pre-activations, no backward recompute GEMMs)
    must produce the SAME forward and VJP as the default recompute backward
    — exactly, in f32, where the stored z carries no rounding."""
    n_layers, dim, factor, rows = 3, 16, 4, 192
    kernels, biases = _make(n_layers, dim, factor)
    ln = ((jnp.ones(dim) * 1.1).astype(jnp.float32),
          (jnp.ones(dim) * -0.2).astype(jnp.float32)) if has_ln else None
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((3, rows // 3, dim)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((3, rows // 3, dim)), jnp.float32)

    def run(save_acts):
        def loss(x, kernels, biases, ln, res):
            out = fused_feedforward(x, kernels, biases, ln, res,
                                    approx_gelu=True,
                                    compute_dtype=jnp.float32,
                                    interpret=True, save_acts=save_acts)
            return jnp.sum(jnp.sin(out)), out

        diff_idx = (0, 1, 2, 3, 4) if has_ln else (0, 1, 2, 4)
        (l, out), g = jax.value_and_grad(loss, argnums=diff_idx,
                                         has_aux=True)(
            x, kernels, biases, ln, res)
        return out, g

    out_r, g_r = run(False)
    out_s, g_s = run(True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_r))
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_ffno2d_fused_saved_matches_dense():
    """Model-level: ff_impl='fused_saved' matches 'dense' forward + grads
    (f32 interpret) and shares the identical param tree."""
    from resolution_pde_tpu.models import FFNO2D

    kw = dict(in_channels=1, out_channels=1, width=12, n_layers=2,
              n_modes=6, factor=2, n_ff_layers=2, layer_norm=True)
    dense = FFNO2D(**kw)
    saved = FFNO2D(**kw, ff_impl="fused_saved")
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 16)), jnp.float32)

    pd = dense.init(jax.random.key(0), x)
    ps = saved.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(pd)
            == jax.tree_util.tree_structure(ps))

    np.testing.assert_allclose(np.asarray(saved.apply(pd, x)),
                               np.asarray(dense.apply(pd, x)),
                               rtol=2e-5, atol=2e-5)
    gd = jax.grad(lambda p: jnp.sum(dense.apply(p, x) ** 2))(pd)
    gs = jax.grad(lambda p: jnp.sum(saved.apply(p, x) ** 2))(pd)
    for a, b in zip(jax.tree_util.tree_leaves(gd),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)
