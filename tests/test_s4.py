"""S4 family tests: S4D kernel parity vs the reference formulation,
convolution/recurrence equivalence, DPLR kernel properties, model shapes,
SSM optimizer grouping."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resolution_pde_tpu.models.s4 import (
    S4D,
    S4Block,
    S4DKernelLayer,
    DPLRKernelLayer,
    FFTConvLayer,
    S4Model,
    S4NDModel,
    s4d_recurrent_step_fn,
)
from resolution_pde_tpu.ops import ssm as ssm_ops
from resolution_pde_tpu.train import Trainer


def test_s4d_kernel_matches_torch_formulation(rng):
    """Kernel formula parity with models/s4d.py:53-69."""
    import torch

    H, N, L = 4, 8, 32
    log_dt = rng.standard_normal(H).astype(np.float32) * 0.5 - 5
    log_A_real = np.log(0.5 * np.ones((H, N // 2), dtype=np.float32))
    A_imag = (np.pi * np.broadcast_to(np.arange(N // 2), (H, N // 2))
              ).astype(np.float32).copy()
    C = rng.standard_normal((H, N // 2, 2)).astype(np.float32)

    # torch reference
    dt = torch.exp(torch.from_numpy(log_dt))
    Ct = torch.view_as_complex(torch.from_numpy(C))
    At = -torch.exp(torch.from_numpy(log_A_real)) + 1j * torch.from_numpy(A_imag)
    dtA = At * dt.unsqueeze(-1)
    K = dtA.unsqueeze(-1) * torch.arange(L)
    Ct2 = Ct * (torch.exp(dtA) - 1.0) / At
    expected = 2 * torch.einsum("hn, hnl -> hl", Ct2, torch.exp(K)).real

    A = -jnp.exp(jnp.asarray(log_A_real)) + 1j * jnp.asarray(A_imag)
    Cc = jax.lax.complex(jnp.asarray(C[..., 0]), jnp.asarray(C[..., 1]))
    got = ssm_ops.s4d_kernel_zoh(Cc, A, jnp.asarray(log_dt), L)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_s4d_conv_equals_recurrence(rng):
    """FFT-convolution output == recurrent stepping output."""
    H, L = 3, 16
    layer = S4DKernelLayer(d_model=H, d_state=8, channels=1)
    params = layer.init(jax.random.key(0), L)
    k = layer.apply(params, L)[0]  # (H, L)

    u = rng.standard_normal((2, H, L)).astype(np.float32)
    y_conv = np.asarray(ssm_ops.fft_causal_conv(jnp.asarray(u), k[None]))

    init_state, step = s4d_recurrent_step_fn(params["params"])
    state = init_state(2)
    ys = []
    for t in range(L):
        state, y = step(state, jnp.asarray(u[:, :, t]))
        ys.append(np.asarray(y))
    y_rec = np.stack(ys, axis=-1)
    np.testing.assert_allclose(y_rec, y_conv, rtol=1e-3, atol=1e-4)


def test_s4d_bilinear_conv_equals_recurrence(rng):
    """disc='bilinear' (models/s4.py:1153-1156): FFT-convolution output ==
    recurrent stepping with the bilinear discretization."""
    H, L = 3, 16
    layer = S4DKernelLayer(d_model=H, d_state=8, channels=1,
                           disc="bilinear")
    params = layer.init(jax.random.key(0), L)
    k = layer.apply(params, L)[0]  # (H, L)

    u = rng.standard_normal((2, H, L)).astype(np.float32)
    y_conv = np.asarray(ssm_ops.fft_causal_conv(jnp.asarray(u), k[None]))

    init_state, step = s4d_recurrent_step_fn(params["params"],
                                             disc="bilinear")
    state = init_state(2)
    ys = []
    for t in range(L):
        state, y = step(state, jnp.asarray(u[:, :, t]))
        ys.append(np.asarray(y))
    y_rec = np.stack(ys, axis=-1)
    np.testing.assert_allclose(y_rec, y_conv, rtol=1e-3, atol=1e-4)


def test_dplr_rank2_conv_equals_recurrence(rng):
    """rank=2 DPLR: the dense-solve discretization must agree with the
    rank-general Woodbury kernel (conv == recurrence)."""
    from resolution_pde_tpu.models.s4 import dplr_recurrent_step_fn

    H, L = 2, 12
    layer = DPLRKernelLayer(d_model=H, d_state=8, channels=1, rank=2)
    key = jax.random.key(3)
    params = layer.init(key, L)
    # perturb the zero-padded second rank row so it participates
    p = dict(params["params"])
    p["P_vec"] = p["P_vec"] + 0.2 * jax.random.normal(
        key, p["P_vec"].shape)
    params = {"params": p}
    k = layer.apply(params, L)[0]  # (H, L)

    u = rng.standard_normal((2, H, L)).astype(np.float32)
    y_conv = np.asarray(ssm_ops.fft_causal_conv(jnp.asarray(u), k[None]))

    init_state, step = dplr_recurrent_step_fn(params["params"], L)
    state = init_state(2)
    ys = []
    for t in range(L):
        state, y = step(state, jnp.asarray(u[:, :, t]))
        ys.append(np.asarray(y))
    y_rec = np.stack(ys, axis=-1)
    np.testing.assert_allclose(y_rec, y_conv, rtol=1e-3, atol=1e-4)


def test_dplr_kernel_finite_and_decaying():
    """HiPPO-initialized DPLR kernel is finite and (roughly) decaying."""
    layer = DPLRKernelLayer(d_model=4, d_state=16, channels=1)
    params = layer.init(jax.random.key(0), 64)
    k = np.asarray(layer.apply(params, 64))
    assert k.shape == (1, 4, 64)
    assert np.isfinite(k).all()
    # stable SSM: late-kernel mass much smaller than early mass
    early = np.abs(k[..., :8]).mean()
    late = np.abs(k[..., -8:]).mean()
    assert late < early


def test_dplr_kernel_matches_explicit_materialization(rng):
    """dplr_kernel (Cauchy/Woodbury at roots of unity) must equal the
    explicitly discretized kernel K[l] = C_tilde^* Abar^l Bbar ... computed
    from the same parameters via dense linear algebra."""
    N, L = 8, 24
    Lam, P, B, _ = ssm_ops.make_dplr_hippo(N)
    Lam = jnp.asarray(Lam, jnp.complex64)
    P_ = jnp.asarray(P, jnp.complex64)
    B_ = jnp.asarray(B, jnp.complex64)
    C_t = jnp.asarray(rng.standard_normal(N) + 1j * rng.standard_normal(N),
                      jnp.complex64)
    log_dt = jnp.asarray(np.log(0.01), jnp.float32)

    k_fast = ssm_ops.dplr_kernel(Lam, P_, B_, C_t, log_dt, L)

    # dense reference: bilinear discretization of A = diag(Lam) - P P^*
    step = float(jnp.exp(log_dt))
    A = np.diag(np.asarray(Lam)) - np.outer(np.asarray(P_),
                                            np.conj(np.asarray(P_)))
    I = np.eye(N)
    A0 = (2.0 / step) * I + A
    A1 = np.linalg.inv((2.0 / step) * I - A)
    Ab = A1 @ A0
    Bb = 2.0 * (A1 @ np.asarray(B_))
    # kernel generating function uses C_tilde directly:
    # K[l] = C_tilde^* Abar^l Bbar  with the (I - Abar^L) fold absorbed
    Ct = np.conj(np.asarray(C_t)) @ np.linalg.inv(
        I - np.linalg.matrix_power(Ab, L))
    k_dense = np.array(
        [np.real(Ct @ np.linalg.matrix_power(Ab, l) @ Bb) for l in range(L)])
    np.testing.assert_allclose(np.asarray(k_fast), k_dense, rtol=1e-3,
                               atol=1e-4)


def test_fftconv_bidirectional_shapes(rng):
    layer = FFTConvLayer(d_model=8, d_state=8, mode="diag",
                         bidirectional=True)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)), jnp.float32)
    params = layer.init(jax.random.key(0), x)
    y = layer.apply(params, x)
    assert y.shape == (2, 32, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_s4model_shapes_and_training(rng):
    model = S4Model(d_input=3, d_output=1, d_model=16, n_layers=2,
                    dropout=0.0, mode="diag")
    x = rng.standard_normal((4, 3, 32)).astype(np.float32)
    y = rng.standard_normal((4, 1, 32)).astype(np.float32)
    trainer = Trainer(model, learning_rate=1e-3, ssm_lr=1e-3)
    state = trainer.init(x[:2])
    state, loss = trainer.train_epoch(state, [(x, y)])
    assert np.isfinite(loss)


def test_s4model_dplr_forward(rng):
    model = S4Model(d_input=1, d_output=1, d_model=8, n_layers=1,
                    dropout=0.0, mode="dplr")
    x = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x, deterministic=True)
    assert y.shape == (2, 1, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_s4nd_model_2d(rng):
    model = S4NDModel(d_input=1, d_output=1, d_model=8, n_layers=1,
                      dropout=0.0, bidirectional=True)
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 16)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y = model.apply(params, x, deterministic=True)
    assert y.shape == (2, 1, 16, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_ssm_param_group_no_weight_decay(rng):
    """SSM params (log_dt etc.) must not be weight-decayed and must use the
    capped LR: with zero gradients, non-SSM params shrink (decay), SSM
    params stay exactly."""
    model = S4Model(d_input=1, d_output=1, d_model=8, n_layers=1,
                    dropout=0.0, mode="diag")
    x = jnp.asarray(rng.standard_normal((2, 1, 16)), jnp.float32)
    trainer = Trainer(model, learning_rate=1e-2, weight_decay=0.1,
                      ssm_lr=1e-3)
    state = trainer.init(x)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    updates, _ = trainer.optimizer.update(zero_grads, state.opt_state,
                                          state.params)

    flat_updates = jax.tree_util.tree_flatten_with_path(updates)[0]
    flat_params = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    checked_decay = False
    for path, upd in flat_updates:
        keys = [getattr(p, "key", "") for p in path]
        is_ssm = any(k in ("log_dt", "log_A_real", "A_imag") for k in keys)
        if is_ssm:
            assert float(jnp.abs(upd).max()) == 0.0, keys
        elif float(jnp.abs(flat_params[path]).max()) > 0:
            # nonzero decayed params get a nonzero update from decay alone
            assert float(jnp.abs(upd).max()) > 0.0, keys
            checked_decay = True
    assert checked_decay


def test_dplr_conv_equals_recurrence(rng):
    """S4 DPLR: the recurrent discretization (ops.discretize_dplr) must
    reproduce the convolution kernel exactly: K[l] = Re(C^* Abar^l Bbar)
    with C recovered from the trained C_tilde (models/s4.py:1190-1218)."""
    N, L = 8, 20
    Lam, P, B, _ = ssm_ops.make_dplr_hippo(N)
    Lam = jnp.asarray(Lam, jnp.complex64)
    P_ = jnp.asarray(P, jnp.complex64)
    B_ = jnp.asarray(B, jnp.complex64)
    C_t = jnp.asarray(rng.standard_normal(N) + 1j * rng.standard_normal(N),
                      jnp.complex64)
    log_dt = jnp.asarray(np.log(0.02), jnp.float32)

    k = np.asarray(ssm_ops.dplr_kernel(Lam, P_, B_, C_t, log_dt, L))
    Ab, Bb, C = ssm_ops.discretize_dplr(Lam, P_, B_, C_t, log_dt, L)

    # recurrence on a unit impulse reproduces the kernel
    x = jnp.zeros((N,), jnp.complex64)
    ks = []
    for l in range(L):
        u = 1.0 if l == 0 else 0.0
        x = Ab @ x + Bb * u
        ks.append(float(jnp.real(jnp.conj(C) @ x)))
    np.testing.assert_allclose(np.asarray(ks), k, rtol=1e-3, atol=1e-4)


def test_s4d_kernel_pallas_impl_matches(rng):
    layer_j = S4DKernelLayer(d_model=4, d_state=8, channels=2)
    layer_p = S4DKernelLayer(d_model=4, d_state=8, channels=2,
                             kernel_impl="pallas")
    params = layer_j.init(jax.random.key(0), 32)
    kj = np.asarray(layer_j.apply(params, 32))
    kp = np.asarray(layer_p.apply(params, 32))
    np.testing.assert_allclose(kp, kj, rtol=1e-4, atol=1e-5)


def test_s4block_gate_and_bottleneck(rng):
    """GSS-style gate/bottleneck options (models/s4.py:1838-1999): shapes,
    finiteness, and that the DEFAULT options keep the original param tree
    (backward compat for checkpoints)."""
    from resolution_pde_tpu.models.s4 import S4Block

    x = jnp.asarray(rng.standard_normal((2, 16, 8)), jnp.float32)

    default = S4Block(8, d_state=8, mode="diag")
    pd = default.init(jax.random.key(0), x)
    assert set(pd["params"]) == {"FFTConvLayer_0", "Dense_0"}
    assert default.apply(pd, x).shape == (2, 16, 8)

    gss = S4Block(8, d_state=8, mode="diag", gate=2, gate_act="gelu",
                  bottleneck=2, mult_act="gelu", final_act="gelu")
    pg = gss.init(jax.random.key(1), x)
    names = set(pg["params"])
    assert {"input_gate", "input_linear", "FFTConvLayer_0"} <= names
    y = gss.apply(pg, x)
    assert y.shape == (2, 16, 8)
    assert np.isfinite(np.asarray(y)).all()

    nolinear = S4Block(8, d_state=8, mode="diag", final_act=None)
    pn = nolinear.init(jax.random.key(2), x)
    assert nolinear.apply(pn, x).shape == (2, 16, 8)


@pytest.mark.parametrize("measure,rank",
                         [("legs", 1), ("legt", 2), ("fourier", 1)])
def test_nplr_init_unitary_equivalence(measure, rank):
    """nplr_init returns (Lambda, P, B) with diag(Lambda) - sum_r P_r P_r^*
    unitarily equivalent to the dense HiPPO transition matrix
    (models/s4.py:384-455 nplr, full-spectrum variant): the eigenvalue
    sets must coincide."""
    n = 16
    lam, p, b = ssm_ops.nplr_init(measure, n, rank, b_clip=None)
    a_dense, _ = ssm_ops.hippo_transition(measure, n)
    m = np.diag(lam) - np.einsum("rm,rn->mn", p, np.conj(p))

    def spectrum(x):
        e = np.linalg.eigvals(x)
        return np.sort_complex(np.round(e, 6))

    np.testing.assert_allclose(spectrum(m), spectrum(a_dense.astype(complex)),
                               rtol=1e-4, atol=1e-4)
    assert b.shape == (n,) and p.shape == (rank, n)


@pytest.mark.parametrize("measure", ["legs", "legt", "fourier"])
def test_nplr_init_conj_pair_layout(measure):
    """The native init must store the spectrum in [half, conj(half)] order
    so index j and j + n/2 are a conjugate PAIR — dt_tie=False broadcasts
    one dt per pair via concatenate([dt, dt]) (models/s4.py dt handling),
    which would otherwise give the two halves of a conjugate pair
    different timesteps and silently break the kernel's conjugate
    symmetry (the asymmetric part is discarded by real())."""
    n = 16
    rank = 2 if measure == "legt" else 1
    lam, p, b = ssm_ops.nplr_init(measure, n, rank, b_clip=None)
    half = n // 2
    np.testing.assert_allclose(lam[half:], np.conj(lam[:half]),
                               rtol=1e-12, atol=1e-12)
    # B and P pair exactly on nonzero modes (zero modes — fourier's
    # degenerate pair at 0 — keep eigh's orthonormal basis)
    nz = np.abs(lam.imag[:half]) > 1e-12
    np.testing.assert_allclose(b[half:][nz], np.conj(b[:half][nz]),
                               rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(p[:, half:][:, nz],
                               np.conj(p[:, :half][:, nz]),
                               rtol=1e-8, atol=1e-8)
    if measure == "legs":
        lam0, p0, b0, _ = ssm_ops.make_dplr_hippo(n)
        np.testing.assert_allclose(lam0[half:], np.conj(lam0[:half]),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(p0[half:], np.conj(p0[:half]),
                                   rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(b0[half:], np.conj(b0[:half]),
                                   rtol=1e-8, atol=1e-8)


def test_nplr_init_legs_matches_historical():
    """nplr_init('legs') agrees with make_dplr_hippo (the historical init
    every shipped config uses) up to the reference's B.imag clip."""
    n = 16
    lam0, p0, b0, _ = ssm_ops.make_dplr_hippo(n)
    lam1, p1, b1 = ssm_ops.nplr_init("legs", n, 1)
    np.testing.assert_allclose(lam1, lam0, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(p1[0], p0, rtol=1e-10, atol=1e-10)
    b0_clip = b0.real + 1j * np.clip(b0.imag, -2.0, 2.0)
    np.testing.assert_allclose(b1, b0_clip, rtol=1e-10, atol=1e-10)


def test_dplr_real_transform_invariance():
    """real_transform changes the storage, not the resolved operator: two
    DPLR layers initialized from the same rng under 'exp' and 'softplus'
    transforms resolve to the same Lambda and hence the same kernel
    (models/s4.py:994, 1088-1093 semantics)."""
    L = 16
    k = {}
    for rt in ("exp", "softplus"):
        layer = DPLRKernelLayer(d_model=4, d_state=8, real_transform=rt)
        params = jax.jit(layer.init, static_argnums=1)(jax.random.key(3), L)
        k[rt] = np.asarray(
            jax.jit(lambda p, m=layer: m.apply(p, L))(params))
    np.testing.assert_allclose(k["softplus"], k["exp"], rtol=1e-4, atol=1e-5)


def test_diag_kernel_options_finite_and_reachable():
    """The long-tail options compose through FFTConvLayer/S4Block via
    kernel_args and produce finite outputs (smoke over the option
    cross-product the goldens don't cover pairwise)."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 12, 8)).astype(np.float32))
    blk = S4Block(8, d_state=8, mode="diag",
                  kernel_args=dict(dt_tie=False, dt_transform="softplus",
                                   bandlimit=0.2))
    p = blk.init(jax.random.key(0), x)
    assert np.isfinite(np.asarray(blk.apply(p, x))).all()

    blk2 = S4Block(8, d_state=8, mode="dplr",
                   kernel_args=dict(measure="fout", dt_fast=True))
    p2 = blk2.init(jax.random.key(1), x)
    assert np.isfinite(np.asarray(blk2.apply(p2, x))).all()

    conv = FFTConvLayer(8, d_state=8, mode="diag",
                        kernel_args=dict(is_real=True))
    p3 = conv.init(jax.random.key(2), x)
    assert np.isfinite(np.asarray(conv.apply(p3, x))).all()


def test_combination_inits_block_structure():
    """'diag' (inv+lin) and 'hippo' (legs+fourier) combination inits assign
    contiguous copy blocks per sub-init, like the reference combination()
    (models/s4.py:612-630)."""
    L = 12
    layer = S4DKernelLayer(d_model=4, d_state=8, n_ssm=2, measure="diag")
    p = jax.jit(layer.init, static_argnums=1)(jax.random.key(0), L)
    ai = np.asarray(p["params"]["A_imag"])  # (2, 4)
    _, imag_inv, _ = ssm_ops.diag_ssm_init("inv", 4)
    _, imag_lin, _ = ssm_ops.diag_ssm_init("lin", 4)
    np.testing.assert_allclose(ai[0], imag_inv, rtol=1e-5)
    np.testing.assert_allclose(ai[1], imag_lin, rtol=1e-5)

    dp = DPLRKernelLayer(d_model=4, d_state=8, n_ssm=2, measure="hippo")
    pd = jax.jit(dp.init, static_argnums=1)(jax.random.key(0), L)
    li = np.asarray(pd["params"]["Lambda_im"])  # (2, 8)
    lam_legs, _, _, _ = ssm_ops.make_dplr_hippo(8)
    lam_four, _, _ = ssm_ops.nplr_init("fourier", 8)
    np.testing.assert_allclose(li[0], lam_legs.imag.astype(np.float32),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(li[1], lam_four.imag.astype(np.float32),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Recurrent step mode across the kernel option surface (round-3 closure of
# the PARITY #19 tail: step fns resolve dt/transforms exactly like conv)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("opts", [
    dict(dt_tie=False),
    dict(dt_transform="softplus"),
    dict(dt_fast=True),
    dict(is_real=True),
    dict(imag_transform="exp"),
    dict(real_transform="softplus"),
    dict(disc="bilinear", dt_transform="sigmoid", dt_fast=True),
    dict(n_ssm=2, dt_tie=False),
    dict(bandlimit=0.05),
], ids=lambda o: "-".join(f"{k}={v}" for k, v in o.items()))
def test_s4d_option_surface_conv_equals_recurrence(rng, opts):
    """Every dt/transform/is_real option: FFT-convolution output ==
    recurrent stepping built with the matching step options."""
    H, L = 4, 16
    layer = S4DKernelLayer(d_model=H, d_state=8, channels=1, **opts)
    params = layer.init(jax.random.key(1), L)
    k = layer.apply(params, L)[0]  # (H, L)

    u = rng.standard_normal((2, H, L)).astype(np.float32)
    y_conv = np.asarray(ssm_ops.fft_causal_conv(jnp.asarray(u), k[None]))

    step_kw = {k_: opts[k_] for k_ in
               ("dt_transform", "dt_fast", "real_transform",
                "imag_transform", "is_real", "bandlimit") if k_ in opts}
    init_state, step = s4d_recurrent_step_fn(
        params["params"], disc=opts.get("disc", "zoh"), **step_kw)
    state = init_state(2)
    ys = []
    for t in range(L):
        state, y = step(state, jnp.asarray(u[:, :, t]))
        ys.append(np.asarray(y))
    y_rec = np.stack(ys, axis=-1)
    np.testing.assert_allclose(y_rec, y_conv, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("opts", [
    dict(dt_tie=False),
    dict(dt_transform="softplus", dt_fast=True),
    dict(real_transform="softplus"),
    dict(bandlimit=0.05),
], ids=lambda o: "-".join(f"{k}={v}" for k, v in o.items()))
def test_dplr_option_surface_conv_equals_recurrence(rng, opts):
    """DPLR dt/transform options: the per-state-dt dense-solve
    discretization must agree with the generating-function kernel."""
    from resolution_pde_tpu.models.s4 import dplr_recurrent_step_fn

    H, L = 2, 12
    layer = DPLRKernelLayer(d_model=H, d_state=8, channels=1, **opts)
    params = layer.init(jax.random.key(2), L)
    k = layer.apply(params, L)[0]  # (H, L)

    u = rng.standard_normal((2, H, L)).astype(np.float32)
    y_conv = np.asarray(ssm_ops.fft_causal_conv(jnp.asarray(u), k[None]))

    step_kw = {k_: opts[k_] for k_ in
               ("dt_transform", "dt_fast", "real_transform", "bandlimit")
               if k_ in opts}
    init_state, step = dplr_recurrent_step_fn(params["params"], L, **step_kw)
    state = init_state(2)
    ys = []
    for t in range(L):
        state, y = step(state, jnp.asarray(u[:, :, t]))
        ys.append(np.asarray(y))
    y_rec = np.stack(ys, axis=-1)
    np.testing.assert_allclose(y_rec, y_conv, rtol=1e-3, atol=1e-4)


def test_s4nd_layer_ndim_generality(rng):
    """S4NDLayer infers the spatial rank (the reference's arbitrary-`dim`
    S4ND, models/s4nd.py:1815-1918): a 3D linear layer's joint
    outer-product FFT conv must equal three sequential per-axis causal
    linear convolutions built from the SAME materialized kernels
    (separability), and 1D/3D inputs must run through one module."""
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models.s4 import S4DKernelLayer, S4NDLayer

    c, d_state = 3, 8
    shapes = (4, 5, 6)  # non-equal axes pin the axis ordering
    x = rng.standard_normal((2,) + shapes + (c,)).astype(np.float32)
    layer = S4NDLayer(d_model=c, d_state=d_state, mode="diag", linear=True)
    p = layer.init(jax.random.key(3), jnp.asarray(x))["params"]
    got = np.asarray(layer.apply({"params": p}, jnp.asarray(x)))
    assert got.shape == x.shape and np.isfinite(got).all()

    # materialize each axis kernel and convolve sequentially in numpy
    kern = S4DKernelLayer(c, d_state, channels=1)
    ks = [np.asarray(kern.apply({"params": p[f"kernel_ax{i}"]},
                                shapes[i])[0])  # (C, L_i)
          for i in range(3)]
    want = np.moveaxis(x, -1, 1).astype(np.float64)  # (B, C, *spatial)
    for ax, k in enumerate(ks):
        out = np.empty_like(want)
        for ch in range(c):
            # want[:, ch] axes are (B, s0, s1, s2): spatial ax sits at 1+ax
            sl = np.moveaxis(want[:, ch], 1 + ax, -1)
            conv = np.apply_along_axis(
                lambda v, kk=k[ch]: np.convolve(v, kk)[: v.shape[-1]],
                -1, sl)
            out[:, ch] = np.moveaxis(conv, -1, 1 + ax)
        want = out
    want += np.moveaxis(x, -1, 1) * np.asarray(p["D"])[None, :, None, None,
                                                       None]
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), rtol=2e-4,
                               atol=2e-5)

    # 1D instantiation through the same module
    x1 = rng.standard_normal((2, 16, c)).astype(np.float32)
    p1 = layer.init(jax.random.key(0), jnp.asarray(x1))["params"]
    assert "kernel_ax0" in p1 and "kernel_ax1" not in p1
    y1 = np.asarray(layer.apply({"params": p1}, jnp.asarray(x1)))
    assert y1.shape == x1.shape and np.isfinite(y1).all()
