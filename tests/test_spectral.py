"""Spectral conv parity tests against an independent torch formulation of the
reference semantics (models/spectral_convolution.py)."""

import numpy as np
import torch
import jax.numpy as jnp

from resolution_pde_tpu.ops import (
    spectral_conv_1d,
    spectral_conv_2d,
    factorized_spectral_conv_1d,
    factorized_spectral_conv_2d,
)


def _torch_spectral_conv_1d(x, w, modes):
    """Reference semantics: rfft -> truncated complex einsum -> irfft."""
    xt = torch.from_numpy(x)
    wt = torch.view_as_complex(torch.from_numpy(w))
    x_ft = torch.fft.rfft(xt)
    out_ft = torch.zeros(
        x.shape[0], w.shape[1], x.shape[-1] // 2 + 1, dtype=torch.cfloat
    )
    out_ft[:, :, :modes] = torch.einsum("bix,iox->box", x_ft[:, :, :modes], wt)
    return torch.fft.irfft(out_ft, n=x.shape[-1]).numpy()


def test_spectral_conv_1d_parity(rng):
    b, ci, co, n, modes = 3, 4, 5, 64, 12
    x = rng.standard_normal((b, ci, n)).astype(np.float32)
    w = rng.standard_normal((ci, co, modes, 2)).astype(np.float32) * 0.1
    expected = _torch_spectral_conv_1d(x, w, modes)
    got = np.asarray(spectral_conv_1d(jnp.asarray(x), jnp.asarray(w), modes))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def _torch_spectral_conv_2d(x, w1, w2, m1, m2):
    xt = torch.from_numpy(x)
    wt1 = torch.view_as_complex(torch.from_numpy(w1))
    wt2 = torch.view_as_complex(torch.from_numpy(w2))
    x_ft = torch.fft.rfft2(xt)
    out_ft = torch.zeros(
        x.shape[0], w1.shape[1], x.shape[-2], x.shape[-1] // 2 + 1,
        dtype=torch.cfloat,
    )
    out_ft[:, :, :m1, :m2] = torch.einsum(
        "bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], wt1)
    out_ft[:, :, -m1:, :m2] = torch.einsum(
        "bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], wt2)
    return torch.fft.irfft2(out_ft, s=x.shape[-2:]).numpy()


def test_spectral_conv_2d_parity(rng):
    b, ci, co, n, m = 2, 3, 4, 32, 8
    x = rng.standard_normal((b, ci, n, n)).astype(np.float32)
    w1 = rng.standard_normal((ci, co, m, m, 2)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((ci, co, m, m, 2)).astype(np.float32) * 0.1
    expected = _torch_spectral_conv_2d(x, w1, w2, m, m)
    got = np.asarray(
        spectral_conv_2d(jnp.asarray(x), jnp.asarray(w1), jnp.asarray(w2), m, m)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def _torch_ffno_1d(x_cl, w, n_modes):
    """x_cl: (B, X, C) channels-last; ortho-norm per-axis pass with
    effective-mode slicing (spectral_convolution.py:158-204)."""
    xt = torch.from_numpy(x_cl).permute(0, 2, 1)  # (B, C, X)
    n = xt.shape[-1]
    m = min(n_modes, n // 2 + 1)
    wt = torch.view_as_complex(torch.from_numpy(w[:, :, :m].copy()))
    x_ft = torch.fft.rfft(xt, dim=-1, norm="ortho")
    out_ft = torch.zeros_like(x_ft)
    out_ft[:, :, :m] = torch.einsum("bix,iox->box", x_ft[:, :, :m], wt)
    out = torch.fft.irfft(out_ft, n=n, dim=-1, norm="ortho")
    return out.permute(0, 2, 1).numpy()


def test_factorized_1d_parity(rng):
    b, c, n, n_modes = 2, 6, 48, 16
    x = rng.standard_normal((b, n, c)).astype(np.float32)
    w = rng.standard_normal((c, c, n_modes, 2)).astype(np.float32) * 0.1
    expected = _torch_ffno_1d(x, w, n_modes)
    got = np.asarray(
        factorized_spectral_conv_1d(jnp.asarray(x), jnp.asarray(w), n_modes)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_factorized_1d_effective_modes_slicing(rng):
    """When the resolution drops below 2*n_modes, only the available modes
    are used — the resolution-generalization trick."""
    b, c, n_modes = 2, 4, 16
    w = rng.standard_normal((c, c, n_modes, 2)).astype(np.float32) * 0.1
    for n in (16, 24, 64):  # 16//2+1=9 < 16 exercises the slice
        x = rng.standard_normal((b, n, c)).astype(np.float32)
        expected = _torch_ffno_1d(x, w, n_modes)
        got = np.asarray(
            factorized_spectral_conv_1d(jnp.asarray(x), jnp.asarray(w), n_modes)
        )
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def _torch_ffno_2d(x_cl, wy, wx, n_modes):
    xt = torch.from_numpy(x_cl).permute(0, 3, 1, 2)  # (B, C, H, W)
    B, I, M, N = xt.shape

    my = min(n_modes, N // 2 + 1)
    wty = torch.view_as_complex(torch.from_numpy(wy[:, :, :my].copy()))
    x_fty = torch.fft.rfft(xt, dim=-1, norm="ortho")
    out_ft = torch.zeros_like(x_fty)
    out_ft[:, :, :, :my] = torch.einsum(
        "bixy,ioy->boxy", x_fty[:, :, :, :my], wty)
    yy = torch.fft.irfft(out_ft, n=N, dim=-1, norm="ortho")

    mx = min(n_modes, M // 2 + 1)
    wtx = torch.view_as_complex(torch.from_numpy(wx[:, :, :mx].copy()))
    x_ftx = torch.fft.rfft(xt, dim=-2, norm="ortho")
    out_ft = torch.zeros_like(x_ftx)
    out_ft[:, :, :mx, :] = torch.einsum(
        "bixy,iox->boxy", x_ftx[:, :, :mx, :], wtx)
    xx = torch.fft.irfft(out_ft, n=M, dim=-2, norm="ortho")

    return (xx + yy).permute(0, 2, 3, 1).numpy()


def test_factorized_2d_parity(rng):
    b, c, h, w_sz, n_modes = 2, 4, 24, 32, 10
    x = rng.standard_normal((b, h, w_sz, c)).astype(np.float32)
    wy = rng.standard_normal((c, c, n_modes, 2)).astype(np.float32) * 0.1
    wx = rng.standard_normal((c, c, n_modes, 2)).astype(np.float32) * 0.1
    expected = _torch_ffno_2d(x, wy, wx, n_modes)
    got = np.asarray(
        factorized_spectral_conv_2d(
            jnp.asarray(x), jnp.asarray(wy), jnp.asarray(wx), n_modes
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_factorized_2d_small_resolution(rng):
    """Effective-mode slicing at a resolution below 2*n_modes in 2D."""
    b, c, n_modes = 1, 3, 16
    x = (np.random.default_rng(1).standard_normal((b, 16, 16, c))
         .astype(np.float32))
    wy = (np.random.default_rng(2).standard_normal((c, c, n_modes, 2))
          .astype(np.float32) * 0.1)
    wx = (np.random.default_rng(3).standard_normal((c, c, n_modes, 2))
          .astype(np.float32) * 0.1)
    expected = _torch_ffno_2d(x, wy, wx, n_modes)
    got = np.asarray(
        factorized_spectral_conv_2d(
            jnp.asarray(x), jnp.asarray(wy), jnp.asarray(wx), n_modes
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dft_path_matches_fft_path(rng):
    """The truncated-DFT MXU fast path must match the FFT path to roundoff
    (f32 GEMMs), incl. the Nyquist-weight case m == n//2+1."""
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d_dft)

    wy = jnp.asarray(0.1 * rng.standard_normal((6, 6, 10, 2)), jnp.float32)
    wx = jnp.asarray(0.1 * rng.standard_normal((6, 6, 10, 2)), jnp.float32)
    for shape in ((2, 24, 32, 6), (2, 16, 16, 6)):  # 16//2+1=9 Nyquist case
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        a = factorized_spectral_conv_2d(x, wy, wx, 10)
        b = factorized_spectral_conv_2d_dft(x, wy, wx, 10)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_dft_path_bf16_gemms_close(rng):
    import pytest
    import jax

    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d_dft)

    if jax.default_backend() == "cpu":
        pytest.skip("bf16 x bf16 -> f32 dot is a TPU path; "
                    "unsupported by the CPU DotThunk")
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 8)), jnp.float32)
    wy = jnp.asarray(0.1 * rng.standard_normal((8, 8, 8, 2)), jnp.float32)
    wx = jnp.asarray(0.1 * rng.standard_normal((8, 8, 8, 2)), jnp.float32)
    a = factorized_spectral_conv_2d_dft(x, wy, wx, 8)
    b = factorized_spectral_conv_2d_dft(x, wy, wx, 8,
                                        gemm_dtype=jnp.bfloat16)
    rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
    assert rel < 0.05  # bf16 noise, f32 accumulation


def test_dft_v3_matches_fft_path():
    import numpy as np
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d, factorized_spectral_conv_2d_dft_v3)

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 6)), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((6, 6, 5, 2)) * 0.3, jnp.float32)
    wx = jnp.asarray(rng.standard_normal((6, 6, 5, 2)) * 0.3, jnp.float32)
    ref = factorized_spectral_conv_2d(x, wy, wx, 5)
    out = factorized_spectral_conv_2d_dft_v3(x, wy, wx, 5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_dft_v3_store_dtype_close():
    """dft_v3 with producer-side bf16 stores (spectral_impl='dft_v3s') must
    stay within bf16 rounding of the exact path — the cast only changes
    WHERE the intermediate spectrum buffers round, not the GEMM operands
    (on the bf16 TPU path the consumer cast already rounded them; here we
    drive store_dtype with f32 GEMMs so the check runs on CPU)."""
    import numpy as np
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d, factorized_spectral_conv_2d_dft_v3)

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 12, 16, 6)), jnp.float32)
    wy = jnp.asarray(rng.standard_normal((6, 6, 5, 2)) * 0.3, jnp.float32)
    wx = jnp.asarray(rng.standard_normal((6, 6, 5, 2)) * 0.3, jnp.float32)
    ref = factorized_spectral_conv_2d(x, wy, wx, 5)
    out = factorized_spectral_conv_2d_dft_v3(
        x, wy, wx, 5, gemm_dtype=jnp.float32, store_dtype=jnp.bfloat16)
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert rel < 0.05  # bf16 rounding of the stored spectrum
    # and it must be differentiable (the bench trains through it)
    import jax

    g = jax.grad(lambda w: jnp.sum(factorized_spectral_conv_2d_dft_v3(
        x, w, wx, 5, gemm_dtype=jnp.float32,
        store_dtype=jnp.bfloat16) ** 2))(wy)
    assert np.isfinite(np.asarray(g)).all()


def test_dft_v4_matches_fft_path():
    """Folded-symmetry DFT (half-MAC transforms) must match the FFT path,
    including the full-spectrum case m == n//2+1 (Nyquist weights) and
    non-square grids."""
    import numpy as np
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d, factorized_spectral_conv_2d_dft_v4)

    rng = np.random.default_rng(7)
    for shape, modes in (((2, 12, 16, 6), 5), ((2, 8, 8, 6), 5),
                         ((1, 16, 10, 6), 9)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        wy = jnp.asarray(rng.standard_normal((6, 6, modes, 2)) * 0.3,
                         jnp.float32)
        wx = jnp.asarray(rng.standard_normal((6, 6, modes, 2)) * 0.3,
                         jnp.float32)
        ref = factorized_spectral_conv_2d(x, wy, wx, modes)
        out = factorized_spectral_conv_2d_dft_v4(x, wy, wx, modes)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)


def test_dft_v5_matches_fft_path():
    """Transpose-free channels-last DFT (natural-dot-order einsums,
    probe14's relayout-copy fix) must match the FFT path — values AND
    weight gradients — including the full-spectrum case m == n//2+1 and
    non-square grids; the bf16 store path must run."""
    import jax
    import numpy as np
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d, factorized_spectral_conv_2d_dft_v5)

    rng = np.random.default_rng(7)
    for shape, modes in (((2, 12, 16, 6), 5), ((2, 8, 8, 6), 5),
                         ((1, 16, 10, 6), 9)):
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        wy = jnp.asarray(rng.standard_normal((6, 6, modes, 2)) * 0.3,
                         jnp.float32)
        wx = jnp.asarray(rng.standard_normal((6, 6, modes, 2)) * 0.3,
                         jnp.float32)
        ref = factorized_spectral_conv_2d(x, wy, wx, modes)
        out = factorized_spectral_conv_2d_dft_v5(x, wy, wx, modes)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)

        def loss(fn, w):
            return jnp.sum(fn(x, w, wx, modes) ** 2)

        gref = jax.grad(lambda w: loss(factorized_spectral_conv_2d, w))(wy)
        gout = jax.grad(
            lambda w: loss(factorized_spectral_conv_2d_dft_v5, w))(wy)
        np.testing.assert_allclose(np.asarray(gout), np.asarray(gref),
                                   rtol=2e-3, atol=2e-4)
    out16 = factorized_spectral_conv_2d_dft_v5(
        x.astype(jnp.bfloat16), wy, wx, modes,
        gemm_dtype=jnp.bfloat16, store_dtype=jnp.bfloat16)
    assert np.isfinite(np.asarray(out16, np.float32)).all()


def test_spectral_conv_2d_mode_guard_rejects_overlapping_corners():
    """The two first-axis corner blocks must not overlap: modes1 in
    (h//2, h//2+1] used to pass the guard and then crash with a negative
    zeros() dimension."""
    import pytest

    from resolution_pde_tpu.ops.spectral import spectral_conv_2d

    h = 16
    x = jnp.zeros((1, 2, h, h), jnp.float32)
    w = jnp.zeros((2, 2, h // 2 + 1, 4, 2), jnp.float32)
    with pytest.raises(ValueError, match="exceed spectrum"):
        spectral_conv_2d(x, w, w, modes1=h // 2 + 1, modes2=4)
    # the boundary case 2*modes1 == h is legal (mid block is empty)
    w_ok = jnp.zeros((2, 2, h // 2, 4, 2), jnp.float32)
    out = spectral_conv_2d(x, w_ok, w_ok, modes1=h // 2, modes2=4)
    assert out.shape == (1, 2, h, h)
