"""FFT resize / downsample / low-pass parity tests against independent
scipy/torch formulations of the reference semantics (utils/res_utils.py,
utils/low_pass_filter.py)."""

import numpy as np
import scipy.fft
import torch
import jax.numpy as jnp

from resolution_pde_tpu.ops import (
    fft_downsample_1d,
    fft_downsample_2d,
    fft_resize_1d,
    fft_resize_2d,
    lowpass_filter_1d,
    lowpass_filter_2d,
)


def _scipy_downsample_2d(u, n):
    n_old = u.shape[-2]
    freqs = scipy.fft.fftfreq(n_old, d=1 / n_old)
    sel = np.logical_and(freqs >= -n / 2, freqs <= n / 2 - 1)
    u_hat = scipy.fft.fft2(u, norm="forward")
    u_hat_down = u_hat[..., sel, :][..., :, sel]
    return scipy.fft.ifft2(u_hat_down, norm="forward").real


def test_downsample_2d_parity(rng):
    u = rng.standard_normal((2, 3, 64, 64)).astype(np.float64)
    expected = _scipy_downsample_2d(u, 32)
    got = np.asarray(fft_downsample_2d(jnp.asarray(u, jnp.float32), 32))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def _scipy_downsample_1d(u, n):
    n_old = u.shape[-1]
    freqs = scipy.fft.fftfreq(n_old, d=1 / n_old)
    sel = np.logical_and(freqs >= -n / 2, freqs <= n / 2 - 1)
    u_hat = scipy.fft.fft(u, norm="forward", axis=-1)
    return scipy.fft.ifft(u_hat[..., sel], norm="forward", axis=-1).real


def test_downsample_1d_parity(rng):
    u = rng.standard_normal((4, 128)).astype(np.float64)
    for n in (32, 64):
        expected = _scipy_downsample_1d(u, n)
        got = np.asarray(fft_downsample_1d(jnp.asarray(u, jnp.float32), n))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_downsample_preserves_bandlimited_signal():
    """Downsampling a band-limited signal then comparing pointwise to the
    analytic function on the coarse grid must be exact."""
    n_old, n_new = 128, 32
    t = np.arange(n_old) / n_old
    sig = np.sin(2 * np.pi * 3 * t) + 0.5 * np.cos(2 * np.pi * 7 * t)
    got = np.asarray(fft_downsample_1d(jnp.asarray(sig, jnp.float32), n_new))
    t_new = np.arange(n_new) / n_new
    expected = np.sin(2 * np.pi * 3 * t_new) + 0.5 * np.cos(2 * np.pi * 7 * t_new)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def _torch_resize_1d(x, out_size):
    xt = torch.from_numpy(x)
    f = torch.fft.rfft(xt, norm="backward")
    f_z = torch.zeros((*x.shape[:-1], out_size // 2 + 1), dtype=f.dtype)
    max_freqs = min(f.shape[-1], out_size // 2 + 1)
    f_z[..., :max_freqs] = f[..., :max_freqs]
    x_z = torch.fft.irfft(f_z, n=out_size)
    return (x_z * (out_size / x.shape[-1])).numpy()


def test_resize_1d_parity_up_and_down(rng):
    x = rng.standard_normal((3, 64)).astype(np.float32)
    for out in (32, 128):
        expected = _torch_resize_1d(x, out)
        got = np.asarray(fft_resize_1d(jnp.asarray(x), out))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def _torch_resize_2d(x, out_size):
    xt = torch.from_numpy(x)
    f = torch.fft.rfft2(xt, norm="backward")
    f_z = torch.zeros(
        (*x.shape[:-2], out_size[0], out_size[1] // 2 + 1), dtype=f.dtype)
    top1 = min((f.shape[-2] + 1) // 2, (out_size[0] + 1) // 2)
    top2 = min(f.shape[-1], out_size[1] // 2 + 1)
    bot1 = min(f.shape[-2] // 2, out_size[0] // 2)
    bot2 = min(f.shape[-1], out_size[1] // 2 + 1)
    f_z[..., :top1, :top2] = f[..., :top1, :top2]
    f_z[..., -bot1:, :bot2] = f[..., -bot1:, :bot2]
    x_z = torch.fft.irfft2(f_z, s=out_size)
    scale = (out_size[0] / x.shape[-2]) * (out_size[1] / x.shape[-1])
    return (x_z * scale).numpy()


def test_resize_2d_parity_up_and_down(rng):
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    for out in ((16, 16), (64, 64), (48, 48)):
        expected = _torch_resize_2d(x, out)
        got = np.asarray(fft_resize_2d(jnp.asarray(x), out))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_lowpass_1d_exact_on_bandlimited():
    """A signal entirely below the cutoff passes through unchanged."""
    n = 128
    t = np.arange(n) / n
    sig = np.sin(2 * np.pi * 5 * t).astype(np.float32)[None, None]
    out = np.asarray(lowpass_filter_1d(jnp.asarray(sig), cutoff_ratio=0.25))
    np.testing.assert_allclose(out, sig, atol=1e-5)


def test_lowpass_1d_removes_high_frequency():
    n = 128
    t = np.arange(n) / n
    lo = np.sin(2 * np.pi * 5 * t)
    hi = np.sin(2 * np.pi * 40 * t)
    sig = (lo + hi).astype(np.float32)[None, None]
    out = np.asarray(lowpass_filter_1d(jnp.asarray(sig), cutoff_ratio=0.25))
    np.testing.assert_allclose(out[0, 0], lo, atol=1e-4)


def _torch_lowpass_2d(data, cutoff_ratio):
    dt = torch.from_numpy(data)
    f = torch.fft.rfft2(dt, dim=(-2, -1))
    n = data.shape[-1]
    freq_y = torch.fft.fftfreq(n)
    freq_x = torch.fft.rfftfreq(n)
    cutoff = cutoff_ratio * 0.5
    mask = ((freq_y.abs() <= cutoff).float().view(-1, 1)
            * (freq_x.abs() <= cutoff).float().view(1, -1))
    f = f * mask
    return torch.fft.irfft2(f, s=(n, n), dim=(-2, -1)).numpy()


def test_lowpass_2d_parity(rng):
    data = rng.standard_normal((2, 3, 1, 32, 32)).astype(np.float32)
    for ratio in (0.125, 0.25, 0.5):
        expected = _torch_lowpass_2d(data, ratio)
        got = np.asarray(lowpass_filter_2d(jnp.asarray(data), ratio))
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)
