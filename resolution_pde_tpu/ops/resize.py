"""FFT-based resampling: spectral downsample, resize (up/down), and low-pass
filtering. These define the "resize" and anti-aliased "naive" resolution
strategies.

Parity targets in the reference:
  - downsample / downsample_1d: utils/res_utils.py:20-27, 63-91
      forward-norm FFT, symmetric frequency-band selection
      (freqs in [-N/2, N/2-1]), inverse FFT, take real part.
  - resize / resize_1d: utils/res_utils.py:29-50, 93-125
      backward-norm rfft, zero-pad/crop with top/bottom frequency-block copy
      (2D) and amplitude rescale by the size ratio.
  - lowpass_filter_1d / 2d: utils/low_pass_filter.py:3-100
      zero modes above cutoff_ratio; 2D uses a rectangular fftfreq mask.

All functions are shape-polymorphic over leading axes and jit-friendly
(output sizes are static Python ints).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _band_select_indices(n_old: int, n_new: int) -> np.ndarray:
    """Indices of FFT bins with frequency in [-n_new/2, n_new/2 - 1].

    Matches scipy.fft.fftfreq-based selection in utils/res_utils.py:22-23.
    Static (numpy) so jit sees a constant gather.
    """
    freqs = np.fft.fftfreq(n_old, d=1.0 / n_old)
    sel = np.logical_and(freqs >= -n_new / 2, freqs <= n_new / 2 - 1)
    return np.nonzero(sel)[0]


def fft_downsample_1d(u, n_new: int):
    """Spectral truncation downsample along the last axis. u: (..., N_old)."""
    n_old = u.shape[-1]
    idx = _band_select_indices(n_old, n_new)
    u_hat = jnp.fft.fft(u, axis=-1, norm="forward")
    u_hat_down = u_hat[..., idx]
    return jnp.fft.ifft(u_hat_down, axis=-1, norm="forward").real


def fft_downsample_2d(u, n_new: int):
    """Spectral truncation downsample along the last two axes. u: (..., N, N)."""
    n_old = u.shape[-2]
    idx = _band_select_indices(n_old, n_new)
    u_hat = jnp.fft.fft2(u, axes=(-2, -1), norm="forward")
    u_hat_down = u_hat[..., idx, :][..., :, idx]
    return jnp.fft.ifft2(u_hat_down, axes=(-2, -1), norm="forward").real


def fft_resize_1d(x, out_size: int):
    """FFT interpolation resize along the last axis, with amplitude rescale
    by out_size/in_size (utils/res_utils.py:93-125)."""
    in_size = x.shape[-1]
    f = jnp.fft.rfft(x, axis=-1, norm="backward")
    out_freqs = out_size // 2 + 1
    max_freqs = min(f.shape[-1], out_freqs)
    f_z = jnp.pad(
        f[..., :max_freqs],
        [(0, 0)] * (f.ndim - 1) + [(0, out_freqs - max_freqs)],
    )
    x_z = jnp.fft.irfft(f_z, n=out_size, axis=-1)
    return x_z * (out_size / in_size)


def fft_resize_2d(x, out_size):
    """FFT interpolation resize along the last two axes.

    out_size: (H_out, W_out). Copies the top ([:top1]) and bottom
    ([-bot1:]) frequency blocks along the first spatial axis and rescales
    amplitude by the area ratio (utils/res_utils.py:29-50).
    """
    h_out, w_out = int(out_size[0]), int(out_size[1])
    h_in, w_in = x.shape[-2], x.shape[-1]
    f = jnp.fft.rfft2(x, axes=(-2, -1), norm="backward")
    out_freqs = w_out // 2 + 1

    top1 = min((f.shape[-2] + 1) // 2, (h_out + 1) // 2)
    top2 = min(f.shape[-1], out_freqs)
    bot1 = min(f.shape[-2] // 2, h_out // 2)
    bot2 = min(f.shape[-1], out_freqs)

    batch_shape = x.shape[:-2]
    f_z = jnp.zeros((*batch_shape, h_out, out_freqs), dtype=f.dtype)
    f_z = f_z.at[..., :top1, :top2].set(f[..., :top1, :top2])
    f_z = f_z.at[..., h_out - bot1:, :bot2].set(f[..., f.shape[-2] - bot1:, :bot2])
    x_z = jnp.fft.irfft2(f_z, s=(h_out, w_out), axes=(-2, -1))
    return x_z * (h_out / h_in) * (w_out / w_in)


def lowpass_filter_1d(data, cutoff_ratio: float = 0.25):
    """Zero rfft bins at index >= int(n_freqs * cutoff_ratio) along the last
    axis (utils/low_pass_filter.py:24-34). Shape-preserving."""
    n = data.shape[-1]
    f = jnp.fft.rfft(data, axis=-1)
    n_freqs = f.shape[-1]
    cutoff_idx = int(n_freqs * cutoff_ratio)
    mask = (np.arange(n_freqs) < cutoff_idx).astype(np.float32)
    f = f * mask
    return jnp.fft.irfft(f, n=n, axis=-1)


def lowpass_filter_2d(data, cutoff_ratio: float = 0.25):
    """Rectangular spectral low-pass over the last two axes: keep
    |freq| <= cutoff_ratio * 0.5 in both dimensions
    (utils/low_pass_filter.py:62-94). Assumes square spatial dims."""
    n = data.shape[-1]
    f = jnp.fft.rfft2(data, axes=(-2, -1))
    freq_y = np.fft.fftfreq(n)
    freq_x = np.fft.fftfreq(n)[: n // 2 + 1]
    cutoff = cutoff_ratio * 0.5
    mask = (
        (np.abs(freq_y) <= cutoff).astype(np.float32)[:, None]
        * (np.abs(freq_x) <= cutoff).astype(np.float32)[None, :]
    )
    f = f * mask
    return jnp.fft.irfft2(f, s=(n, n), axes=(-2, -1))
