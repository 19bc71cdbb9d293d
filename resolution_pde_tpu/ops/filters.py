"""Explicit low-pass filter design for the "original" CNO: windowed-sinc
(Kaiser) interpolation filters used for alias-free up/down-sampling and
filtered activations.

The reference's conf/model/cno_2d/cno_2d_original.yaml:12-16 targets the
camlab-ethz CNO with designed filters (`cutoff_den`, `filter_size`,
`lrelu_upsampling`, `half_width_mult`, `radial`), but the `CNO/` directory
is empty in the snapshot — this module reimplements the filter design from
that config surface (alias-free resampling in the StyleGAN3/CNO-paper
style).

Conventions (per the CNO paper):
  - operating at a grid of size N, the activation upsamples by factor
    `lrelu_upsampling` (default 2);
  - the filter cutoff is f_c = 0.5 / cutoff_den (cycles/sample at the LOW
    rate; cutoff_den slightly above 2 keeps the passband strictly inside
    Nyquist);
  - transition half-width = half_width_mult * (0.5 - f_c);
  - kernel length = filter_size * factor taps (even), Kaiser window with
    beta from the standard attenuation formula.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def design_lowpass_filter(factor: int, filter_size: int = 6,
                          cutoff_den: float = 2.0001,
                          half_width_mult: float = 0.8) -> np.ndarray:
    """1D windowed-sinc interpolation kernel for resampling by `factor`.

    Returns zero-phase taps of length filter_size * factor + 1 (odd, so
    resampling introduces no half-sample shift), normalized to unit DC
    gain (upsampling applies the `factor` gain at the call site).
    """
    numtaps = filter_size * factor + 1
    # cutoff and width in cycles/sample at the HIGH rate
    fc = (0.5 / cutoff_den) / factor
    half_width = (half_width_mult * (0.5 - 0.5 / cutoff_den)) / factor
    # Kaiser beta from desired attenuation via the standard formula
    atten = 2.285 * (numtaps - 1) * np.pi * (2 * half_width) + 7.95
    beta = (0.1102 * (atten - 8.7) if atten > 50 else
            0.5842 * (atten - 21) ** 0.4 + 0.07886 * (atten - 21)
            if atten > 21 else 0.0)
    n = np.arange(numtaps) - (numtaps - 1) / 2
    taps = 2 * fc * np.sinc(2 * fc * n)
    taps = taps * np.kaiser(numtaps, beta)
    taps = taps / taps.sum()
    return taps.astype(np.float32)


@functools.lru_cache(maxsize=64)
def design_lowpass_filter_2d_radial(factor: int, filter_size: int = 6,
                                    cutoff_den: float = 2.0001,
                                    half_width_mult: float = 0.8) -> np.ndarray:
    """Radially-symmetric 2D low-pass (the camlab CNO's `radial: true`
    option, conf/model/cno_2d/cno_2d_original.yaml:16): circular-ideal
    response (jinc kernel) under a radial Kaiser window, unit DC gain."""
    from scipy.special import j1

    numtaps = filter_size * factor + 1
    fc = (0.5 / cutoff_den) / factor
    half_width = (half_width_mult * (0.5 - 0.5 / cutoff_den)) / factor
    atten = 2.285 * (numtaps - 1) * np.pi * (2 * half_width) + 7.95
    beta = (0.1102 * (atten - 8.7) if atten > 50 else
            0.5842 * (atten - 21) ** 0.4 + 0.07886 * (atten - 21)
            if atten > 21 else 0.0)
    n = np.arange(numtaps) - (numtaps - 1) / 2
    yy, xx = np.meshgrid(n, n, indexing="ij")
    r = np.sqrt(xx * xx + yy * yy)
    h = np.where(r < 1e-9, np.pi * fc * fc,
                 fc * j1(2.0 * np.pi * fc * np.maximum(r, 1e-9))
                 / np.maximum(r, 1e-9))
    half = (numtaps - 1) / 2
    t = np.clip(r / max(half, 1e-9), 0.0, 1.0)
    w = np.i0(beta * np.sqrt(np.maximum(1.0 - t * t, 0.0))) / np.i0(beta)
    h = h * w
    h = h / h.sum()
    return h.astype(np.float32)


def _conv2d_same(x, taps2d):
    """Depthwise 2D convolution over the last two axes with periodic
    padding (the CNO domain is periodic)."""
    k = taps2d.shape[0]
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2)
                 + [(pad_l, pad_r), (pad_l, pad_r)], mode="wrap")
    w = jnp.asarray(taps2d)[::-1, ::-1]
    lead = xp.shape[:-2]
    out = jax.lax.conv_general_dilated(
        xp.reshape(-1, 1, *xp.shape[-2:]),
        w.reshape(1, 1, k, k),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(*lead, *out.shape[-2:])


def _conv1d_same_last(x, taps):
    """Depthwise 1D convolution along the last axis with 'same'-style
    padding for an even-length kernel."""
    k = taps.shape[0]
    pad_l = (k - 1) // 2
    pad_r = k - 1 - pad_l
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_l, pad_r)], mode="wrap")
    # convolve via correlation with flipped taps
    w = jnp.asarray(taps)[::-1]
    windows = jax.lax.conv_general_dilated(
        xp.reshape(-1, 1, xp.shape[-1]),
        w.reshape(1, 1, -1),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return windows.reshape(*x.shape[:-1], -1)


def upsample_1d(x, factor: int, **design_kw):
    """Alias-free upsample along the last axis: zero-stuff then filter."""
    taps = design_lowpass_filter(factor, **design_kw)
    n = x.shape[-1]
    up = jnp.zeros((*x.shape[:-1], n * factor), dtype=x.dtype)
    up = up.at[..., ::factor].set(x)
    return _conv1d_same_last(up, taps * factor)


def downsample_1d(x, factor: int, **design_kw):
    """Alias-free downsample along the last axis: filter then stride."""
    taps = design_lowpass_filter(factor, **design_kw)
    return _conv1d_same_last(x, taps)[..., ::factor]


def upsample_2d(x, factor: int, radial: bool = False, **design_kw):
    """Alias-free upsample over the last two axes: separable windowed-sinc
    by default, radially-symmetric jinc filter with radial=True."""
    if radial:
        taps = design_lowpass_filter_2d_radial(factor, **design_kw)
        h, w_sz = x.shape[-2], x.shape[-1]
        up = jnp.zeros((*x.shape[:-2], h * factor, w_sz * factor),
                       dtype=x.dtype)
        up = up.at[..., ::factor, ::factor].set(x)
        return _conv2d_same(up, taps * factor * factor)
    x = upsample_1d(x, factor, **design_kw)
    x = jnp.swapaxes(x, -1, -2)
    x = upsample_1d(x, factor, **design_kw)
    return jnp.swapaxes(x, -1, -2)


def downsample_2d(x, factor: int, radial: bool = False, **design_kw):
    if radial:
        taps = design_lowpass_filter_2d_radial(factor, **design_kw)
        return _conv2d_same(x, taps)[..., ::factor, ::factor]
    x = downsample_1d(x, factor, **design_kw)
    x = jnp.swapaxes(x, -1, -2)
    x = downsample_1d(x, factor, **design_kw)
    return jnp.swapaxes(x, -1, -2)


def filtered_lrelu_2d(x, up_factor: int = 2, negative_slope: float = 0.01,
                      out_factor: int | None = None, radial: bool = False,
                      **design_kw):
    """Alias-free activation: upsample -> LeakyReLU -> downsample.

    x: (..., H, W). out_factor: net output downsample relative to the
    upsampled grid (default: back to the input size)."""
    x = upsample_2d(x, up_factor, radial=radial, **design_kw)
    x = jax.nn.leaky_relu(x, negative_slope)
    return downsample_2d(x, out_factor or up_factor, radial=radial,
                         **design_kw)
