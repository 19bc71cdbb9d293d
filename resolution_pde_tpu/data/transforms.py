"""Host-side numpy transforms: stride reductions, spatial resolution
reduction (naive stride / spectral low-pass / FFT resize), Markov pairing.

Parity targets:
  - reduce + spatial handling: dataloaders/ks_naive_markov.py:253-280,
    dataloaders/ns_naive_markov.py:218-247 (adaptive low-pass cutoff
    (1/reduced_resolution) * lowpass_cutoff_ratio, filter WITHOUT
    subsampling).
  - Markov pairing 1D: x=u[:, :-1], y=u[:, 1:] -> (b*t, 1, s)
    (ks_naive_markov.py:166-181).
  - Markov pairing 2D (NS): x=u[:, 1:-1], y=u[:, 2:] -> (b*t, c, h, w)
    (ns_naive_markov.py:258-272).
  - FFT resize strategy: dataloaders/ks_resize_markov.py /
    burger_resize_markov.py use ops.resize on the spatial axis.

The spectral ops run through jnp (ops.resize) but are invoked here on host
CPU arrays at load time.
"""

from __future__ import annotations

import numpy as np
import jax

from resolution_pde_tpu.ops.resize import (
    fft_downsample_1d,
    fft_downsample_2d,
    fft_resize_1d,
    fft_resize_2d,
    lowpass_filter_1d,
    lowpass_filter_2d,
)

# Host-side data prep calls these OUTSIDE any jit. On TPU backends where
# eager (unjitted) dispatch is UNIMPLEMENTED (CLAUDE.md) every call must go
# through a compiled program, so the spectral transforms are jitted with
# their size/cutoff arguments static. One compile per distinct shape/size —
# data-prep shapes are few.
jit_resize_1d = jax.jit(fft_resize_1d, static_argnums=1)
jit_resize_2d = jax.jit(fft_resize_2d, static_argnums=1)
jit_downsample_1d = jax.jit(fft_downsample_1d, static_argnums=1)
jit_downsample_2d = jax.jit(fft_downsample_2d, static_argnums=1)
jit_lowpass_1d = jax.jit(lowpass_filter_1d, static_argnames="cutoff_ratio")
jit_lowpass_2d = jax.jit(lowpass_filter_2d, static_argnames="cutoff_ratio")


def reduce_trajectories(
    u: np.ndarray,
    reduced_batch: int = 1,
    reduced_resolution: int = 1,
    reduced_resolution_t: int = 1,
    use_low_pass_filter: bool = False,
    lowpass_cutoff_ratio: float = 1.0,
    num_samples_max: int = -1,
    spatial_ndim: int = 1,
) -> np.ndarray:
    """Apply batch/time strides and spatial reduction to trajectories.

    u: (batch, time, *spatial[, channels for 2D]) — spatial_ndim in {1, 2}.
    With use_low_pass_filter, the data is FILTERED at full resolution (no
    subsampling), matching the reference's "anti-aliased naive" strategy.
    """
    u = u[::reduced_batch, ::reduced_resolution_t]
    if reduced_resolution > 1:
        if use_low_pass_filter:
            cutoff = (1.0 / reduced_resolution) * lowpass_cutoff_ratio
            if spatial_ndim == 1:
                u = np.asarray(jit_lowpass_1d(u, cutoff_ratio=cutoff))
            else:
                # u: (b, t, h, w[, c]) — filter over the two spatial axes
                if u.ndim == 5:  # channels-last: move c before spatial
                    u_cf = np.moveaxis(u, -1, 2)
                    u_cf = np.asarray(
                        jit_lowpass_2d(u_cf, cutoff_ratio=cutoff))
                    u = np.moveaxis(u_cf, 2, -1)
                else:
                    u = np.asarray(jit_lowpass_2d(u, cutoff_ratio=cutoff))
        else:
            if spatial_ndim == 1:
                u = u[:, :, ::reduced_resolution]
            else:
                u = u[:, :, ::reduced_resolution, ::reduced_resolution]
    if num_samples_max > 0:
        u = u[: min(num_samples_max, u.shape[0])]
    return np.ascontiguousarray(u, dtype=np.float32)


def resize_trajectories(u: np.ndarray, s: int, spatial_ndim: int = 1,
                        method: str = "resize") -> np.ndarray:
    """FFT-based spatial resize of trajectories to size s (the "resize"
    strategy, dataloaders/*_resize_*.py)."""
    if spatial_ndim == 1:
        if u.shape[-1] == s:
            return np.asarray(u, dtype=np.float32)
        fn = jit_resize_1d if method == "resize" else jit_downsample_1d
        return np.asarray(fn(u, s), dtype=np.float32)
    # 2D: u (..., h, w) square
    if u.shape[-1] == s and u.shape[-2] == s:
        return np.asarray(u, dtype=np.float32)
    if method == "resize":
        return np.asarray(jit_resize_2d(u, (s, s)), dtype=np.float32)
    return np.asarray(jit_downsample_2d(u, s), dtype=np.float32)


def markov_pairs_1d(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """u: (b, t, s) -> x, y each (b*(t-1), 1, s)."""
    x = u[:, :-1]
    y = u[:, 1:]
    b, t, s = x.shape
    x = x.reshape(b * t, 1, s)
    y = y.reshape(b * t, 1, s)
    return np.ascontiguousarray(x), np.ascontiguousarray(y)


def markov_pairs_2d(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """u: (b, t, h, w, c) -> x, y each (b*(t-2), c, h, w).

    NS pairing skips the first step: x=u[:, 1:-1], y=u[:, 2:]
    (ns_naive_markov.py:258-262).
    """
    x = u[:, 1:-1]
    y = u[:, 2:]
    b, t, h, w, c = x.shape
    x = np.moveaxis(x, -1, 2).reshape(b * t, c, h, w)
    y = np.moveaxis(y, -1, 2).reshape(b * t, c, h, w)
    return np.ascontiguousarray(x), np.ascontiguousarray(y)


def split_ratio_indices(n: int, split_ratio=(0.8, 0.1, 0.1)):
    """Deterministic contiguous train/val/test split boundaries
    (burger_naive_markov.py:96-100 semantics: int truncation)."""
    train_end = int(n * split_ratio[0])
    val_end = train_end + int(n * split_ratio[1])
    return train_end, val_end


def sliding_windows(u: np.ndarray, window_size: int):
    """Sequence windows for S4-style models (dataloaders/burger_s4.py:49-77):
    inputs u[:, i:i+w], target u[:, i+w] for every valid i.

    u: (b, t, s) -> x (N, window_size, s), y (N, s).
    """
    b, t, s = u.shape
    n_win = t - window_size
    if n_win <= 0:
        raise ValueError(f"window_size {window_size} >= trajectory length {t}")
    xs = np.empty((b * n_win, window_size, s), dtype=np.float32)
    ys = np.empty((b * n_win, s), dtype=np.float32)
    k = 0
    for i in range(n_win):
        xs[k: k + b] = u[:, i: i + window_size]
        ys[k: k + b] = u[:, i + window_size]
        k += b
    return xs, ys
