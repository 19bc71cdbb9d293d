"""Antialiased bicubic interpolation (the CNO up/down-sampling primitive).

Parity target: torch F.interpolate(mode="bicubic", antialias=True) as used
by CNO_LReLu (models/CNO1d.py:42-45, models/CNO2d.py:42-46).
jax.image.resize(method="bicubic", antialias=True) implements the same
PIL-style antialiased Keys-cubic resample with half-pixel centers and
matches torch to float32 roundoff (verified in tests/test_cno.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bicubic_resize_1d(x, out_size: int):
    """x: (..., N) -> (..., out_size), antialiased bicubic."""
    out_shape = (*x.shape[:-1], out_size)
    return jax.image.resize(x, out_shape, method="bicubic", antialias=True)


def bicubic_resize_2d(x, out_size):
    """x: (..., H, W) -> (..., out_h, out_w), antialiased bicubic."""
    out_h, out_w = out_size
    out_shape = (*x.shape[:-2], out_h, out_w)
    return jax.image.resize(x, out_shape, method="bicubic", antialias=True)


def cno_lrelu_1d(x, in_size: int, out_size: int, negative_slope: float = 0.01):
    """CNO antialiased activation: upsample 2x -> LeakyReLU -> downsample
    to out_size (models/CNO1d.py:41-45). x: (..., in_size)."""
    x = bicubic_resize_1d(x, 2 * in_size)
    x = jax.nn.leaky_relu(x, negative_slope)
    return bicubic_resize_1d(x, out_size)


def cno_lrelu_2d(x, in_size: int, out_size: int, negative_slope: float = 0.01):
    """2D variant (models/CNO2d.py:41-46). x: (..., in_size, in_size)."""
    x = bicubic_resize_2d(x, (2 * in_size, 2 * in_size))
    x = jax.nn.leaky_relu(x, negative_slope)
    return bicubic_resize_2d(x, (out_size, out_size))
