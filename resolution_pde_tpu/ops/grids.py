"""Coordinate-grid helpers concatenated to model inputs as extra channels.

Parity targets:
  - FNO1d.get_grid: linspace(0, 2*pi) (models/fno.py:51).
  - FNO2d.get_grid / FFNO2D.get_grid: linspace(0, 1) per axis
    (models/fno.py:121-125, models/ffno.py:201-205).
  - FFNO1D.get_grid: linspace(0, 1) (models/ffno.py:92).

Grids are generated inside jit from static shapes — no host transfer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def grid_1d(n: int, lo: float = 0.0, hi: float = 1.0, dtype=jnp.float32):
    """(n,) linspace grid, endpoint included (np.linspace semantics)."""
    return jnp.asarray(np.linspace(lo, hi, n), dtype=dtype)


def concat_grid_1d(x, lo: float = 0.0, hi: float = 1.0):
    """Append a coordinate channel. x: (B, X, C) -> (B, X, C+1)."""
    b, n = x.shape[0], x.shape[1]
    g = jnp.broadcast_to(grid_1d(n, lo, hi, x.dtype)[None, :, None], (b, n, 1))
    return jnp.concatenate([x, g], axis=-1)


def concat_grid_2d(x, lo: float = 0.0, hi: float = 1.0):
    """Append two coordinate channels. x: (B, H, W, C) -> (B, H, W, C+2)."""
    b, h, w = x.shape[0], x.shape[1], x.shape[2]
    gx = jnp.broadcast_to(grid_1d(h, lo, hi, x.dtype)[None, :, None, None],
                          (b, h, w, 1))
    gy = jnp.broadcast_to(grid_1d(w, lo, hi, x.dtype)[None, None, :, None],
                          (b, h, w, 1))
    return jnp.concatenate([x, gx, gy], axis=-1)
