"""Gaussian random field sampler.

Parity target: data_generation/random_fields.py:6-61 — spectral sampler
u = ifft(sqrt_eig * xi) with eigenvalues
(size^d) * sqrt(2) * sigma * (4 pi^2 |k|^2 + tau^2)^(-alpha/2) and a zeroed
mean mode. Legacy torch.ifft(normalized=False) is the standard
1/N^d-scaled inverse, i.e. numpy/jnp default ifftn.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


class GaussianRF:
    def __init__(self, dim: int, size: int, alpha: float = 2.0,
                 tau: float = 3.0, sigma: float | None = None,
                 boundary: str = "periodic"):
        self.dim = dim
        self.size_tuple = (size,) * dim
        if sigma is None:
            sigma = tau ** (0.5 * (2 * alpha - dim))

        k_max = size // 2
        k = np.concatenate([np.arange(0, k_max), np.arange(-k_max, 0)])
        if dim == 1:
            ksq = k ** 2
        elif dim == 2:
            kx = k[:, None]
            ky = k[None, :]
            ksq = kx ** 2 + ky ** 2
        elif dim == 3:
            kx = k[:, None, None]
            ky = k[None, :, None]
            kz = k[None, None, :]
            ksq = kx ** 2 + ky ** 2 + kz ** 2
        else:
            raise ValueError("dim must be 1, 2 or 3")
        sqrt_eig = (size ** dim) * math.sqrt(2.0) * sigma * (
            (4 * math.pi ** 2 * ksq + tau ** 2) ** (-alpha / 2.0))
        sqrt_eig = np.asarray(sqrt_eig)
        sqrt_eig[(0,) * dim] = 0.0
        self.sqrt_eig = jnp.asarray(sqrt_eig, jnp.float32)

        def _sample(key, n: int):
            kr, ki = jax.random.split(key)
            shape = (n, *self.size_tuple)
            coeff = jax.lax.complex(
                self.sqrt_eig * jax.random.normal(kr, shape),
                self.sqrt_eig * jax.random.normal(ki, shape),
            )
            axes = tuple(range(1, self.dim + 1))
            # legacy torch.ifft(normalized=False) is the standard
            # 1/N^d-scaled inverse (numpy's default); the size^d factor in
            # sqrt_eig cancels it
            return jnp.real(jnp.fft.ifftn(coeff, axes=axes))

        # jitted once per instance: eager dispatch is unsupported on some
        # TPU backends (CLAUDE.md platform gotchas), and datagen drivers
        # call this directly
        self._sample = jax.jit(_sample, static_argnames=("n",))

    def sample(self, key, n: int):
        """Sample n fields; returns real (n, *size). Jitted."""
        return self._sample(key, n)
