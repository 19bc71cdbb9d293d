"""FNO 1D/2D: classic Fourier Neural Operator.

Parity targets: models/fno.py:24-150 and models/fno_blocks.py:25-82 in the
reference — grid-coordinate channel concat, 1x1-conv lifting, N blocks of
(spectral conv + pointwise bypass + activation), pointwise MLP projection.

TPU design: boundary layout matches the reference ((B, C, X) / (B, C, H, W));
internally channels-last so every pointwise op is an MXU matmul. Spectral
weights are stored real with trailing (re, im) dim and initialized
U(0, 1/(C_in*C_out)) per component, matching `scale * torch.rand(..)` of
models/spectral_convolution.py:32, 70-73.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.models.layers import (
    ACTIVATIONS,
    PointwiseMLP,
    TorchLinear,
)
from resolution_pde_tpu.ops.grids import concat_grid_1d, concat_grid_2d
from resolution_pde_tpu.ops.spectral import (
    spectral_conv_1d,
    spectral_conv_2d,
)


def _fno_weight_init(scale: float):
    def init(rng, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(rng, shape, dtype)

    return init


class SpectralConv1dLayer(nn.Module):
    in_channels: int
    out_channels: int
    modes: int

    @nn.compact
    def __call__(self, x):
        """x: (B, X, C_in) channels-last -> (B, X, C_out)."""
        scale = 1.0 / (self.in_channels * self.out_channels)
        w = self.param(
            "weights1",
            _fno_weight_init(scale),
            (self.in_channels, self.out_channels, self.modes, 2),
        )
        xc = jnp.swapaxes(x, -1, -2)  # (B, C, X)
        out = spectral_conv_1d(xc, w, self.modes)
        return jnp.swapaxes(out, -1, -2)


class SpectralConv2dLayer(nn.Module):
    in_channels: int
    out_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C_in) channels-last -> (B, H, W, C_out)."""
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes1, self.modes2, 2)
        w1 = self.param("weights1", _fno_weight_init(scale), shape)
        w2 = self.param("weights2", _fno_weight_init(scale), shape)
        xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
        out = spectral_conv_2d(xc, w1, w2, self.modes1, self.modes2)
        return jnp.moveaxis(out, 1, -1)


class FNOBlock1d(nn.Module):
    """activation(spectral_conv(x) + pointwise_bypass(x)) — fno_blocks.py:25-33."""

    width: int
    modes: int
    activation: str = "relu"

    @nn.compact
    def __call__(self, x):
        spec = SpectralConv1dLayer(self.width, self.width, self.modes)(x)
        bypass = TorchLinear(self.width)(x)
        return ACTIVATIONS[self.activation](spec + bypass)


class FNOBlock2d(nn.Module):
    width: int
    modes1: int
    modes2: int
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x):
        spec = SpectralConv2dLayer(self.width, self.width, self.modes1,
                                   self.modes2)(x)
        bypass = TorchLinear(self.width)(x)
        return ACTIVATIONS[self.activation](spec + bypass)


class FNO1d(nn.Module):
    """1D FNO. Input (B, C_in, X) -> (B, C_out, X).

    Grid channel is linspace(0, 2*pi, X) (models/fno.py:51).
    """

    in_channels: int
    out_channels: int
    modes: int
    width: int
    n_blocks: int = 4
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic  # FNO has no dropout; kwarg kept for harness uniformity
        x = jnp.swapaxes(x, -1, -2)  # (B, X, C)
        x = concat_grid_1d(x, 0.0, 2.0 * jnp.pi)
        x = TorchLinear(self.width)(x)  # lifting (1x1 conv)
        for _ in range(self.n_blocks):
            x = FNOBlock1d(self.width, self.modes, self.activation)(x)
        x = PointwiseMLP(self.out_channels, self.width * 4)(x)
        return jnp.swapaxes(x, -1, -2)


class FNO2d(nn.Module):
    """2D FNO. Input (B, C_in, H, W) -> (B, C_out, H, W).

    Grid channels are linspace(0, 1) per axis (models/fno.py:121-125).
    """

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    width: int
    n_blocks: int = 4
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        del deterministic  # FNO has no dropout; kwarg kept for harness uniformity
        x = jnp.moveaxis(x, 1, -1)  # (B, H, W, C)
        x = concat_grid_2d(x, 0.0, 1.0)
        x = TorchLinear(self.width)(x)
        for _ in range(self.n_blocks):
            x = FNOBlock2d(self.width, self.modes1, self.modes2,
                           self.activation)(x)
        x = PointwiseMLP(self.out_channels, self.width * 4)(x)
        return jnp.moveaxis(x, -1, 1)
