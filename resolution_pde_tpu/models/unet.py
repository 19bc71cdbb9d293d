"""PDEBench UNet 1D/2D.

Parity target: models/unet.py:7-108 (1D, BatchNorm or GroupNorm) and
:204-293 (2D, BatchNorm) in the reference — 4-level MaxPool encoder /
ConvTranspose(k=2, s=2) decoder with skip concats, double-conv blocks
(Conv k=3 p=1 no-bias -> Norm -> Tanh) x2, final 1x1 conv.

TPU design: channels-last internally (flax conv layout); BatchNorm carries
running stats in the 'batch_stats' collection and computes batch stats over
the globally-sharded batch (XLA inserts the cross-device reduction), which
fixes the reference's DataParallel per-replica-stats quirk.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class _DoubleConv(nn.Module):
    features: int
    use_groupnorm: bool = False
    ndim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kernel = (3,) * self.ndim
        for _ in range(2):
            x = nn.Conv(self.features, kernel, padding="SAME",
                        use_bias=False)(x)
            if self.use_groupnorm:
                x = nn.GroupNorm(num_groups=min(8, self.features))(x)
            else:
                x = nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5)(x)
            x = jnp.tanh(x)
        return x


def _max_pool(x, ndim: int):
    window = (2,) * ndim
    return nn.max_pool(x, window_shape=window, strides=window)


class _UNet(nn.Module):
    """Shared 1D/2D UNet body, channels-last."""

    in_channels: int
    out_channels: int
    width: int
    use_groupnorm: bool
    ndim: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        f = self.width
        kernel = (2,) * self.ndim

        enc = []
        feats = [f, f * 2, f * 4, f * 8]
        for i, feat in enumerate(feats):
            if i > 0:
                x = _max_pool(x, self.ndim)
            x = _DoubleConv(feat, self.use_groupnorm, self.ndim)(
                x, deterministic)
            enc.append(x)

        x = _max_pool(x, self.ndim)
        x = _DoubleConv(f * 16, self.use_groupnorm, self.ndim)(
            x, deterministic)

        for feat, skip in zip(reversed(feats), reversed(enc)):
            x = nn.ConvTranspose(feat, kernel, strides=kernel)(x)
            x = jnp.concatenate([x, skip], axis=-1)
            x = _DoubleConv(feat, self.use_groupnorm, self.ndim)(
                x, deterministic)

        return nn.Conv(self.out_channels, (1,) * self.ndim)(x)


class UNet1d(nn.Module):
    """Input (B, C, X) -> (B, C_out, X). Spatial size must be divisible by
    16 (4 pooling levels)."""

    in_channels: int = 3
    out_channels: int = 1
    width: int = 32
    use_groupnorm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jnp.swapaxes(x, -1, -2)
        x = _UNet(self.in_channels, self.out_channels, self.width,
                  self.use_groupnorm, ndim=1)(x, deterministic)
        return jnp.swapaxes(x, -1, -2)


class UNet2d(nn.Module):
    """Input (B, C, H, W) -> (B, C_out, H, W); H, W divisible by 16."""

    in_channels: int = 3
    out_channels: int = 1
    width: int = 32
    use_groupnorm: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jnp.moveaxis(x, 1, -1)
        x = _UNet(self.in_channels, self.out_channels, self.width,
                  self.use_groupnorm, ndim=2)(x, deterministic)
        return jnp.moveaxis(x, -1, 1)
