"""CNO 1D/2D (vanilla, ETH tutorial version): Convolutional Neural Operator
with antialiased up/down-sampling activations.

Parity target: models/CNO1d.py:30-338 and models/CNO2d.py (same structure
in 2D) — CNO_LReLu antialiased activation (bicubic-antialias upsample 2x ->
LeakyReLU -> downsample to out_size), CNOBlock = Conv(k3) -> BN -> act,
LiftProjectBlock, ResidualBlock/ResNet, UNet-shaped encoder/decoder with
ED_expansion skip-size-matching blocks. Spatial sizes are baked in at
construction from `size` (models/CNO1d.py:237-241) — which is exactly the
static-shape contract XLA wants.

The filtered "original" CNO (explicit sinc/low-pass design) lives in
models/cno_original.py.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.ops.interpolation import cno_lrelu_1d, cno_lrelu_2d


def _cno_act(x, in_size: int, out_size: int, ndim: int):
    """Channels-last antialiased activation; operates on spatial axes."""
    if ndim == 1:
        # x: (B, X, C) -> move spatial last for the resize helper
        xc = jnp.swapaxes(x, -1, -2)
        xc = cno_lrelu_1d(xc, in_size, out_size)
        return jnp.swapaxes(xc, -1, -2)
    xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    xc = cno_lrelu_2d(xc, in_size, out_size)
    return jnp.moveaxis(xc, 1, -1)


class CNOBlock(nn.Module):
    """Conv(k3, SAME) -> BN (optional) -> antialiased activation with
    resampling to out_size (models/CNO1d.py:51-85)."""

    out_channels: int
    in_size: int
    out_size: int
    use_bn: bool = True
    ndim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.out_channels, (3,) * self.ndim, padding="SAME")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5)(x)
        return _cno_act(x, self.in_size, self.out_size, self.ndim)


class LiftProjectBlock(nn.Module):
    """CNOBlock (no BN) -> Conv(k3) (models/CNO1d.py:91-115)."""

    out_channels: int
    size: int
    latent_dim: int = 64
    ndim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = CNOBlock(self.latent_dim, self.size, self.size, use_bn=False,
                     ndim=self.ndim)(x, deterministic)
        return nn.Conv(self.out_channels, (3,) * self.ndim, padding="SAME")(x)


class ResidualBlock(nn.Module):
    """x + (Conv -> BN -> act -> Conv -> BN) (models/CNO1d.py:121-164)."""

    channels: int
    size: int
    use_bn: bool = True
    ndim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out = nn.Conv(self.channels, (3,) * self.ndim, padding="SAME")(x)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=deterministic,
                               momentum=0.9, epsilon=1e-5)(out)
        out = _cno_act(out, self.size, self.size, self.ndim)
        out = nn.Conv(self.channels, (3,) * self.ndim, padding="SAME")(out)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=deterministic,
                               momentum=0.9, epsilon=1e-5)(out)
        return x + out


class _CNO(nn.Module):
    """Shared 1D/2D CNO body, channels-last (B, *spatial, C)."""

    in_dim: int
    out_dim: int
    size: int
    n_layers: int
    n_res: int = 4
    n_res_neck: int = 4
    channel_multiplier: int = 16
    use_bn: bool = True
    ndim: int = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        nl = self.n_layers
        lift_dim = self.channel_multiplier // 2

        enc_feats = [lift_dim] + [2 ** i * self.channel_multiplier
                                  for i in range(nl)]
        dec_out = list(reversed(enc_feats[:-1]))

        enc_sizes = [self.size // 2 ** i for i in range(nl + 1)]
        dec_sizes = [self.size // 2 ** (nl - i) for i in range(nl + 1)]

        x = LiftProjectBlock(enc_feats[0], self.size, ndim=self.ndim)(
            x, deterministic)

        # encoder with per-level ResNets saved as skips
        skips = []
        for i in range(nl):
            y = x
            for _ in range(self.n_res):
                y = ResidualBlock(enc_feats[i], enc_sizes[i], self.use_bn,
                                  self.ndim)(y, deterministic)
            skips.append(y)
            x = CNOBlock(enc_feats[i + 1], enc_sizes[i], enc_sizes[i + 1],
                         self.use_bn, self.ndim)(x, deterministic)

        # bottleneck ResNet
        for _ in range(self.n_res_neck):
            x = ResidualBlock(enc_feats[nl], enc_sizes[nl], self.use_bn,
                              self.ndim)(x, deterministic)

        # ED_expansion blocks resize skip tensors to decoder sizes
        # (models/CNO1d.py:265-270); defined for levels 0..nl
        def ed_expand(z, level):
            return CNOBlock(enc_feats[level], enc_sizes[level],
                            dec_sizes[nl - level], self.use_bn,
                            self.ndim)(z, deterministic)

        # decoder (models/CNO1d.py:322-332)
        for i in range(nl):
            if i == 0:
                x = ed_expand(x, nl)
            else:
                x = jnp.concatenate(
                    [x, ed_expand(skips[nl - i], nl - i)], axis=-1)
            x = CNOBlock(dec_out[i], dec_sizes[i], dec_sizes[i + 1],
                         self.use_bn, self.ndim)(x, deterministic)

        x = jnp.concatenate([x, ed_expand(skips[0], 0)], axis=-1)
        return LiftProjectBlock(self.out_dim, self.size, ndim=self.ndim)(
            x, deterministic)


class CNO1d(nn.Module):
    """Input (B, C, X) with X == size -> (B, C_out, X)."""

    in_dim: int
    out_dim: int
    size: int
    N_layers: int = 3
    N_res: int = 4
    N_res_neck: int = 4
    channel_multiplier: int = 16
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.shape[-1] != self.size:
            raise ValueError(
                f"CNO1d was built for size {self.size}, got {x.shape[-1]}; "
                "resize inputs (the reference's 'resize' training strategy)")
        x = jnp.swapaxes(x, -1, -2)
        x = _CNO(self.in_dim, self.out_dim, self.size, self.N_layers,
                 self.N_res, self.N_res_neck, self.channel_multiplier,
                 self.use_bn, ndim=1)(x, deterministic)
        return jnp.swapaxes(x, -1, -2)


class CNO2d(nn.Module):
    """Input (B, C, H, W) with H == W == size -> (B, C_out, H, W)."""

    in_dim: int
    out_dim: int
    size: int
    N_layers: int = 3
    N_res: int = 4
    N_res_neck: int = 4
    channel_multiplier: int = 16
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.shape[-1] != self.size or x.shape[-2] != self.size:
            raise ValueError(
                f"CNO2d was built for size {self.size}, got "
                f"{x.shape[-2:]}; resize inputs first")
        x = jnp.moveaxis(x, 1, -1)
        x = _CNO(self.in_dim, self.out_dim, self.size, self.N_layers,
                 self.N_res, self.N_res_neck, self.channel_multiplier,
                 self.use_bn, ndim=2)(x, deterministic)
        return jnp.moveaxis(x, -1, 1)
