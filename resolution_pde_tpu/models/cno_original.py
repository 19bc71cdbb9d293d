"""CNO 2D "original" version: Convolutional Neural Operator with explicitly
designed low-pass filters (alias-free resampling), the camlab-ethz CNO.

The reference config conf/model/cno_2d/cno_2d_original.yaml:1-16 targets
`CNO.CNO2d_original_version.CNOModule.CNO` with filter parameters
(cutoff_den, filter_size, lrelu_upsampling, half_width_mult, radial), but
the `CNO/` directory in the snapshot is EMPTY — this module reimplements the
model from the config surface (SURVEY.md §2.3) on the vanilla-CNO skeleton
(models/CNO1d.py architecture) with windowed-sinc filtered activations
(ops/filters.py) in place of torch bicubic antialiasing, and filtered
resampling for the up/down blocks.

radial=True selects the radially-symmetric jinc filter
(ops/filters.py design_lowpass_filter_2d_radial); the shipped config uses
radial: False (separable windowed-sinc).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.ops.filters import (
    downsample_2d,
    filtered_lrelu_2d,
    upsample_2d,
)


class _FilteredAct(nn.Module):
    """Filtered LReLU with optional net resampling in_size -> out_size.

    Supports out_size == in_size, in_size/2, or 2*in_size (the only ratios
    the CNO encoder/decoder uses)."""

    in_size: int
    out_size: int
    lrelu_upsampling: int = 2
    cutoff_den: float = 2.0001
    filter_size: int = 6
    half_width_mult: float = 0.8
    radial: bool = False

    @nn.compact
    def __call__(self, x):
        """x channels-last (B, H, W, C)."""
        kw = dict(cutoff_den=self.cutoff_den, filter_size=self.filter_size,
                  half_width_mult=self.half_width_mult, radial=self.radial)
        u = self.lrelu_upsampling
        xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
        if self.out_size == self.in_size:
            xc = filtered_lrelu_2d(xc, up_factor=u, **kw)
        elif self.out_size == self.in_size // 2:
            xc = filtered_lrelu_2d(xc, up_factor=u, out_factor=2 * u, **kw)
        elif self.out_size == 2 * self.in_size:
            xc = upsample_2d(xc, 2 * u, **kw)
            xc = jnp.where(xc >= 0, xc, 0.01 * xc)
            xc = downsample_2d(xc, u, **kw)
        else:
            raise ValueError(
                f"unsupported resample {self.in_size}->{self.out_size}")
        return jnp.moveaxis(xc, 1, -1)


class _Block(nn.Module):
    out_channels: int
    in_size: int
    out_size: int
    use_bn: bool = True
    lrelu_upsampling: int = 2
    cutoff_den: float = 2.0001
    filter_size: int = 6
    half_width_mult: float = 0.8
    radial: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME")(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5)(x)
        return _FilteredAct(self.in_size, self.out_size,
                            self.lrelu_upsampling, self.cutoff_den,
                            self.filter_size, self.half_width_mult,
                            self.radial)(x)


class _LiftProject(nn.Module):
    """Lift / projection head: conv -> filtered act -> conv, with NO
    BatchNorm and NO output activation (cno_2d_original.yaml:16-17: "We do
    not add BN in lifting/projection layer", latent_lift_proj_dim is the
    intermediate width). The projection being activation-free matters: a
    signed-output regression head ending in a LReLU can only reach
    negative targets scaled by the leak (observed live as an NS training
    stall at rel-L2 ~0.70 = predicting the mean)."""

    out_channels: int
    latent_dim: int
    size: int
    lrelu_upsampling: int = 2
    cutoff_den: float = 2.0001
    filter_size: int = 6
    half_width_mult: float = 0.8
    radial: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.latent_dim, (3, 3), padding="SAME")(x)
        x = _FilteredAct(self.size, self.size, self.lrelu_upsampling,
                         self.cutoff_den, self.filter_size,
                         self.half_width_mult, self.radial)(x)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(x)


class _ResBlock(nn.Module):
    channels: int
    size: int
    use_bn: bool = True
    lrelu_upsampling: int = 2
    cutoff_den: float = 2.0001
    filter_size: int = 6
    half_width_mult: float = 0.8
    radial: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out = _Block(self.channels, self.size, self.size, self.use_bn,
                     self.lrelu_upsampling, self.cutoff_den,
                     self.filter_size, self.half_width_mult, self.radial)(
            x, deterministic)
        out = nn.Conv(self.channels, (3, 3), padding="SAME")(out)
        if self.use_bn:
            out = nn.BatchNorm(use_running_average=deterministic,
                               momentum=0.9, epsilon=1e-5)(out)
        return x + out


class CNO2dOriginal(nn.Module):
    """Filtered CNO. Input (B, C, H, W) with H == W == size."""

    in_dim: int
    out_dim: int
    size: int
    N_layers: int = 3
    N_res: int = 4
    N_res_neck: int = 4
    channel_multiplier: int = 16
    use_bn: bool = True
    cutoff_den: float = 2.0001
    filter_size: int = 6
    lrelu_upsampling: int = 2
    half_width_mult: float = 0.8
    radial: bool = False
    latent_lift_proj_dim: int = 64  # lift/projection intermediate width

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if x.shape[-1] != self.size or x.shape[-2] != self.size:
            raise ValueError(
                f"CNO2dOriginal built for size {self.size}, got "
                f"{x.shape[-2:]}")
        fkw = dict(use_bn=self.use_bn,
                   lrelu_upsampling=self.lrelu_upsampling,
                   cutoff_den=self.cutoff_den, filter_size=self.filter_size,
                   half_width_mult=self.half_width_mult, radial=self.radial)
        nl = self.N_layers
        lift_dim = self.channel_multiplier // 2
        enc_feats = [lift_dim] + [2 ** i * self.channel_multiplier
                                  for i in range(nl)]
        dec_out = list(reversed(enc_feats[:-1]))
        enc_sizes = [self.size // 2 ** i for i in range(nl + 1)]
        dec_sizes = [self.size // 2 ** (nl - i) for i in range(nl + 1)]

        pkw = {k: v for k, v in fkw.items() if k != "use_bn"}
        x = jnp.moveaxis(x, 1, -1)
        x = _LiftProject(enc_feats[0], self.latent_lift_proj_dim,
                         self.size, **pkw)(x)

        skips = []
        for i in range(nl):
            y = x
            for _ in range(self.N_res):
                y = _ResBlock(enc_feats[i], enc_sizes[i], **fkw)(
                    y, deterministic)
            skips.append(y)
            x = _Block(enc_feats[i + 1], enc_sizes[i], enc_sizes[i + 1],
                       **fkw)(x, deterministic)

        for _ in range(self.N_res_neck):
            x = _ResBlock(enc_feats[nl], enc_sizes[nl], **fkw)(
                x, deterministic)

        def ed_expand(z, level):
            return _Block(enc_feats[level], enc_sizes[level],
                          dec_sizes[nl - level], **fkw)(z, deterministic)

        for i in range(nl):
            if i == 0:
                x = ed_expand(x, nl)
            else:
                x = jnp.concatenate(
                    [x, ed_expand(skips[nl - i], nl - i)], axis=-1)
            x = _Block(dec_out[i], dec_sizes[i], dec_sizes[i + 1], **fkw)(
                x, deterministic)

        x = jnp.concatenate([x, ed_expand(skips[0], 0)], axis=-1)
        x = _LiftProject(self.out_dim, self.latent_lift_proj_dim,
                         self.size, **pkw)(x)
        return jnp.moveaxis(x, -1, 1)
