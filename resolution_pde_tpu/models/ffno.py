"""FFNO 1D/2D: factorized Fourier Neural Operator with resolution-adaptive
mode slicing — one weight set serves every grid size.

Parity targets: models/ffno.py:25-237 and models/spectral_convolution.py:
108-318 in the reference. Residual structure: x = x + act(backcast_ff(
fourier(x))); per-axis ortho-norm FFT passes with effective_modes =
min(n_modes, available) weight slicing.

Note: reference FFNO1D assigns `self.use_grid = grid` (models/ffno.py:51),
so with its configs (grid=None) the 1D model never concatenates the grid
even though yaml sets use_grid: true. Here `use_grid` works as named; set it
False to reproduce the reference's effective 1D behavior (our shipped
configs do).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.models.layers import (
    ACTIVATIONS,
    FeedForward,
    WNDense,
    xavier_normal_init,
)
from resolution_pde_tpu.ops.grids import concat_grid_1d, concat_grid_2d
from resolution_pde_tpu.ops.spectral import (
    factorized_spectral_conv_1d,
    factorized_spectral_conv_2d,
    factorized_spectral_conv_2d_dft,
    factorized_spectral_conv_2d_dft_v2,
    factorized_spectral_conv_2d_dft_v3,
    factorized_spectral_conv_2d_dft_v4,
    factorized_spectral_conv_2d_dft_v5,
)


class FSpectralConv1d(nn.Module):
    """FFNO 1D layer: factorized spectral conv -> FeedForward -> activation.

    mode: 'full' (learned weights), 'low-pass' (truncate only), 'no-fourier'
    (skip the spectral pass) — spectral_convolution.py:145-156, 185-196.
    """

    d_model: int
    n_modes: int
    factor: int = 4
    ff_weight_norm: bool = False
    n_ff_layers: int = 2
    layer_norm: bool = False
    dropout: float = 0.0
    mode: str = "full"
    fft_norm: str = "ortho"
    activation: str = "identity"
    ff_impl: str = "dense"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, X, C) -> (B, X, C)."""
        if self.mode != "no-fourier":
            if self.mode == "full":
                w = self.param(
                    "fourier_weight",
                    xavier_normal_init,
                    (self.d_model, self.d_model, self.n_modes, 2),
                )
                x = factorized_spectral_conv_1d(x, w, self.n_modes, self.fft_norm)
            elif self.mode == "low-pass":
                n = x.shape[-2]
                m = min(self.n_modes, n // 2 + 1)
                xc = jnp.swapaxes(x, -1, -2)
                x_ft = jnp.fft.rfft(xc, axis=-1, norm=self.fft_norm)
                mask = jnp.arange(x_ft.shape[-1]) < m
                x_ft = jnp.where(mask, x_ft, 0.0)
                xc = jnp.fft.irfft(x_ft, n=n, axis=-1, norm=self.fft_norm)
                x = jnp.swapaxes(xc, -1, -2)
            else:
                raise ValueError(f"unknown mode {self.mode!r}")
        b = FeedForward(
            self.d_model,
            self.factor,
            self.n_ff_layers,
            self.ff_weight_norm,
            self.layer_norm,
            self.dropout,
            ff_impl=self.ff_impl,
        )(x, deterministic=deterministic)
        return ACTIVATIONS[self.activation](b)


class FSpectralConv2d(nn.Module):
    """FFNO 2D layer (spectral_convolution.py:210-318).

    compute_dtype: dtype for the feed-forward matmuls (e.g. bfloat16);
    the spectral path (FFT + mode contraction) always runs in float32 —
    XLA's TPU FFT is f32/c64 and the contraction accumulates in f32."""

    d_model: int
    n_modes: int
    factor: int = 4
    ff_weight_norm: bool = False
    n_ff_layers: int = 2
    layer_norm: bool = False
    dropout: float = 0.0
    mode: str = "full"
    compute_dtype: Any = None
    spectral_impl: str = "fft"  # 'fft' | 'dft' (truncated-DFT MXU matmuls)
    approx_gelu: bool = False   # tanh-approx GELU in the feed-forward
    ff_impl: str = "dense"      # 'dense' | 'fused' (Pallas, fused_ff.py)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, residual=None):
        """x: (B, H, W, C) -> (B, H, W, C). residual (optional) is added to
        the output — fused into the Pallas FF kernel when ff_impl='fused'
        (saves one HBM round-trip per layer)."""
        if self.mode != "no-fourier":
            if self.mode == "full":
                wy = self.param(
                    "fourier_weight_y",
                    xavier_normal_init,
                    (self.d_model, self.d_model, self.n_modes, 2),
                )
                wx = self.param(
                    "fourier_weight_x",
                    xavier_normal_init,
                    (self.d_model, self.d_model, self.n_modes, 2),
                )
                dt = x.dtype
                # bf16 training mode: feed the conv in bf16 directly — the
                # GEMMs cast to gemm_dtype anyway, and skipping the f32
                # round-trip saves one full-tensor HBM pass (measured ~15%
                # of the spectral stack on TPU). f32-exact path unchanged.
                xin = (x if self.compute_dtype is not None
                       else x.astype(jnp.float32))
                # the scope name rides into XLA op/fusion names (fwd AND
                # the vjp's transposed ops), letting a profiler trace
                # attribute device time to {specconv, ffstack} — the
                # bench's in-program step decomposition (probe13_trace.py)
                spec_scope = jax.named_scope("specconv")
                with spec_scope:
                    if self.spectral_impl == "dft":
                        x = factorized_spectral_conv_2d_dft(
                            xin, wy, wx, self.n_modes,
                            gemm_dtype=self.compute_dtype).astype(dt)
                    elif self.spectral_impl == "dft_v2":
                        x = factorized_spectral_conv_2d_dft_v2(
                            xin, wy, wx, self.n_modes,
                            gemm_dtype=self.compute_dtype).astype(dt)
                    elif self.spectral_impl in ("dft_v3", "dft_v3s"):
                        x = factorized_spectral_conv_2d_dft_v3(
                            xin, wy, wx, self.n_modes,
                            gemm_dtype=self.compute_dtype,
                            store_dtype=(self.compute_dtype
                                         if self.spectral_impl == "dft_v3s"
                                         else None)).astype(dt)
                    elif self.spectral_impl == "dft_v4":
                        x = factorized_spectral_conv_2d_dft_v4(
                            xin, wy, wx, self.n_modes,
                            gemm_dtype=self.compute_dtype).astype(dt)
                    elif self.spectral_impl in ("dft_v5", "dft_v5s"):
                        x = factorized_spectral_conv_2d_dft_v5(
                            xin, wy, wx, self.n_modes,
                            gemm_dtype=self.compute_dtype,
                            store_dtype=(self.compute_dtype
                                         if self.spectral_impl == "dft_v5s"
                                         else None)).astype(dt)
                    elif self.spectral_impl == "pallas2":
                        from resolution_pde_tpu.ops.pallas.spectral_mix2 import (
                            factorized_spectral_conv_2d_pallas2)
                        import jax as _jax

                        x = factorized_spectral_conv_2d_pallas2(
                            xin, wy, wx, self.n_modes,
                            compute_dtype=self.compute_dtype,
                            interpret=_jax.default_backend() not in
                            ("tpu", "axon")).astype(dt)
                    elif self.spectral_impl == "pallas":
                        from resolution_pde_tpu.ops.spectral import (
                            factorized_spectral_conv_2d_pallas)
                        import jax as _jax

                        x = factorized_spectral_conv_2d_pallas(
                            x.astype(jnp.float32), wy, wx, self.n_modes,
                            interpret=_jax.default_backend() not in
                            ("tpu", "axon")).astype(dt)
                    elif self.spectral_impl == "fft":
                        x = factorized_spectral_conv_2d(
                            x.astype(jnp.float32), wy, wx,
                            self.n_modes).astype(dt)
                    else:
                        raise ValueError(
                            f"unknown spectral_impl {self.spectral_impl!r}")
            else:
                raise ValueError(f"unsupported 2D mode {self.mode!r}")
        with jax.named_scope("ffstack"):
            return FeedForward(
                self.d_model,
                self.factor,
                self.n_ff_layers,
                self.ff_weight_norm,
                self.layer_norm,
                self.dropout,
                dtype=self.compute_dtype,
                approx_gelu=self.approx_gelu,
                ff_impl=self.ff_impl,
            )(x, deterministic=deterministic, residual=residual)


class FFNO1D(nn.Module):
    """1D FFNO. Input (B, C_in, X) -> (B, C_out, X). models/ffno.py:25-125."""

    in_channels: int
    out_channels: int
    width: int = 64
    n_layers: int = 4
    n_modes: int = 16
    factor: int = 4
    ff_weight_norm: bool = False
    n_ff_layers: int = 2
    layer_norm: bool = False
    dropout: float = 0.0
    mode: str = "full"
    fft_norm: str = "ortho"
    activation: str = "identity"
    use_grid: bool = False
    ff_impl: str = "dense"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jnp.swapaxes(x, -1, -2)  # (B, X, C)
        if self.use_grid:
            x = concat_grid_1d(x, 0.0, 1.0)
        x = WNDense(self.width, wnorm=self.ff_weight_norm)(x)
        for _ in range(self.n_layers):
            x_new = FSpectralConv1d(
                self.width,
                self.n_modes,
                self.factor,
                self.ff_weight_norm,
                self.n_ff_layers,
                self.layer_norm,
                self.dropout,
                self.mode,
                self.fft_norm,
                self.activation,
                self.ff_impl,
            )(x, deterministic=deterministic)
            x = x + x_new
        x = WNDense(self.out_channels, wnorm=self.ff_weight_norm)(x)
        return jnp.swapaxes(x, -1, -2)


class FFNO2D(nn.Module):
    """2D FFNO. Input (B, C_in, H, W) -> (B, C_out, H, W).

    models/ffno.py:131-237; grid concat is linspace(0,1) per axis, in/out
    projections use weight norm only when ff_weight_norm (ffno.py:158-162).
    """

    in_channels: int
    out_channels: int
    width: int = 64
    n_layers: int = 4
    n_modes: int = 16
    factor: int = 4
    ff_weight_norm: bool = False
    n_ff_layers: int = 2
    layer_norm: bool = False
    dropout: float = 0.0
    mode: str = "full"
    use_grid: bool = True
    remat: bool = False  # rematerialize layers (trade FLOPs for HBM)
    compute_dtype: Any = None  # e.g. jnp.bfloat16: activations + FF matmuls
    spectral_impl: str = "fft"  # 'fft' | 'dft' (truncated-DFT MXU path)
    approx_gelu: bool = False   # tanh-approx GELU in the feed-forwards
    ff_impl: str = "dense"      # 'dense' | 'fused' (Pallas fused FF)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_dtype = x.dtype
        x = jnp.moveaxis(x, 1, -1)  # (B, H, W, C)
        if self.use_grid:
            x = concat_grid_2d(x, 0.0, 1.0)
        x = WNDense(self.width, wnorm=self.ff_weight_norm,
                    dtype=self.compute_dtype)(x)
        layer_cls = (
            nn.remat(FSpectralConv2d, static_argnums=(2,))
            if self.remat
            else FSpectralConv2d
        )
        # FeedForward validates ff_impl; anything non-dense is a fused kernel
        fuse_res = self.ff_impl != "dense" and self.dropout == 0.0
        for _ in range(self.n_layers):
            layer = layer_cls(
                self.width,
                self.n_modes,
                self.factor,
                self.ff_weight_norm,
                self.n_ff_layers,
                self.layer_norm,
                self.dropout,
                self.mode,
                self.compute_dtype,
                self.spectral_impl,
                self.approx_gelu,
                self.ff_impl,
            )
            if fuse_res:
                # residual add fused into the Pallas FF kernel
                x = layer(x, deterministic, x)
            else:
                x = x + layer(x, deterministic)
        x = WNDense(self.out_channels, wnorm=self.ff_weight_norm,
                    dtype=self.compute_dtype)(x)
        return jnp.moveaxis(x, -1, 1).astype(in_dtype)
