"""Numerical kernels (L2 of the layer map): everything models and the harness
compute with. Pure functions over jnp arrays; Pallas variants are selected via
`resolution_pde_tpu.ops.dispatch`.
"""

from resolution_pde_tpu.ops.losses import relative_l2
from resolution_pde_tpu.ops.normalizers import (
    SimpleNormalizer,
    UnitGaussianNormalizer,
)
from resolution_pde_tpu.ops.spectral import (
    spectral_conv_1d,
    spectral_conv_2d,
    factorized_spectral_conv_1d,
    factorized_spectral_conv_2d,
)
from resolution_pde_tpu.ops.interpolation import (
    bicubic_resize_1d,
    bicubic_resize_2d,
    cno_lrelu_1d,
    cno_lrelu_2d,
)
from resolution_pde_tpu.ops.resize import (
    fft_downsample_1d,
    fft_downsample_2d,
    fft_resize_1d,
    fft_resize_2d,
    lowpass_filter_1d,
    lowpass_filter_2d,
)

__all__ = [
    "relative_l2",
    "SimpleNormalizer",
    "UnitGaussianNormalizer",
    "spectral_conv_1d",
    "spectral_conv_2d",
    "factorized_spectral_conv_1d",
    "factorized_spectral_conv_2d",
    "bicubic_resize_1d",
    "bicubic_resize_2d",
    "cno_lrelu_1d",
    "cno_lrelu_2d",
    "fft_downsample_1d",
    "fft_downsample_2d",
    "fft_resize_1d",
    "fft_resize_2d",
    "lowpass_filter_1d",
    "lowpass_filter_2d",
]
