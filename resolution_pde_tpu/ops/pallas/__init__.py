"""Pallas TPU kernels for the hot ops.

- spectral_mix: fused truncated-DFT -> channel mix -> inverse-DFT for the
  factorized spectral conv (the FFNO hot path). The XLA paths materialize
  the truncated spectrum in HBM between the three GEMMs; this kernel keeps
  it in VMEM per row tile.
- vandermonde: fused S4D kernel materialization 2*Re[C (e^{dtA}-1)/A
  e^{dtA l}] with on-chip accumulation over the state dimension (the TPU
  replacement for the reference's CUDA/pykeops kernels,
  models/s4.py:46-149).

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from resolution_pde_tpu.ops.pallas.spectral_mix import (
    truncated_spectral_mix_1d,
)
from resolution_pde_tpu.ops.pallas.vandermonde import s4d_kernel_pallas

__all__ = ["truncated_spectral_mix_1d", "s4d_kernel_pallas"]
