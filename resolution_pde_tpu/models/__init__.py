"""Neural-operator models (flax.linen).

Every model takes the reference's public layout at the boundary —
(B, C, X) for 1D, (B, C, H, W) for 2D — and computes channels-last
internally (the TPU-friendly layout: pointwise convs become MXU matmuls).

Registry mirrors the reference's hydra `_target_` dotted paths so configs
port directly.
"""

from resolution_pde_tpu.models.registry import (MODEL_REGISTRY, get_model,
                                                 unwrap_output)
from resolution_pde_tpu.models.fno import FNO1d, FNO2d
from resolution_pde_tpu.models.ffno import FFNO1D, FFNO2D

__all__ = [
    "unwrap_output",
    "MODEL_REGISTRY",
    "get_model",
    "FNO1d",
    "FNO2d",
    "FFNO1D",
    "FFNO2D",
]
