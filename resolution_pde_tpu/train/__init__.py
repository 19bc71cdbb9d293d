"""Training harness: jitted train/eval steps (one compiled program per
resolution bucket), torch-semantics LR schedules, Orbax checkpointing.
"""

from resolution_pde_tpu.train.schedules import (
    cosine_annealing_lr,
    step_lr,
    ReduceLROnPlateau,
)
from resolution_pde_tpu.train.trainer import Trainer, TrainState

__all__ = [
    "cosine_annealing_lr",
    "step_lr",
    "ReduceLROnPlateau",
    "Trainer",
    "TrainState",
]
