"""Evaluation harness: super-resolution sweeps, autoregressive rollout,
per-Fourier-mode error decomposition.
"""

from resolution_pde_tpu.evaluation.superres import (
    get_lower_resolutions,
    evaluate_all_resolutions,
)
from resolution_pde_tpu.evaluation.rollout import (
    perform_rollout,
    evaluate_rollout_all_resolutions,
)
from resolution_pde_tpu.evaluation.frequency import (
    decompose_error_by_frequency_1d,
    decompose_error_by_frequency_2d,
)

__all__ = [
    "get_lower_resolutions",
    "evaluate_all_resolutions",
    "perform_rollout",
    "evaluate_rollout_all_resolutions",
    "decompose_error_by_frequency_1d",
    "decompose_error_by_frequency_2d",
]
