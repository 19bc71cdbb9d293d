"""Cross-cutting utilities: metrics logging (stdout/CSV/optional wandb),
plotting, profiling hooks."""

from resolution_pde_tpu.utils.metrics import MetricsLogger

__all__ = ["MetricsLogger"]
