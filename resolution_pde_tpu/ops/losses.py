"""Loss functions.

Parity target: utils/loss.py:17-60 in the reference (RelativeL2Loss).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def relative_l2(pred, target, reduction: str | None = "mean", eps: float = _EPS,
                weights=None):
    """Per-sample relative L2 error ``||pred - target||_2 / (||target||_2 + eps)``.

    Both inputs are flattened per sample (leading axis = batch). Matches the
    reference semantics (utils/loss.py:42-59): reduction 'mean' averages the
    per-sample relative errors, 'sum' sums them, None returns the vector.

    weights: optional (B,) per-sample weights; with reduction='mean' the
    result is sum(w*rel)/sum(w) — used to mask padding rows when straggler
    batches are padded to the data-axis multiple (parallel/mesh.py).

    Accumulation is done in float32 regardless of input dtype so bfloat16
    activations do not degrade the metric.
    """
    pred = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    target = target.reshape(target.shape[0], -1).astype(jnp.float32)
    diff_norms = jnp.linalg.norm(pred - target, ord=2, axis=1)
    target_norms = jnp.linalg.norm(target, ord=2, axis=1)
    rel = diff_norms / (target_norms + eps)
    if weights is not None:
        w = weights.astype(jnp.float32)
        if reduction == "mean":
            return jnp.sum(rel * w) / jnp.maximum(jnp.sum(w), 1.0)
        if reduction == "sum":
            return jnp.sum(rel * w)
        rel = rel * w
    if reduction == "mean":
        return jnp.mean(rel)
    if reduction == "sum":
        return jnp.sum(rel)
    if reduction is None or reduction == "none":
        return rel
    raise ValueError(f"unknown reduction {reduction!r}")
