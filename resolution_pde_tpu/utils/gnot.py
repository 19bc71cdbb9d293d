"""GNOT utilities.

Parity target: utils/gnot_utils.py:18-230 — MultipleTensors container,
weighted Lp losses, UnitTransformer / PointWiseUnitTransformer normalizers
(used by the GNOT/MoE-GPT point-cloud pipeline; unused by the reference's
configs but part of the inventory, SURVEY.md §2.5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class MultipleTensors:
    """Tuple-of-arrays container with indexing (gnot_utils.py:18)."""

    def __init__(self, xs):
        self.xs = tuple(xs)

    def __len__(self):
        return len(self.xs)

    def __getitem__(self, i):
        return self.xs[i]

    def __iter__(self):
        return iter(self.xs)


def weighted_lp_rel_loss(pred, target, p: int = 2, component: int = 0):
    """Per-sample relative Lp error on one output component, batch mean
    (gnot_utils.py:49 WeightedLpRelLoss semantics)."""
    x = pred[..., component].reshape(pred.shape[0], -1)
    y = target[..., component].reshape(target.shape[0], -1)
    diff = jnp.sum(jnp.abs(x - y) ** p, axis=1) ** (1.0 / p)
    norm = jnp.sum(jnp.abs(y) ** p, axis=1) ** (1.0 / p)
    return jnp.mean(diff / (norm + 1e-8))


def weighted_lp_loss(pred, target, p: int = 2, component: int = 0):
    """Absolute Lp counterpart (gnot_utils.py:102 WeightedLpLoss)."""
    x = pred[..., component].reshape(pred.shape[0], -1)
    y = target[..., component].reshape(target.shape[0], -1)
    diff = jnp.sum(jnp.abs(x - y) ** p, axis=1) ** (1.0 / p)
    return jnp.mean(diff)


@jax.tree_util.register_pytree_node_class
class UnitTransformer:
    """Column-wise standardization over (N*, d) point features
    (gnot_utils.py:176)."""

    def __init__(self, mean, std, eps: float = 1e-8):
        self.mean = jnp.asarray(mean)
        self.std = jnp.asarray(std)
        self.eps = eps

    @classmethod
    def fit(cls, x, eps: float = 1e-8):
        x2 = jnp.asarray(x).reshape(-1, x.shape[-1])
        return cls(jnp.mean(x2, axis=0), jnp.std(x2, axis=0), eps=eps)

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean

    def tree_flatten(self):
        return (self.mean, self.std), (self.eps,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.mean, obj.std = children
        obj.eps = aux[0]
        return obj


@jax.tree_util.register_pytree_node_class
class PointWiseUnitTransformer(UnitTransformer):
    """Per-point standardization over the batch axis (gnot_utils.py:206)."""

    @classmethod
    def fit(cls, x, eps: float = 1e-8):
        x = jnp.asarray(x)
        return cls(jnp.mean(x, axis=0), jnp.std(x, axis=0), eps=eps)
