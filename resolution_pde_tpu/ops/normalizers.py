"""Data normalizers, registered as JAX pytrees so they can cross jit
boundaries and be stored in checkpoints.

Parity targets:
  - SimpleNormalizer: global scalar mean/std with eps=1e-8
    (reference dataloaders/ks_naive_markov.py:396-409).
  - UnitGaussianNormalizer: per-location mean/std with eps=1e-5
    (reference models/custom_layer.py:19-47).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class SimpleNormalizer:
    """Global scalar standardization: encode = (x - mean) / (std + eps)."""

    def __init__(self, mean, std, eps: float = 1e-8):
        self.mean = jnp.asarray(mean, dtype=jnp.float32)
        self.std = jnp.asarray(std, dtype=jnp.float32)
        self.eps = eps

    @classmethod
    def fit(cls, x, eps: float = 1e-8) -> "SimpleNormalizer":
        # ddof=1 matches torch.Tensor.std() used by the reference factories
        # (dataloaders/ks_naive_markov.py:389-392).
        x = jnp.asarray(x)
        return cls(jnp.mean(x), jnp.std(x, ddof=1), eps=eps)

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean

    def tree_flatten(self):
        return (self.mean, self.std), (self.eps,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        mean, std = children
        obj = cls.__new__(cls)
        obj.mean, obj.std = mean, std
        obj.eps = aux[0]
        return obj

    def __repr__(self):
        return f"SimpleNormalizer(mean={self.mean}, std={self.std}, eps={self.eps})"


@jax.tree_util.register_pytree_node_class
class UnitGaussianNormalizer:
    """Per-location standardization over the batch axis.

    ``fit`` computes mean/std over axis 0 (std with the same ddof=1 Bessel
    correction torch.std uses, reference models/custom_layer.py:23-24).
    """

    def __init__(self, mean, std, eps: float = 1e-5):
        self.mean = jnp.asarray(mean, dtype=jnp.float32)
        self.std = jnp.asarray(std, dtype=jnp.float32)
        self.eps = eps

    @classmethod
    def fit(cls, x, eps: float = 1e-5) -> "UnitGaussianNormalizer":
        x = jnp.asarray(x, dtype=jnp.float32)
        mean = jnp.mean(x, axis=0)
        std = jnp.std(x, axis=0, ddof=1)
        return cls(mean, std, eps=eps)

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean

    def at_resolution(self, spatial_shape) -> "UnitGaussianNormalizer":
        """Stats adapted to a different spatial grid, for cross-resolution
        evaluation (the per-location mean/std are grid samples of smooth
        fields). Downsampling by an integer factor strides — matching how
        naive eval data is reduced — otherwise bilinear-resizes. No-op
        (self) when the shape already matches. The reference cannot do
        this at all: its darcy family (the unit_gaussian user) predates
        the resolution sweep and evaluates at the train grid only."""
        spatial_shape = tuple(int(s) for s in spatial_shape)
        nsp = len(spatial_shape)
        if self.mean.ndim < nsp or self.mean.shape[-nsp:] == spatial_shape:
            return self
        cur = self.mean.shape[-nsp:]
        if all(c % t == 0 for c, t in zip(cur, spatial_shape)):
            idx = (Ellipsis,) + tuple(slice(None, None, c // t)
                                      for c, t in zip(cur, spatial_shape))
            return UnitGaussianNormalizer(self.mean[idx], self.std[idx],
                                          eps=self.eps)
        import jax

        shape = self.mean.shape[:-nsp] + spatial_shape
        return UnitGaussianNormalizer(
            jax.image.resize(self.mean, shape, "linear"),
            jax.image.resize(self.std, shape, "linear"), eps=self.eps)

    def tree_flatten(self):
        return (self.mean, self.std), (self.eps,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        mean, std = children
        obj = cls.__new__(cls)
        obj.mean, obj.std = mean, std
        obj.eps = aux[0]
        return obj

    def __repr__(self):
        return (
            f"UnitGaussianNormalizer(mean.shape={self.mean.shape}, "
            f"std.shape={self.std.shape}, eps={self.eps})"
        )


def minmax_denormalize(x, min_val, max_val):
    """Min-max denormalization (reference train/training.py:90-91)."""
    return x * (max_val - min_val) + min_val


def adapt_normalizer(norm, spatial_shape):
    """Adapt a normalizer to an eval grid: per-location (unit_gaussian)
    stats go through ``at_resolution``; scalar normalizers (Simple/MinMax)
    pass through unchanged. Shared by the super-res and rollout
    evaluators so cross-resolution handling cannot drift between them."""
    if norm is not None and hasattr(norm, "at_resolution"):
        return norm.at_resolution(spatial_shape)
    return norm
