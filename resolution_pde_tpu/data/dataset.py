"""In-memory datasets and normalizer fitting.

Parity targets:
  - NormalizedDataset wrapping + SimpleNormalizer fit on TRAIN split stats
    (ks_naive_markov.py:374-435): x stats from train x, y stats from train y.
  - minmax branch (burger_resize_markov.py:215-243): min/max of train x
    ("data") and train y ("model"); encode maps to [0, 1].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np

from resolution_pde_tpu.ops.normalizers import (
    SimpleNormalizer,
    UnitGaussianNormalizer,
)


@dataclass
class ArrayDataset:
    """Markov-pair dataset: x (N, C, *spatial), y (N, C, *spatial)."""

    x: np.ndarray
    y: np.ndarray

    def __post_init__(self):
        assert len(self.x) == len(self.y), "invalid input/output pairs"

    def __len__(self):
        return len(self.x)

    def __getitem__(self, idx):
        return self.x[idx], self.y[idx]

    @property
    def resolution(self) -> int:
        return self.x.shape[-1]

    def encoded(self, x_normalizer, y_normalizer) -> "ArrayDataset":
        """Eagerly normalized copy (reference NormalizedDataset applies
        encode per __getitem__; eager is equivalent and batch-friendly)."""
        return ArrayDataset(
            np.asarray(x_normalizer.encode(self.x), dtype=np.float32),
            np.asarray(y_normalizer.encode(self.y), dtype=np.float32),
        )


@dataclass
class TrajectoryDataset:
    """Full trajectories for rollout evaluation: u (N, T, *spatial)."""

    u: np.ndarray

    def __len__(self):
        return len(self.u)

    def __getitem__(self, idx):
        return self.u[idx]

    @property
    def resolution(self) -> int:
        return self.u.shape[-1]


class MultiResTrajectoryDataset:
    """Per-resolution rollout trajectories {resolution: TrajectoryDataset},
    extracted from the per-resolution FILES of a true-multires dataset
    (the reference's extract_ks_test_trajectories_for_rollout,
    ks_naive_true_multires.py:32-172, keeps a mixed-resolution trajectory
    pool; we keep it bucketed so each resolution's rollout evaluates on
    trajectories STORED at that resolution rather than reductions).

    `u` exposes the base (highest) resolution bucket for consumers that
    expect a single TrajectoryDataset."""

    def __init__(self, buckets: Dict[int, "TrajectoryDataset"],
                 base_res: int | None = None):
        if not buckets:
            raise ValueError("empty trajectory buckets")
        self.buckets = dict(buckets)
        self.base_res = base_res if base_res in self.buckets else max(
            self.buckets)

    @property
    def u(self) -> np.ndarray:
        return self.buckets[self.base_res].u

    def at(self, resolution: int):
        """TrajectoryDataset stored at `resolution`, or None."""
        return self.buckets.get(resolution)

    def resolutions(self):
        return sorted(self.buckets)

    def __len__(self):
        return sum(len(d) for d in self.buckets.values())


class MultiResDataset:
    """Variable-resolution dataset as {resolution: ArrayDataset} buckets.

    Reproduces the contract of KSTrueMultiResMarkovDataset +
    ResolutionGroupedDataLoader (train/mres_training.py:75-131): samples
    live at several spatial resolutions; batches must be uniform-resolution.
    Keeping buckets explicit (instead of list-of-variable-shapes) feeds
    static-shape compiled train steps directly.
    """

    def __init__(self, buckets: Dict[int, ArrayDataset]):
        self.buckets = dict(sorted(buckets.items()))

    def __len__(self):
        return sum(len(d) for d in self.buckets.values())

    @property
    def resolutions(self):
        return list(self.buckets)

    def encoded(self, x_normalizer, y_normalizer) -> "MultiResDataset":
        return MultiResDataset(
            {r: d.encoded(x_normalizer, y_normalizer)
             for r, d in self.buckets.items()}
        )


def fit_normalizers(train_x: np.ndarray, train_y: np.ndarray,
                    normalization_type: str = "simple"):
    """Fit normalizers on the train split.

    Returns a dict:
      'simple'        -> {x_normalizer, y_normalizer} (global scalar stats)
      'unit_gaussian' -> same keys, per-location stats
      'minmax'        -> {min_data, max_data, min_model, max_model}
    """
    if normalization_type == "simple":
        return {
            "x_normalizer": SimpleNormalizer.fit(train_x),
            "y_normalizer": SimpleNormalizer.fit(train_y),
        }
    if normalization_type == "unit_gaussian":
        return {
            "x_normalizer": UnitGaussianNormalizer.fit(train_x),
            "y_normalizer": UnitGaussianNormalizer.fit(train_y),
        }
    if normalization_type == "minmax":
        return {
            "min_data": float(train_x.min()),
            "max_data": float(train_x.max()),
            "min_model": float(train_y.min()),
            "max_model": float(train_y.max()),
        }
    raise ValueError(f"unknown normalization_type {normalization_type!r}")


@jax.tree_util.register_pytree_node_class
class MinMaxNormalizer:
    """encode: (x - min) / (max - min); decode is train/training.py:90-91.

    Registered as a pytree (like ops/normalizers.py) so the trainer can
    pass it straight into the jitted train/eval step as the y_normalizer.
    """

    def __init__(self, min_val: float, max_val: float):
        self.min = min_val
        self.max = max_val

    def encode(self, x):
        return (x - self.min) / (self.max - self.min)

    def decode(self, x):
        return x * (self.max - self.min) + self.min

    def tree_flatten(self):
        return (self.min, self.max), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
