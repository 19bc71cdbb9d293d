"""Batched loaders.

Parity target: ResolutionGroupedDataLoader (train/mres_training.py:75-131)
— uniform-resolution batches drawn in shuffled order across resolutions.
The reference materializes every batch of the epoch up front
(mres_training.py:110-120); here the batch ORDER is materialized (cheap)
but batch tensors are sliced lazily, so memory stays O(dataset), not
O(dataset + epoch of copies).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from resolution_pde_tpu.data.dataset import ArrayDataset, MultiResDataset
from resolution_pde_tpu.data import native


class Loader:
    """Shuffling mini-batch iterator over an ArrayDataset. Re-iterable;
    each __iter__ re-draws the permutation (like torch DataLoader).

    The permutation is a pure function of (seed, epoch counter), not of a
    mutating RNG stream, so a resumed run can fast-forward the shuffle
    phase with set_epoch(epochs_done) and see exactly the batch order the
    uninterrupted run would have used (torch DistributedSampler-style)."""

    def __init__(self, dataset: ArrayDataset, batch_size: int,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Align the next __iter__'s permutation with epoch `epoch` of an
        uninterrupted run (mid-training resume, cli/common.maybe_resume)."""
        self._epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # background C++ producer ring when the native library is available
    # and the arrays qualify; plain per-batch gather otherwise
    use_pipeline = True

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        idx = rng.permutation(n) if self.shuffle else np.arange(n)
        stop = n - n % self.batch_size if self.drop_last else n
        x, y = self.dataset.x, self.dataset.y
        if (self.use_pipeline and native._load()
                and x.dtype == np.float32 and x.flags.c_contiguous
                and y.dtype == np.float32 and y.flags.c_contiguous):
            yield from native.BatchPipeline(x, y, idx[:stop],
                                            self.batch_size)
            return
        for i in range(0, stop, self.batch_size):
            sel = idx[i: i + self.batch_size]
            # multithreaded native gather when available (data/native.py)
            yield (native.gather(x, sel), native.gather(y, sel))


class ResolutionBucketedLoader:
    """Uniform-resolution batches from a MultiResDataset, batch order
    shuffled across buckets each epoch (mres_training.py:108-128)."""

    def __init__(self, dataset: MultiResDataset, batch_size: int,
                 shuffle: bool = True, seed: int = 0, drop_last: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """See Loader.set_epoch: resume-exact shuffle phase."""
        self._epoch = int(epoch)

    def __len__(self):
        total = 0
        for d in self.dataset.buckets.values():
            n = len(d)
            total += (n // self.batch_size if self.drop_last
                      else (n + self.batch_size - 1) // self.batch_size)
        return total

    def __iter__(self) -> Iterator:
        rng = np.random.default_rng((self.seed, self._epoch))
        self._epoch += 1
        plans = []  # (resolution, sample-index-array) per batch
        for res, d in self.dataset.buckets.items():
            n = len(d)
            idx = rng.permutation(n) if self.shuffle else np.arange(n)
            stop = n - n % self.batch_size if self.drop_last else n
            for i in range(0, stop, self.batch_size):
                plans.append((res, idx[i: i + self.batch_size]))
        if self.shuffle:
            order = rng.permutation(len(plans))
        else:
            order = np.arange(len(plans))
        for j in order:
            res, sel = plans[j]
            d = self.dataset.buckets[res]
            yield native.gather(d.x, sel), native.gather(d.y, sel)


def create_grouped_dataloaders(train_ds, val_ds, test_ds, batch_size: int,
                               seed: int = 0):
    """Reference factory parity (train/mres_training.py:146): grouped train
    loader shuffled, val/test deterministic."""
    return (
        ResolutionBucketedLoader(train_ds, batch_size, shuffle=True, seed=seed),
        ResolutionBucketedLoader(val_ds, batch_size, shuffle=False),
        ResolutionBucketedLoader(test_ds, batch_size, shuffle=False),
    )
