"""CNO resize-based training: batches are antialias-resized to the model's
fixed training resolution inside the loop.

Parity target: train/interpolate_training.py:19-147 (cno_train /
cno_evaluate) — DEAD CODE in the reference (it imports the nonexistent
utils.utils, interpolate_training.py:14, so it cannot run); this is a
working implementation of the strategy it documents: bicubic-antialiased
resize of every batch to `train_size` before the forward pass.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

from resolution_pde_tpu.ops.interpolation import (
    bicubic_resize_1d,
    bicubic_resize_2d,
)

# jitted with the target size static: eager (unjitted) dispatch raises
# UNIMPLEMENTED on the axon TPU backend, and this runs per training batch
# (same scheme as data/transforms.py jit_resize_*; ADVICE r2)
_jit_resize_1d = jax.jit(bicubic_resize_1d, static_argnums=1)
_jit_resize_2d = jax.jit(bicubic_resize_2d, static_argnums=1)


def resize_batch_to(x, train_size: int, spatial_ndim: int):
    """Antialiased bicubic resize of (B, C, *spatial) to train_size."""
    if spatial_ndim == 1:
        if x.shape[-1] == train_size:
            return x
        return _jit_resize_1d(x, train_size)
    if x.shape[-1] == train_size and x.shape[-2] == train_size:
        return x
    return _jit_resize_2d(x, (train_size, train_size))


class ResizingLoader:
    """Wraps a loader, resizing every (x, y) batch to train_size — feed this
    to Trainer.fit for CNO resize training (interpolate_training.py:30-33
    semantics, working)."""

    def __init__(self, loader: Iterable, train_size: int,
                 spatial_ndim: int = 1):
        self.loader = loader
        self.train_size = train_size
        self.spatial_ndim = spatial_ndim

    def __iter__(self):
        for x, y in self.loader:
            yield (resize_batch_to(jnp.asarray(x), self.train_size,
                                   self.spatial_ndim),
                   resize_batch_to(jnp.asarray(y), self.train_size,
                                   self.spatial_ndim))

    def __len__(self):
        return len(self.loader)

    def set_epoch(self, epoch: int):
        """Delegate resume shuffle-phase alignment to the wrapped loader."""
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)


def cno_train(trainer, state, train_loader, val_loader, train_size: int,
              spatial_ndim: int = 1, **fit_kwargs):
    """Train with in-loop resizing (the working cno_train)."""
    return trainer.fit(
        state,
        ResizingLoader(train_loader, train_size, spatial_ndim),
        ResizingLoader(val_loader, train_size, spatial_ndim)
        if val_loader is not None else None,
        **fit_kwargs,
    )


def cno_evaluate(trainer, state, loader, train_size: int,
                 spatial_ndim: int = 1):
    """Evaluate with in-loop resizing (cno_evaluate role)."""
    return trainer.evaluate(
        state, ResizingLoader(loader, train_size, spatial_ndim))
