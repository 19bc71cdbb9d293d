"""GNOT graph-dataset surface (gated).

Parity target: dataloaders/dgl_data.py:9-147 (FNODataset building DGL
graphs) and dataloaders/sequential_dataset.py:4 (SequentialDataSet ABC).
The reference gates these behind `dgl`/`networkx`/`sklearn` imports and no
shipped config uses them; this module provides the same gated surface plus
the array-level preprocessing that does not need dgl.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np


class SequentialDataSet(ABC):
    """Sequence-dataset ABC (sequential_dataset.py:4-12)."""

    @abstractmethod
    def __len__(self):
        ...

    @abstractmethod
    def __getitem__(self, idx):
        ...


def grid_to_point_cloud(u: np.ndarray):
    """(n, h, w[, c]) fields -> (n, h*w, c) node features + (h*w, 2)
    normalized positions — the dgl-free half of FNODataset's graph
    construction (dgl_data.py:33-120)."""
    if u.ndim == 3:
        u = u[..., None]
    n, h, w, c = u.shape
    feats = u.reshape(n, h * w, c).astype(np.float32)
    ys, xs = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    pos = np.stack([ys.ravel(), xs.ravel()], axis=-1).astype(np.float32)
    return feats, pos


def build_dgl_graph_dataset(*args, **kwargs):
    """Reference FNODataset equivalent; requires the optional dgl stack."""
    try:
        import dgl  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "dgl is not installed (it is optional in the reference too, "
            "dgl_data.py:9-14); use grid_to_point_cloud + MoEGPTNO for the "
            "point-cloud operator path without graph libraries") from e
    raise NotImplementedError(
        "dgl present but graph construction not implemented; the MoEGPT "
        "path in this framework is point-cloud based")
