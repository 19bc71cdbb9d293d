"""File-format readers for the PDE datasets the reference consumes.

Formats (with reference citations):
  - KS HDF5: split groups 'train'/'valid'/'test' (or a single group), main
    key contains 'pde' and '-' (e.g. 'pde_128-256'), optional 't', 'x',
    'dx', 'dt' (dataloaders/ks_naive_markov.py:190-252). Data (b, t, s).
  - PDEBench Burgers HDF5: key 'tensor' (n, t, x) + 'x-coordinate'
    (dataloaders/burger_naive_markov.py:144, 170).
  - Navier-Stokes: .h5 key 'u' (b, t, h, w) with (b, h, w, t) transpose
    heuristic, or .mat key 'u' (b, h, w, t)
    (dataloaders/ns_naive_markov.py:276-315).
  - FNO-paper .mat: Burgers 'a'/'u', Darcy 'coeff'/'sol'
    (dataloaders/load_data.py:91-101).
  - Darcy HDF5: 'nu' (coefficient) -> 'tensor' (solution)
    (dataloaders/darcy_loader.py:40-52).
  - The-Well active matter HDF5 (dataloaders/active_matter_markov.py).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import h5py


def _ks_group(f: h5py.File, split: str):
    if split in f:
        return f[split]
    keys = list(f.keys())
    if len(keys) == 1:
        return f[keys[0]]
    for key in keys:
        if key.lower() in ("data", "pde", "train") or "pde" in key.lower():
            return f[key]
    raise ValueError(f"could not find split {split!r}; available: {keys}")


def _ks_pde_key(group) -> str:
    for key in group.keys():
        if "pde" in key.lower() and "-" in key:
            return key
    raise ValueError(f"no PDE data key in {list(group.keys())}")


def split_from_filename(filename: str) -> str:
    low = filename.lower()
    for split in ("train", "valid", "test"):
        if split in low:
            return split
    return "train"


def read_ks_h5(path: str, split: Optional[str] = None) -> dict:
    """Returns {'u': (b, t, s), 'x': coords or None, 't': times or None}."""
    if split is None:
        split = split_from_filename(os.path.basename(path))
    with h5py.File(path, "r") as f:
        group = _ks_group(f, split)
        u = np.array(group[_ks_pde_key(group)], dtype=np.float32)
        out = {"u": u, "x": None, "t": None}
        if "x" in group:
            x = np.array(group["x"], dtype=np.float32)
            out["x"] = x[0] if x.ndim == 2 else x
        if "t" in group:
            out["t"] = np.array(group["t"], dtype=np.float32)
    return out


def read_pdebench_h5(path: str) -> dict:
    """Returns {'u': (n, t, x), 'x': grid or None}."""
    with h5py.File(path, "r") as f:
        u = np.array(f["tensor"], dtype=np.float32)
        grid = (np.array(f["x-coordinate"], dtype=np.float32)
                if "x-coordinate" in f else None)
    return {"u": u, "x": grid}


def read_ns(path: str) -> np.ndarray:
    """Returns vorticity (b, t, h, w)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".mat":
        u = _load_mat(path, "u")
        return np.transpose(u, (0, 3, 1, 2)).astype(np.float32)
    with h5py.File(path, "r") as f:
        if "u" not in f:
            raise KeyError(f"'u' not found in {path}; keys: {list(f.keys())}")
        u = np.array(f["u"], dtype=np.float32)
    if u.ndim != 4:
        raise ValueError(f"expected 4D NS data, got {u.shape}")
    # (b, h, w, t) heuristic: small trailing time axis
    if u.shape[-1] < 100 and u.shape[-1] < min(u.shape[1], u.shape[2]):
        u = np.transpose(u, (0, 3, 1, 2))
    return u


def read_darcy_h5(path: str) -> dict:
    """Steady-state Darcy: input coefficient 'nu', solution 'tensor'."""
    with h5py.File(path, "r") as f:
        nu = np.array(f["nu"], dtype=np.float32)
        sol = np.array(f["tensor"], dtype=np.float32)
    if sol.ndim == 4 and sol.shape[1] == 1:  # (n, 1, h, w) -> (n, h, w)
        sol = sol[:, 0]
    return {"a": nu, "u": sol}


def _load_mat(path: str, key: str) -> np.ndarray:
    """Load a variable from a .mat file (v7 via scipy, v7.3 via h5py)."""
    try:
        from scipy.io import loadmat

        mat = loadmat(path)
        if key not in mat:
            raise KeyError(
                f"{key!r} not in {path}; keys: "
                f"{[k for k in mat if not k.startswith('__')]}"
            )
        return np.array(mat[key], dtype=np.float32)
    except NotImplementedError:
        # MATLAB v7.3 files are HDF5; note transposed (column-major) layout.
        with h5py.File(path, "r") as f:
            arr = np.array(f[key], dtype=np.float32)
        return arr.T


def read_fno_burgers_mat(path: str) -> dict:
    """FNO-paper Burgers: 'a' initial condition -> 'u' solution at t=1."""
    return {"a": _load_mat(path, "a"), "u": _load_mat(path, "u")}


def read_fno_darcy_mat(path: str) -> dict:
    """FNO-paper Darcy: 'coeff' -> 'sol'."""
    return {"a": _load_mat(path, "coeff"), "u": _load_mat(path, "sol")}


def read_active_matter_h5(path: str, fields=("concentration",)) -> np.ndarray:
    """The-Well-style active matter: stacks requested scalar fields from
    't0_fields' (or falls back to top-level datasets) into channels.

    Returns (b, t, h, w, c).
    """
    with h5py.File(path, "r") as f:
        chans = []
        if "t0_fields" in f:
            grp = f["t0_fields"]
            for name in fields:
                if name in grp:
                    chans.append(np.array(grp[name], dtype=np.float32))
        else:
            for name in fields:
                if name in f:
                    chans.append(np.array(f[name], dtype=np.float32))
        if not chans:
            raise KeyError(f"none of {fields} found in {path}")
    return np.stack(chans, axis=-1)
