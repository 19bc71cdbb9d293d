"""Writers for the dataset file formats the data layer reads — makes the
framework self-sufficient (the reference depends on externally generated
files).
"""

from __future__ import annotations

import os

import h5py
import numpy as np


def write_ks_file(path: str, u: np.ndarray, L: float = 64.0,
                  dt: float | None = None, split: str | None = None):
    """KS format (dataloaders/ks_naive_markov.py:190-252): split group with
    key 'pde_{nt}-{s}', plus x/t/dx/dt. u: (n, t, s)."""
    if split is None:
        name = os.path.basename(path).lower()
        split = ("train" if "train" in name
                 else "valid" if "valid" in name
                 else "test" if "test" in name else "train")
    n, t, s = u.shape
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        g = f.create_group(split)
        g.create_dataset(f"pde_{t}-{s}", data=u.astype(np.float32))
        g.create_dataset("x", data=np.linspace(0, L, s, endpoint=False)
                         .astype(np.float32))
        g.create_dataset("t", data=np.arange(t, dtype=np.float32)
                         * (dt if dt else 1.0))
        g.create_dataset("dx", data=np.float32(L / s))
        g.create_dataset("dt", data=np.float32(dt if dt else 1.0))


def write_ks_multires_tree(base_folder: str, data_by_res: dict,
                           viscosity: float = 0.075, L: float = 64.0,
                           lmax: int = 8, et: float = 5.0, nte: int = 51,
                           nt: int = 51, train_s: int = 2048,
                           split_counts=None, dt: float | None = None):
    """res_{R}/visc_{v}_L{L}_lmax{l}_et{e}_nte{n}_nt{n}/ tree
    (ks_naive_true_multires.py:255-261). Each res dir carries the THREE
    split files the eval swap reads (`ks_markov_dataset` with
    eval_saved_folder pointing at a res dir loads KS_train_*.h5 +
    KS_valid.h5 + KS_test.h5, ks_naive_markov.py:309): pass
    split_counts=(n_train, n_valid, n_test) to slice each res's
    trajectories contiguously (same boundaries as the naive files, so the
    held-out eval trajectories never appear in any train file). Without
    split_counts, everything goes into the train file (legacy layout)."""
    for res, u in data_by_res.items():
        d = os.path.join(
            base_folder, f"res_{res}",
            f"visc_{viscosity}_L{L}_lmax{lmax}_et{et}_nte{nte}_nt{nt}")
        os.makedirs(d, exist_ok=True)
        if split_counts is None:
            parts = {f"KS_train_{train_s}.h5": (u, "train")}
        else:
            n_tr, n_va, n_te = split_counts
            parts = {
                f"KS_train_{train_s}.h5": (u[:n_tr], "train"),
                "KS_valid.h5": (u[n_tr:n_tr + n_va], "valid"),
                "KS_test.h5": (u[n_tr + n_va:n_tr + n_va + n_te], "test"),
            }
        for fname, (part, split) in parts.items():
            write_ks_file(os.path.join(d, fname), part, L=L, dt=dt,
                          split=split)


def write_pdebench_file(path: str, u: np.ndarray):
    """PDEBench Burgers format: 'tensor' (n, t, x) + 'x-coordinate'."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("tensor", data=u.astype(np.float32))
        f.create_dataset(
            "x-coordinate",
            data=np.linspace(0, 1, u.shape[-1], endpoint=False)
            .astype(np.float32))


def write_ns_file(path: str, u: np.ndarray, a: np.ndarray | None = None,
                  t: np.ndarray | None = None):
    """NS format: 'u' (n, t, h, w) (+ optional 'a' initial vorticity, 't').

    Accepts the solver's (n, h, w, t) layout and transposes (the reader's
    heuristic handles either, ns_naive_markov.py:305-315; we store the
    canonical (n, t, h, w))."""
    if u.ndim == 4 and u.shape[-1] < min(u.shape[1], u.shape[2]):
        u = np.transpose(u, (0, 3, 1, 2))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("u", data=u.astype(np.float32))
        if a is not None:
            f.create_dataset("a", data=a.astype(np.float32))
        if t is not None:
            f.create_dataset("t", data=t.astype(np.float32))


def write_well_file(path: str, fields: dict):
    """The-Well-style layout (read_active_matter_h5, data/io.py:137): one
    group 't0_fields' holding each scalar field as (b, t, h, w)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        grp = f.create_group("t0_fields")
        for name, arr in fields.items():
            grp.create_dataset(name, data=np.asarray(arr, np.float32))


def write_darcy_file(path: str, a: np.ndarray, u: np.ndarray):
    """PDEBench DarcyFlow format the darcy factory reads
    (data/io.py read_darcy_h5): coefficient 'nu' (n, h, w), solution
    'tensor' (n, 1, h, w)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_dataset("nu", data=a.astype(np.float32))
        f.create_dataset("tensor", data=u.astype(np.float32)[:, None])
