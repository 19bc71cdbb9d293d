"""Plotting and numeric export.

Parity target: utils/plot_utils.py (pred-vs-target grids, per-resolution
comparison plots, frequency retention/energy plots), rollout plots
(utils/autoregressive_step.py:355), frequency analysis plots
(utils/frequency_analysis_plot.py), and the CSV numeric dumps that accompany
each figure. matplotlib is imported lazily with the Agg backend so headless
runs work.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _ensure_dir(path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    return path


def plot_1d_predictions(predictions, targets, inputs=None, save_path=None,
                        title: str = "prediction vs target",
                        max_examples: int = 4):
    """Grid of 1D prediction-vs-target line plots (plot_utils pattern).

    predictions/targets: (N, C, X) or (N, X)."""
    plt = _plt()
    preds = np.asarray(predictions)
    targs = np.asarray(targets)
    if preds.ndim == 3:
        preds, targs = preds[:, 0], targs[:, 0]
    n = min(max_examples, len(preds))
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3), squeeze=False)
    for i in range(n):
        ax = axes[0, i]
        ax.plot(targs[i], label="target", lw=1.5)
        ax.plot(preds[i], label="prediction", lw=1.0, ls="--")
        if inputs is not None:
            xi = np.asarray(inputs)
            ax.plot(xi[i, 0] if xi.ndim == 3 else xi[i], label="input",
                    lw=0.8, alpha=0.5)
        ax.set_title(f"example {i}")
        if i == 0:
            ax.legend(fontsize=7)
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(_ensure_dir(save_path), dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_2d_predictions(predictions, targets, save_path=None,
                        title: str = "prediction vs target",
                        max_examples: int = 3):
    """Rows of (target, prediction, |error|) heatmaps for 2D fields."""
    plt = _plt()
    preds = np.asarray(predictions)
    targs = np.asarray(targets)
    if preds.ndim == 4:
        preds, targs = preds[:, 0], targs[:, 0]
    n = min(max_examples, len(preds))
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for i in range(n):
        for j, (data, name) in enumerate(
                ((targs[i], "target"), (preds[i], "prediction"),
                 (np.abs(preds[i] - targs[i]), "|error|"))):
            im = axes[i, j].imshow(data, cmap="RdBu_r" if j < 2 else
                                   "magma")
            axes[i, j].set_title(name, fontsize=8)
            axes[i, j].axis("off")
            fig.colorbar(im, ax=axes[i, j], fraction=0.046)
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(_ensure_dir(save_path), dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_super_resolution(results: Dict[int, float], save_path=None,
                          title: str = "super-resolution rel-L2",
                          train_res: Optional[int] = None):
    """rel-L2 vs resolution curve (the per-resolution table as a figure)."""
    plt = _plt()
    res = sorted(results)
    vals = [results[r] for r in res]
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.plot(res, vals, "o-")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xlabel("resolution")
    ax.set_ylabel("relative L2")
    if train_res:
        ax.axvline(train_res, color="gray", ls=":", label="train res")
        ax.legend(fontsize=8)
    ax.set_title(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(_ensure_dir(save_path), dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_frequency_decomposition(error_per_mode, magnitude_per_mode,
                                 frequencies, save_path=None,
                                 title: str = "per-mode error"):
    """Error + solution magnitude vs frequency (frequency_analysis_plot)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.semilogy(frequencies, np.maximum(error_per_mode, 1e-12),
                label="error")
    ax.semilogy(frequencies, np.maximum(magnitude_per_mode, 1e-12),
                label="solution magnitude", alpha=0.7)
    ax.set_xlabel("frequency (cycles/sample)")
    ax.set_ylabel("L2 norm")
    ax.legend(fontsize=8)
    ax.set_title(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(_ensure_dir(save_path), dpi=120)
        plt.close(fig)
        return save_path
    return fig


def plot_rollout(trajectory, prediction, save_path=None,
                 title: str = "autoregressive rollout",
                 steps: Optional[Sequence[int]] = None):
    """1D rollout comparison: a few timesteps of truth vs prediction
    (autoregressive_step.py:355 pattern). trajectory (T, X), prediction
    (T, X)."""
    plt = _plt()
    traj = np.asarray(trajectory)
    pred = np.asarray(prediction)
    t = min(len(traj), len(pred))
    if steps is None:
        steps = sorted(set([0, t // 2, t - 1]))
    fig, axes = plt.subplots(1, len(steps), figsize=(4 * len(steps), 3),
                             squeeze=False)
    for i, s in enumerate(steps):
        axes[0, i].plot(traj[s], label="truth", lw=1.5)
        axes[0, i].plot(pred[s], label="prediction", lw=1.0, ls="--")
        axes[0, i].set_title(f"step {s}")
        if i == 0:
            axes[0, i].legend(fontsize=7)
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(_ensure_dir(save_path), dpi=120)
        plt.close(fig)
        return save_path
    return fig


def save_results_csv(results: Dict, path: str, columns=("key", "value")):
    """Numeric dump companion (plot_utils.py:234 / rollout CSV pattern)."""
    _ensure_dir(path)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(columns)
        for k in sorted(results):
            w.writerow([k, results[k]])
    return path
