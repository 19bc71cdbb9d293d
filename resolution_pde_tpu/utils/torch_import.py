"""Import PyTorch reference checkpoints into our flax parameter trees.

Parity target: the reference saves `torch.save({'model_state_dict': ...})`
checkpoints (main_1d.py:197-203) that its eval drivers reload
(autoregressive_eval.py:121-122, utils/multiresolution_analysis.py:67-73).
This module converts those state_dicts to our parameter trees so reference
checkpoints can be evaluated — and parity-checked — in this framework
(golden-value forward parity of the conversions is pinned by
tests/test_reference_parity.py).

Supported architectures: FNO1d, FNO2d, FFNO1D, FFNO2D (the BASELINE.json
configs). Input: a state_dict-like mapping of numpy arrays (call
`load_torch_state_dict` to read a .pt file when torch is available).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint (.pt) into numpy arrays. Accepts either
    a raw state_dict or the reference's {'model_state_dict': ...} dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: np.array(v.detach().numpy(), copy=True)
            for k, v in sd.items()}


def _lin(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """torch Linear (out, in) -> flax TorchLinear {kernel (in, out), bias}."""
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv1x1(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """torch ConvNd 1x1 (out, in, 1[, 1]) -> flax Dense kernel."""
    w = sd[f"{prefix}.weight"]
    w = w.reshape(w.shape[0], w.shape[1])  # drop spatial 1s
    out = {"kernel": np.ascontiguousarray(w.T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _complex_pair(w: np.ndarray) -> np.ndarray:
    """complex array -> trailing (re, im) real storage."""
    if np.iscomplexobj(w):
        return np.stack([w.real, w.imag], axis=-1).astype(np.float32)
    return w.astype(np.float32)


def import_fno1d(sd: Mapping[str, np.ndarray], n_blocks: int = 4) -> dict:
    """Reference models.fno.FNO1d state_dict -> our FNO1d params."""
    p: dict = {"TorchLinear_0": _conv1x1(sd, "lifting")}
    for i in range(n_blocks):
        base = f"fno_blocks.{i}"
        p[f"FNOBlock1d_{i}"] = {
            "SpectralConv1dLayer_0": {
                "weights1": _complex_pair(sd[f"{base}.spectral_conv.weights1"]),
            },
            "TorchLinear_0": _conv1x1(sd, f"{base}.bypass_conv"),
        }
    p["PointwiseMLP_0"] = {
        "TorchLinear_0": _conv1x1(sd, "projection.mlp1"),
        "TorchLinear_1": _conv1x1(sd, "projection.mlp2"),
    }
    return p


def import_fno2d(sd: Mapping[str, np.ndarray], n_blocks: int = 4) -> dict:
    p: dict = {"TorchLinear_0": _conv1x1(sd, "lifting")}
    for i in range(n_blocks):
        base = f"fno_blocks.{i}"
        p[f"FNOBlock2d_{i}"] = {
            "SpectralConv2dLayer_0": {
                "weights1": _complex_pair(sd[f"{base}.spectral_conv.weights1"]),
                "weights2": _complex_pair(sd[f"{base}.spectral_conv.weights2"]),
            },
            "TorchLinear_0": _conv1x1(sd, f"{base}.bypass_conv"),
        }
    p["PointwiseMLP_0"] = {
        "TorchLinear_0": _conv1x1(sd, "projection.mlp1"),
        "TorchLinear_1": _conv1x1(sd, "projection.mlp2"),
    }
    return p


def _wn_dense(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """WNLinear: plain Linear or weight-normed (weight_g/weight_v) -> our
    WNDense param layout."""
    if f"{prefix}.weight_v" in sd or f"{prefix}.parametrizations.weight.original1" in sd:
        # torch weight_norm: old API (weight_g/weight_v) or parametrize API
        if f"{prefix}.weight_v" in sd:
            v = sd[f"{prefix}.weight_v"]
            g = sd[f"{prefix}.weight_g"]
        else:
            g = sd[f"{prefix}.parametrizations.weight.original0"]
            v = sd[f"{prefix}.parametrizations.weight.original1"]
        out = {"v": np.ascontiguousarray(v.T),
               "g": g.reshape(-1)}
        if f"{prefix}.bias" in sd:
            out["bias"] = sd[f"{prefix}.bias"]
        return out
    return {"TorchLinear_0": _lin(sd, prefix)}


def _ffno_ff(sd: Mapping[str, np.ndarray], prefix: str, n_ff_layers: int,
             layer_norm: bool) -> dict:
    ff: dict = {}
    for j in range(n_ff_layers):
        ff[f"WNDense_{j}"] = _wn_dense(sd, f"{prefix}.layers.{j}.0")
        if layer_norm and j == n_ff_layers - 1:
            ff[f"LayerNorm_{0}"] = {
                "scale": sd[f"{prefix}.layers.{j}.3.weight"],
                "bias": sd[f"{prefix}.layers.{j}.3.bias"],
            }
    return ff


def import_ffno1d(sd: Mapping[str, np.ndarray], n_layers: int = 4,
                  n_ff_layers: int = 2, layer_norm: bool = False) -> dict:
    """Reference models.ffno.FFNO1D state_dict -> our FFNO1D params."""
    p: dict = {
        "WNDense_0": _wn_dense(sd, "in_proj"),
        "WNDense_1": _wn_dense(sd, "out_proj"),
    }
    for i in range(n_layers):
        base = f"fourier_layers.{i}"
        p[f"FSpectralConv1d_{i}"] = {
            "fourier_weight": sd[f"{base}.fourier_weight.0"],
            "FeedForward_0": _ffno_ff(sd, f"{base}.backcast_ff",
                                      n_ff_layers, layer_norm),
        }
    return p


def import_ffno2d(sd: Mapping[str, np.ndarray], n_layers: int = 4,
                  n_ff_layers: int = 2, layer_norm: bool = False) -> dict:
    p: dict = {
        "WNDense_0": _wn_dense(sd, "in_proj"),
        "WNDense_1": _wn_dense(sd, "out_proj"),
    }
    for i in range(n_layers):
        base = f"fourier_layers.{i}"
        p[f"FSpectralConv2d_{i}"] = {
            "fourier_weight_y": sd[f"{base}.fourier_weight.0"],
            "fourier_weight_x": sd[f"{base}.fourier_weight.1"],
            "FeedForward_0": _ffno_ff(sd, f"{base}.backcast_ff",
                                      n_ff_layers, layer_norm),
        }
    return p


IMPORTERS = {
    "fno1d": import_fno1d,
    "fno2d": import_fno2d,
    "ffno1d": import_ffno1d,
    "ffno2d": import_ffno2d,
}
