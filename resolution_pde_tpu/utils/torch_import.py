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


# ---------------------------------------------------------------------------
# ScOT / SwinV2 (Poseidon) import — HF-named state dicts
# ---------------------------------------------------------------------------

def _t2j(v):
    """Accept numpy arrays or live torch tensors."""
    try:
        v = v.detach().numpy()
    except AttributeError:
        pass
    return np.asarray(v)


def swinv2_block_params_from_sd(sd: dict, prefix: str) -> dict:
    """Map one HF Swinv2Layer from a torch state_dict onto our
    models.poseidon.Swinv2Block param tree (names as in
    transformers.models.swinv2: `{prefix}.attention.self.query.weight` ...).

    This is the building block for importing scOT/Poseidon checkpoints —
    scOT's transformer blocks are HF SwinV2 blocks, so its state dict uses
    this naming for every encoder/decoder block. Validated against
    transformers in tests/test_poseidon.py."""
    def lin(name, bias=True):
        out = {"kernel": _t2j(sd[f"{prefix}.{name}.weight"]).T}
        if bias:
            out["bias"] = _t2j(sd[f"{prefix}.{name}.bias"])
        return out

    def ln(name):
        return {"scale": _t2j(sd[f"{prefix}.{name}.weight"]),
                "bias": _t2j(sd[f"{prefix}.{name}.bias"])}

    return {
        "attention": {
            "query": lin("attention.self.query"),
            "key": lin("attention.self.key", bias=False),
            "value": lin("attention.self.value"),
            "logit_scale": _t2j(sd[f"{prefix}.attention.self.logit_scale"]),
            "cpb_mlp0": lin(
                "attention.self.continuous_position_bias_mlp.0"),
            "cpb_mlp1": lin(
                "attention.self.continuous_position_bias_mlp.2",
                bias=False),
            "proj": lin("attention.output.dense"),
        },
        "layernorm_before": {"LayerNorm_0": ln("layernorm_before")},
        "layernorm_after": {"LayerNorm_0": ln("layernorm_after")},
        "intermediate": lin("intermediate.dense"),
        "output": lin("output.dense"),
    }


def import_scot_encoder(sd: dict, depths, base="swinv2") -> dict:
    """Map an HF Swinv2Model-style encoder state dict (patch embeddings +
    stages of blocks + patch-merging downsamples) onto the corresponding
    ScOT2d param subtrees. Returns a partial param dict with keys
    patch_embed/patch_norm/enc{i}_block{j}/merge{i}.

    Poseidon checkpoints carry more (decoder, conditioning, heads); this
    covers the encoder half whose naming is fixed by transformers. Raises
    KeyError listing what is missing so adapting to a given checkpoint's
    exact layout is mechanical."""
    params = {
        "patch_embed": {
            "kernel": _t2j(
                sd[f"{base}.embeddings.patch_embeddings.projection.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": _t2j(
                sd[f"{base}.embeddings.patch_embeddings.projection.bias"]),
        },
        "patch_norm": {
            "scale": _t2j(sd[f"{base}.embeddings.norm.weight"]),
            "bias": _t2j(sd[f"{base}.embeddings.norm.bias"]),
        },
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            params[f"enc{i}_block{j}"] = swinv2_block_params_from_sd(
                sd, f"{base}.encoder.layers.{i}.blocks.{j}")
        dkey = f"{base}.encoder.layers.{i}.downsample.reduction.weight"
        if dkey in sd:
            params[f"merge{i}"] = {
                "reduction": {"kernel": _t2j(sd[dkey]).T},
                "norm": {
                    "scale": _t2j(
                        sd[f"{base}.encoder.layers.{i}.downsample"
                           ".norm.weight"]),
                    "bias": _t2j(
                        sd[f"{base}.encoder.layers.{i}.downsample"
                           ".norm.bias"]),
                },
            }
    return params


def import_unet1d(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference models/unet.py:7-108 UNet1d state_dict -> our UNet1d
    variables ({'params', 'batch_stats'}).

    torch ConvNd weights (out, in, k) map to flax (k, in, out); transposed
    convs additionally FLIP the tap axis (flax's conv_transpose correlates
    where torch convolves — verified against torch in
    tests/test_reference_parity.py::test_unet1d_full_model_golden).
    """
    names = ["encoder1", "encoder2", "encoder3", "encoder4", "bottleneck",
             "decoder4", "decoder3", "decoder2", "decoder1"]
    short = {"encoder1": "enc1", "encoder2": "enc2", "encoder3": "enc3",
             "encoder4": "enc4", "bottleneck": "bottleneck",
             "decoder4": "dec4", "decoder3": "dec3", "decoder2": "dec2",
             "decoder1": "dec1"}
    params: dict = {}
    stats: dict = {}
    for i, name in enumerate(names):
        dc_p: dict = {}
        dc_s: dict = {}
        pre = f"{name}.{short[name]}"
        for j in (1, 2):
            conv_w = sd[f"{pre}conv{j}.weight"]
            dc_p[f"Conv_{j - 1}"] = {
                "kernel": np.ascontiguousarray(conv_w.transpose(2, 1, 0))}
            dc_p[f"BatchNorm_{j - 1}"] = {
                "scale": sd[f"{pre}norm{j}.weight"],
                "bias": sd[f"{pre}norm{j}.bias"]}
            dc_s[f"BatchNorm_{j - 1}"] = {
                "mean": sd[f"{pre}norm{j}.running_mean"],
                "var": sd[f"{pre}norm{j}.running_var"]}
        params[f"_DoubleConv_{i}"] = dc_p
        stats[f"_DoubleConv_{i}"] = dc_s
    for i, up in enumerate(["upconv4", "upconv3", "upconv2", "upconv1"]):
        params[f"ConvTranspose_{i}"] = {
            "kernel": np.ascontiguousarray(
                sd[f"{up}.weight"].transpose(2, 0, 1)[::-1]),
            "bias": sd[f"{up}.bias"]}
    params["Conv_0"] = {
        "kernel": np.ascontiguousarray(sd["conv.weight"].transpose(2, 1, 0)),
        "bias": sd["conv.bias"]}
    return {"params": {"_UNet_0": params},
            "batch_stats": {"_UNet_0": stats}}
