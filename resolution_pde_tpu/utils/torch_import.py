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


# ---------------------------------------------------------------------------
# UNet2d (reference models/unet.py:204-293)
# ---------------------------------------------------------------------------

def import_unet2d(sd: Mapping[str, np.ndarray]) -> dict:
    """Reference UNet2d state_dict -> our UNet2d variables
    ({'params', 'batch_stats'}). 2D analogue of import_unet1d: conv weights
    (out, in, kh, kw) -> flax (kh, kw, in, out); transposed convs flip BOTH
    tap axes (forward parity in tests/test_torch_import.py)."""
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
                "kernel": np.ascontiguousarray(conv_w.transpose(2, 3, 1, 0))}
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
                sd[f"{up}.weight"].transpose(2, 3, 0, 1)[::-1, ::-1]),
            "bias": sd[f"{up}.bias"]}
    params["Conv_0"] = {
        "kernel": np.ascontiguousarray(
            sd["conv.weight"].transpose(2, 3, 1, 0)),
        "bias": sd["conv.bias"]}
    return {"params": {"_UNet_0": params},
            "batch_stats": {"_UNet_0": stats}}


# ---------------------------------------------------------------------------
# CNO 1D/2D (reference models/CNO1d.py:201-338 / CNO2d.py:202-340)
# ---------------------------------------------------------------------------

def _cno_conv(sd: Mapping[str, np.ndarray], prefix: str, ndim: int) -> dict:
    w = sd[f"{prefix}.weight"]
    kernel = (w.transpose(2, 1, 0) if ndim == 1
              else w.transpose(2, 3, 1, 0))
    return {"kernel": np.ascontiguousarray(kernel),
            "bias": sd[f"{prefix}.bias"]}


def _cno_block(sd, prefix: str, ndim: int, use_bn: bool):
    """Reference CNOBlock (convolution + batch_norm) -> our CNOBlock
    params/stats pair."""
    p = {"Conv_0": _cno_conv(sd, f"{prefix}.convolution", ndim)}
    s = {}
    if use_bn:
        p["BatchNorm_0"] = {"scale": sd[f"{prefix}.batch_norm.weight"],
                            "bias": sd[f"{prefix}.batch_norm.bias"]}
        s["BatchNorm_0"] = {"mean": sd[f"{prefix}.batch_norm.running_mean"],
                            "var": sd[f"{prefix}.batch_norm.running_var"]}
    return p, s


def _cno_residual(sd, prefix: str, ndim: int, use_bn: bool):
    p = {"Conv_0": _cno_conv(sd, f"{prefix}.convolution1", ndim),
         "Conv_1": _cno_conv(sd, f"{prefix}.convolution2", ndim)}
    s = {}
    if use_bn:
        for j in (1, 2):
            p[f"BatchNorm_{j - 1}"] = {
                "scale": sd[f"{prefix}.batch_norm{j}.weight"],
                "bias": sd[f"{prefix}.batch_norm{j}.bias"]}
            s[f"BatchNorm_{j - 1}"] = {
                "mean": sd[f"{prefix}.batch_norm{j}.running_mean"],
                "var": sd[f"{prefix}.batch_norm{j}.running_var"]}
    return p, s


def _cno_lift_project(sd, prefix: str, ndim: int):
    """LiftProjectBlock: inner CNOBlock (no BN) + convolution."""
    inner_p, _ = _cno_block(sd, f"{prefix}.inter_CNOBlock", ndim,
                            use_bn=False)
    return {"CNOBlock_0": inner_p,
            "Conv_0": _cno_conv(sd, f"{prefix}.convolution", ndim)}


def import_cno(sd: Mapping[str, np.ndarray], n_layers: int,
               n_res: int = 4, n_res_neck: int = 4, use_bn: bool = True,
               ndim: int = 1) -> dict:
    """Reference CNO1d/CNO2d state_dict -> our CNO1d/CNO2d variables.

    The flax module creates blocks in forward order, so the auto-named
    CNOBlock_k indices interleave encoder / ED_expansion / decoder blocks:
      k in [0, nl)            <- encoder.k
      k = nl + 2j             <- ED_expansion.{nl - j}   (j in [0, nl))
      k = nl + 2j + 1         <- decoder.j
      k = 3 nl                <- ED_expansion.0
    (forward pass order, models/CNO1d.py:304-337)."""
    nl = n_layers
    params: dict = {}
    stats: dict = {}

    params["LiftProjectBlock_0"] = _cno_lift_project(sd, "lift", ndim)
    params["LiftProjectBlock_1"] = _cno_lift_project(sd, "project", ndim)

    def put_block(our_key, ref_prefix):
        p, s = _cno_block(sd, ref_prefix, ndim, use_bn)
        params[our_key] = p
        if s:
            stats[our_key] = s

    for i in range(nl):
        put_block(f"CNOBlock_{i}", f"encoder.{i}")
    for j in range(nl):
        put_block(f"CNOBlock_{nl + 2 * j}", f"ED_expansion.{nl - j}")
        put_block(f"CNOBlock_{nl + 2 * j + 1}", f"decoder.{j}")
    put_block(f"CNOBlock_{3 * nl}", "ED_expansion.0")

    for j in range(nl * n_res):
        p, s = _cno_residual(
            sd, f"res_nets.{j // n_res}.res_nets.{j % n_res}", ndim, use_bn)
        params[f"ResidualBlock_{j}"] = p
        if s:
            stats[f"ResidualBlock_{j}"] = s
    for r in range(n_res_neck):
        p, s = _cno_residual(sd, f"res_net_neck.res_nets.{r}", ndim, use_bn)
        params[f"ResidualBlock_{nl * n_res + r}"] = p
        if s:
            stats[f"ResidualBlock_{nl * n_res + r}"] = s

    out = {"params": {"_CNO_0": params}}
    if stats:
        out["batch_stats"] = {"_CNO_0": stats}
    return out


def import_cno1d(sd, n_layers: int, n_res: int = 4, n_res_neck: int = 4,
                 use_bn: bool = True) -> dict:
    return import_cno(sd, n_layers, n_res, n_res_neck, use_bn, ndim=1)


def import_cno2d(sd, n_layers: int, n_res: int = 4, n_res_neck: int = 4,
                 use_bn: bool = True) -> dict:
    return import_cno(sd, n_layers, n_res, n_res_neck, use_bn, ndim=2)


# ---------------------------------------------------------------------------
# S4 family (reference models/s4_1d.py S4Model over S4Block/FFTConv/DPLR)
# ---------------------------------------------------------------------------

def dplr_kernel_params_from_sd(sd: Mapping[str, np.ndarray],
                               prefix: str) -> dict:
    """Reference SSMKernelDPLR parameters (N/2 conjugate-pair storage,
    models/s4.py:1290-1346) -> DPLRKernelLayer params (full-N spectrum).

    Mapping as tests/test_reference_parity.py::_transplant_dplr_kernel but
    from raw state_dict arrays: Lambda/P/B concat with conjugates, stored C
    is C-tilde -> ours is [conj(C~) | C~], log_dt = inv_dt[:, 0]
    (dt_transform='exp', dt_tie=True — the reference defaults; a checkpoint
    trained with other transforms needs the matching inverse here)."""
    def c(a):
        return a[..., 0] + 1j * a[..., 1]

    A = -np.exp(sd[f"{prefix}.A_real"]) - 1j * sd[f"{prefix}.A_imag"]
    B = c(sd[f"{prefix}.B"])[0]          # (S, N)
    P = c(sd[f"{prefix}.P"])             # (R, S, N)
    Ct = c(sd[f"{prefix}.C"])            # (channels, H, N)
    h = Ct.shape[1]
    if A.shape[0] != h:                  # n_ssm tying: expand to H
        # TILED like the reference's einops '(v t)': feature h = copy h mod S
        rep = h // A.shape[0]
        A = np.tile(A, (rep, 1))
        B = np.tile(B, (rep, 1))
        P = np.tile(P, (1, rep, 1))

    def full(z):
        return np.concatenate([z, np.conj(z)], axis=-1)

    lam = full(A)
    p_full = full(P)
    if p_full.shape[0] == 1:
        p_full = p_full[0]               # rank-1 historical layout
    ct_full = np.concatenate([np.conj(Ct), Ct], axis=-1)

    def pair(z):
        return np.stack([z.real, z.imag], -1).astype(np.float32)

    return {
        "log_dt": sd[f"{prefix}.inv_dt"][:, 0].astype(np.float32),
        "Lambda_log_neg_re": np.log(-lam.real).astype(np.float32),
        "Lambda_im": lam.imag.astype(np.float32),
        "P_vec": pair(p_full),
        "B_vec": pair(full(B)),
        "C": pair(ct_full),
    }


def _s4_output_linear(sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """S4Block's final LinearActivation — a bare Linear or a Sequential
    whose first child is the Linear (key '<prefix>.weight' or
    '<prefix>.0.weight')."""
    key = prefix if f"{prefix}.weight" in sd else f"{prefix}.0"
    return _lin(sd, key)


def import_s4_model(sd: Mapping[str, np.ndarray], n_layers: int = 4) -> dict:
    """Reference S4Model (models/s4_1d.py:7-185) state_dict -> our S4Model
    params: encoder/decoder Linears + per-layer S4Block (DPLR FFTConv + D
    skip + GLU output linear). The layer norms present in the reference
    state_dict are dead at prenorm=False (their output is discarded,
    s4_1d.py:117) and are intentionally not imported."""
    p: dict = {"Dense_0": _lin(sd, "encoder"),
               "Dense_1": _lin(sd, "decoder")}
    for i in range(n_layers):
        base = f"s4_layers.{i}"
        p[f"S4Block_{i}"] = {
            "FFTConvLayer_0": {
                "DPLRKernelLayer_0": dplr_kernel_params_from_sd(
                    sd, f"{base}.layer.kernel"),
                "D": sd[f"{base}.layer.D"],
            },
            "Dense_0": _s4_output_linear(sd, f"{base}.output_linear"),
        }
    return p


IMPORTERS.update({
    "unet1d": import_unet1d,
    "unet2d": import_unet2d,
    "cno1d": import_cno1d,
    "cno2d": import_cno2d,
    "s4": import_s4_model,
})
