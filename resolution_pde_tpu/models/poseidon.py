"""Poseidon (ScOT) adapter and a native shifted-window transformer operator.

Parity target: the reference loads the pretrained camlab-ethz/Poseidon-B
ScOT transformer from HuggingFace (main_1d.py:106-110) and calls it with a
time conditioning tensor, reading the 'output' key of the returned dict
(train/training.py:33-34).

Two paths here:
  - `load_pretrained_poseidon`: uses the external `scOT` package + HF hub
    when installed (same as the reference); raises with guidance otherwise
    (this image has no scOT and no network egress).
  - `SwinOperator2d`: a TPU-native shifted-window attention operator in
    flax with lead-time conditioning — the architectural role Poseidon
    plays (hierarchical windowed-attention operator) without the external
    dependency. Callable as model.apply(vars, x, time) -> {'output': ...}
    to match the reference's calling convention.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.models.layers import gelu


def load_pretrained_poseidon(model_name: str = "camlab-ethz/Poseidon-B",
                             **config_overrides):
    """Reference path: ScOT.from_pretrained (main_1d.py:107-110)."""
    try:
        from scOT.model import ScOT, ScOTConfig  # type: ignore
    except ImportError as e:
        raise ImportError(
            "the scOT package is not installed; use "
            "resolution_pde_tpu.models.poseidon.SwinOperator2d for the "
            "TPU-native windowed-attention operator, or install scOT to "
            "load pretrained Poseidon checkpoints") from e
    config = ScOTConfig(**config_overrides)
    return ScOT.from_pretrained(model_name, config=config,
                                ignore_mismatched_sizes=True)


def _window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nH*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_merge(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class _WindowAttention(nn.Module):
    dim: int
    n_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x):
        """x: (nW, T, C) windows."""
        nw, t, c = x.shape
        hs = c // self.n_heads
        qkv = nn.Dense(3 * c)(x).reshape(nw, t, 3, self.n_heads, hs)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("nhtd,nhsd->nhts", q, k) / np.sqrt(hs)
        # learned relative position bias per head
        rel = self.param(
            "rel_bias",
            nn.initializers.normal(0.02),
            (self.n_heads, t, t),
        )
        attn = jax.nn.softmax(attn + rel[None], axis=-1)
        out = jnp.einsum("nhts,nhsd->nhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, t, c)
        return nn.Dense(c)(out)


class _SwinBlock(nn.Module):
    dim: int
    n_heads: int
    window_size: int
    shift: bool

    @nn.compact
    def __call__(self, x, t_embed):
        """x: (B, H, W, C); t_embed: (B, C) lead-time conditioning."""
        b, h, w, c = x.shape
        ws = self.window_size
        # adaptive layer scale from the time embedding (Poseidon-style
        # lead-time conditioning)
        scale = nn.Dense(c)(t_embed)[:, None, None, :]
        shortcut = x
        x = nn.LayerNorm()(x) * (1 + scale)
        if self.shift:
            x = jnp.roll(x, (-(ws // 2), -(ws // 2)), axis=(1, 2))
        wins = _window_partition(x, ws)
        wins = _WindowAttention(self.dim, self.n_heads, ws)(wins)
        x = _window_merge(wins, ws, h, w)
        if self.shift:
            x = jnp.roll(x, (ws // 2, ws // 2), axis=(1, 2))
        x = shortcut + x
        y = nn.LayerNorm()(x)
        y = nn.Dense(4 * c)(y)
        y = gelu(y)
        y = nn.Dense(c)(y)
        return x + y


class SwinOperator2d(nn.Module):
    """Shifted-window transformer operator with lead-time conditioning.

    Input (B, C_in, H, W), time (B,) or scalar -> {'output':
    (B, C_out, H, W)} (matching the reference's Poseidon calling
    convention, train/training.py:33-34).
    """

    in_channels: int = 1
    out_channels: int = 1
    embed_dim: int = 48
    depths: Any = (2, 2)
    n_heads: int = 4
    window_size: int = 8
    patch_size: int = 4

    @nn.compact
    def __call__(self, x, time=1.0, deterministic: bool = True):
        del deterministic
        b = x.shape[0]
        x = jnp.moveaxis(x, 1, -1)  # (B, H, W, C)
        h0, w0 = x.shape[1], x.shape[2]
        p = self.patch_size
        # patch embed
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p))(x)

        # sinusoidal lead-time embedding -> MLP
        t = jnp.broadcast_to(jnp.asarray(time, jnp.float32).reshape(-1),
                             (b,))
        half = self.embed_dim // 2
        freqs = jnp.exp(-np.log(1e4) * jnp.arange(half) / max(half - 1, 1))
        temb = jnp.concatenate(
            [jnp.sin(t[:, None] * freqs), jnp.cos(t[:, None] * freqs)],
            axis=-1)
        temb = nn.Dense(self.embed_dim)(gelu(nn.Dense(self.embed_dim)(temb)))

        for d in self.depths:
            for i in range(d):
                x = _SwinBlock(self.embed_dim, self.n_heads,
                               self.window_size, shift=bool(i % 2))(x, temb)
        # patch de-embed back to the input grid
        x = nn.ConvTranspose(self.embed_dim, (p, p), strides=(p, p))(x)
        x = gelu(x)
        x = nn.Conv(self.out_channels, (1, 1))(x)
        x = x[:, :h0, :w0]
        return {"output": jnp.moveaxis(x, -1, 1)}


# ---------------------------------------------------------------------------
# ScOT (Poseidon) — hierarchical SwinV2 encoder/decoder operator
# ---------------------------------------------------------------------------
#
# The reference loads `scOT.model.ScOT` (main_1d.py:106-110), whose
# transformer blocks are HuggingFace SwinV2 blocks (the Poseidon paper bases
# scOT on transformers' SwinV2). This is a faithful flax port of those
# blocks — cosine attention with clamped learned logit scale, continuous
# relative position bias (log-CPB MLP), post-norm residual ordering, patch
# merging — golden-tested against transformers.models.swinv2 with
# transplanted weights (tests/test_poseidon.py). The U-shaped
# encoder/decoder with ConvNeXt skip blocks and lead-time-conditioned
# LayerNorm follows the Poseidon paper + the conf/model/pos/pos.yaml config
# surface (the scOT package itself is not in this image); deviations are
# listed in PARITY.md.


def _log_cpb_table(ws: int):
    """SwinV2 log-spaced relative-coords table, (1, 2ws-1, 2ws-1, 2)."""
    rel = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(rel, rel, indexing="ij"), axis=-1)[None]
    if ws > 1:
        table = table / (ws - 1)
    table = table * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32)


def _rel_position_index(ws: int):
    """(ws*ws, ws*ws) index into the flattened (2ws-1)^2 bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class Swinv2WindowAttention(nn.Module):
    """SwinV2 self-attention on windows (modeling_swinv2.Swinv2SelfAttention
    + Swinv2SelfOutput): cosine attention, clamped exp(logit_scale),
    16*sigmoid(CPB-MLP) relative bias."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW, T, C); mask: (n_regions, T, T) additive or None."""
        nw, t, c = x.shape
        nh = self.num_heads
        hs = c // nh
        q = nn.Dense(c, use_bias=self.qkv_bias, name="query")(x)
        k = nn.Dense(c, use_bias=False, name="key")(x)
        v = nn.Dense(c, use_bias=self.qkv_bias, name="value")(x)
        q, k, v = (a.reshape(nw, t, nh, hs).transpose(0, 2, 1, 3)
                   for a in (q, k, v))

        qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        attn = jnp.einsum("nhtd,nhsd->nhts", qn, kn)
        logit_scale = self.param(
            "logit_scale",
            lambda rng, s: jnp.log(10.0 * jnp.ones(s)), (nh, 1, 1))
        attn = attn * jnp.exp(jnp.clip(logit_scale, max=np.log(100.0)))

        # continuous position bias: Linear(2->512) -> ReLU -> Linear(512->nh)
        table = jnp.asarray(_log_cpb_table(self.window_size))
        hmlp = nn.Dense(512, name="cpb_mlp0")(table)
        hmlp = jax.nn.relu(hmlp)
        bias_table = nn.Dense(nh, use_bias=False, name="cpb_mlp1")(hmlp)
        bias_table = bias_table.reshape(-1, nh)
        idx = jnp.asarray(_rel_position_index(self.window_size).reshape(-1))
        bias = bias_table[idx].reshape(t, t, nh).transpose(2, 0, 1)
        bias = 16.0 * jax.nn.sigmoid(bias)
        attn = attn + bias[None]

        if mask is not None:
            nr = mask.shape[0]
            attn = attn.reshape(nw // nr, nr, nh, t, t)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(nw, nh, t, t)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhts,nhsd->nhtd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, t, c)
        return nn.Dense(c, name="proj")(out)


class CondLayerNorm(nn.Module):
    """Lead-time-conditioned LayerNorm (Poseidon): LN(x)*(1+a(t)) + b(t),
    with a, b zero-initialized so conditioning starts as identity."""

    eps: float = 1e-5
    use_conditioning: bool = True

    @nn.compact
    def __call__(self, x, temb):
        y = nn.LayerNorm(epsilon=self.eps)(x)
        if not self.use_conditioning or temb is None:
            return y
        c = x.shape[-1]
        a = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="alpha")(temb)
        b = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="beta")(temb)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        return y * (1.0 + a.reshape(shape)) + b.reshape(shape)


def _shift_attention_mask(h: int, w: int, ws: int, shift: int):
    """Additive mask (n_windows_per_image, T, T) for shifted windows
    (Swinv2Layer.get_attn_mask)."""
    img = np.zeros((h, w), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    wins = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class Swinv2Block(nn.Module):
    """One SwinV2 layer, POST-norm ordering (Swinv2Layer.forward):
    x = x + CLN(attn(x)); x = x + CLN(mlp(x)). LayerNorms are lead-time
    conditioned when use_conditioning (the scOT modification)."""

    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    use_conditioning: bool = True

    @nn.compact
    def __call__(self, x, temb):
        """x: (B, H, W, C)."""
        b, h, w, c = x.shape
        # Swinv2Layer._compute_window_shift: clamp the window to the
        # resolution and drop the shift when the window covers the grid
        ws = min(self.window_size, h, w)
        shift = 0 if min(h, w) <= self.window_size else self.shift
        assert h % ws == 0 and w % ws == 0, (
            f"grid ({h},{w}) must be divisible by window {ws}")

        shortcut = x
        if shift > 0:
            xs = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attention_mask(h, w, ws, shift))
        else:
            xs = x
            mask = None
        wins = xs.reshape(b, h // ws, ws, w // ws, ws, c)
        wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
        wins = Swinv2WindowAttention(self.dim, self.num_heads, ws,
                                     self.qkv_bias, name="attention")(
            wins, mask)
        xs = wins.reshape(b, h // ws, w // ws, ws, ws, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
        if shift > 0:
            xs = jnp.roll(xs, (shift, shift), axis=(1, 2))
        x = shortcut + CondLayerNorm(
            self.layer_norm_eps, self.use_conditioning,
            name="layernorm_before")(xs, temb)

        y = nn.Dense(int(self.mlp_ratio * c), name="intermediate")(x)
        y = gelu(y)
        y = nn.Dense(c, name="output")(y)
        y = CondLayerNorm(self.layer_norm_eps, self.use_conditioning,
                          name="layernorm_after")(y, temb)
        return x + y


class PatchMerging(nn.Module):
    """SwinV2 patch merging: 4-corner concat -> Linear(4C->2C, no bias) ->
    LN (post-norm, Swinv2PatchMerging.forward)."""

    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.Dense(2 * c, use_bias=False, name="reduction")(x)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm")(x)


class PatchExpanding(nn.Module):
    """Decoder upsample (SwinUNet-style, the scOT decoder's inverse of
    patch merging): Linear(C->2C) -> pixel-shuffle 2x -> C/2 channels,
    then LN."""

    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = nn.Dense(2 * c, use_bias=False, name="expansion")(x)
        x = x.reshape(b, h, w, 2, 2, c // 2)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c // 2)
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm")(x)


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block for the scOT skip connections (pos.yaml
    residual_model: convnext): DWConv7x7 -> LN -> Linear(4x) -> GELU ->
    Linear -> layer-scale residual."""

    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, temb=None):
        c = x.shape[-1]
        y = nn.Conv(c, (7, 7), padding="SAME", feature_group_count=c,
                    name="dwconv")(x)
        y = CondLayerNorm(self.layer_norm_eps, temb is not None,
                          name="norm")(y, temb)
        y = nn.Dense(4 * c, name="pwconv1")(y)
        y = gelu(y)
        y = nn.Dense(c, name="pwconv2")(y)
        gamma = self.param("gamma",
                           lambda rng, s: 1e-6 * jnp.ones(s), (c,))
        return x + gamma * y


class ScOT2d(nn.Module):
    """Poseidon's scOT operator: hierarchical SwinV2 encoder/decoder with
    lead-time conditioning and ConvNeXt skip blocks.

    Config surface mirrors conf/model/pos/pos.yaml. Input
    (B, num_channels, H, W) + time -> {'output': (B, num_out_channels,
    H, W)} (the reference's calling convention, train/training.py:33-34).
    """

    num_channels: int = 3
    num_out_channels: int = 3
    patch_size: int = 4
    embed_dim: int = 96
    depths: Any = (8, 8, 8, 8)
    num_heads: Any = (3, 6, 12, 24)
    skip_connections: Any = (2, 2, 2, 0)
    window_size: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    use_conditioning: bool = True
    learn_residual: bool = False
    residual_model: str = "convnext"

    @nn.compact
    def __call__(self, x, time=1.0, deterministic: bool = True):
        del deterministic
        b = x.shape[0]
        x_in = x
        x = jnp.moveaxis(x, 1, -1)  # (B, H, W, C_in)
        h0, w0 = x.shape[1], x.shape[2]
        p = self.patch_size
        n_stages = len(self.depths)

        # patch embedding (Swinv2Embeddings: conv + LN)
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps,
                         name="patch_norm")(x)

        # lead-time embedding: raw scalar (B, 1); the conditioned LNs
        # learn their own affine maps of it
        temb = (jnp.broadcast_to(
            jnp.asarray(time, jnp.float32).reshape(-1, 1)[:b], (b, 1))
            if self.use_conditioning else None)

        def stage(x, level, prefix):
            for j in range(self.depths[level]):
                x = Swinv2Block(
                    x.shape[-1], self.num_heads[level], self.window_size,
                    shift=(self.window_size // 2) if j % 2 else 0,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    layer_norm_eps=self.layer_norm_eps,
                    use_conditioning=self.use_conditioning,
                    name=f"{prefix}{level}_block{j}")(x, temb)
            return x

        # encoder
        skips = []
        for level in range(n_stages - 1):
            x = stage(x, level, "enc")
            skips.append(x)
            x = PatchMerging(self.layer_norm_eps,
                             name=f"merge{level}")(x)
        x = stage(x, n_stages - 1, "enc")  # bottleneck

        # decoder with ConvNeXt-processed skips
        for level in range(n_stages - 2, -1, -1):
            x = PatchExpanding(self.layer_norm_eps,
                               name=f"expand{level}")(x)
            skip = skips[level]
            for r in range(self.skip_connections[level]):
                if self.residual_model == "convnext":
                    skip = ConvNeXtBlock(
                        self.layer_norm_eps,
                        name=f"skip{level}_res{r}")(skip, temb)
            x = nn.Dense(x.shape[-1], name=f"fuse{level}")(
                jnp.concatenate([x, skip], axis=-1))
            x = stage(x, level, "dec")

        # patch recovery: pixel-shuffle x p, then 1x1 conv to out channels
        c = x.shape[-1]
        x = nn.Dense(p * p * c, use_bias=False, name="final_expand")(x)
        x = x.reshape(b, h0 // p, w0 // p, p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h0, w0, c)
        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="final_norm")(x)
        x = nn.Conv(self.num_out_channels, (1, 1), name="head")(x)
        out = jnp.moveaxis(x, -1, 1)
        if self.learn_residual and self.num_out_channels == x_in.shape[1]:
            out = out + x_in
        return {"output": out}
