"""MoE-GPT neural operator: linear-attention cross/self-attention blocks
with position-gated mixture-of-experts MLPs (GNOT-style).

Parity target: models/mgpt.py:31-330 — LinearAttention (l1 normalization:
softmax(q), softmax(k), context = k^T v, normalized q-context product with
+q residual), MoECrossAttentionBlock (cross-attn -> gated MoE -> self-attn
-> gated MoE, gate = softmax(MLP(pos))), MoEGPTNO (trunk/branch MLP
encoders, stacked blocks, output MLP, optional horizontal Fourier
positional embedding). Unused by any reference config but part of the
model inventory (SURVEY.md §2.3).

Note: the reference's second MoE uses moe_mlp1 again (mgpt.py:202 — likely
a bug); we use a distinct expert set and document the difference.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.models.layers import ACTIVATIONS


class LinearAttention(nn.Module):
    """O(T) linear attention, 'l1' type (mgpt.py:31-90)."""

    n_embd: int
    n_head: int = 1
    attn_pdrop: float = 0.0

    @nn.compact
    def __call__(self, x, y=None, deterministic: bool = True):
        y = x if y is None else y
        b, t1, c = x.shape
        t2 = y.shape[1]
        hs = c // self.n_head

        def heads(z, t):
            return z.reshape(b, t, self.n_head, hs).transpose(0, 2, 1, 3)

        q = heads(nn.Dense(c, name="query")(x), t1)
        k = heads(nn.Dense(c, name="key")(y), t2)
        v = heads(nn.Dense(c, name="value")(y), t2)

        q = jax.nn.softmax(q, axis=-1)
        k = jax.nn.softmax(k, axis=-1)
        k_cumsum = jnp.sum(k, axis=-2, keepdims=True)
        d_inv = 1.0 / jnp.sum(q * k_cumsum, axis=-1, keepdims=True)
        context = jnp.einsum("bhtd,bhte->bhde", k, v)
        out = jnp.einsum("bhtd,bhde->bhte", q, context) * d_inv + q
        if self.attn_pdrop > 0.0:
            out = nn.Dropout(self.attn_pdrop,
                             deterministic=deterministic)(out)
        out = out.transpose(0, 2, 1, 3).reshape(b, t1, c)
        return nn.Dense(c, name="proj")(out)


class _ExpertMLP(nn.Module):
    n_embd: int
    n_inner: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.n_inner)(x)
        x = ACTIVATIONS[self.act](x)
        return nn.Dense(self.n_embd)(x)


def _stacked_expert_init(in_axis=-2):
    # per-expert lecun_normal (flax Dense default) with the expert dim as a
    # batch axis, so each expert's slice is distributed like the loop impl's
    return nn.initializers.variance_scaling(
        1.0, "fan_in", "truncated_normal", in_axis=in_axis, out_axis=-1,
        batch_axis=(0,))


class _StackedExpertMLP(nn.Module):
    """All experts' weights in one tensor with a leading expert dim — the
    expert-parallel layout: shard dim 0 over an "expert" mesh axis
    (parallel/ep.py) and each device computes only its experts; the gated
    sum's contraction over experts becomes one psum over ICI.

    Same math as n_experts _ExpertMLP modules; returns (m, B, T, C)."""

    n_embd: int
    n_inner: int
    n_experts: int
    act: str = "gelu"

    @nn.compact
    def __call__(self, z):
        m, c, i = self.n_experts, z.shape[-1], self.n_inner
        w1 = self.param("w1", _stacked_expert_init(), (m, c, i))
        b1 = self.param("b1", nn.initializers.zeros, (m, i))
        w2 = self.param("w2", _stacked_expert_init(), (m, i, self.n_embd))
        b2 = self.param("b2", nn.initializers.zeros, (m, self.n_embd))
        h = jnp.einsum("btc,mci->mbti", z, w1) + b1[:, None, None, :]
        h = ACTIVATIONS[self.act](h)
        return (jnp.einsum("mbti,mio->mbto", h, w2)
                + b2[:, None, None, :])


class MoECrossAttentionBlock(nn.Module):
    """mgpt.py:140-205."""

    n_embd: int
    n_inner: int
    n_head: int = 1
    n_experts: int = 2
    space_dim: int = 2
    act: str = "gelu"
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    expert_impl: str = "loop"  # 'loop' | 'stacked' (expert-parallel layout)

    @nn.compact
    def __call__(self, x, y, pos, deterministic: bool = True):
        # gate: softmax over experts from positions (B, T1, n_experts)
        g = nn.Dense(self.n_inner)(pos)
        g = ACTIVATIONS[self.act](g)
        g = nn.Dense(self.n_inner)(g)
        g = ACTIVATIONS[self.act](g)
        g = jax.nn.softmax(nn.Dense(self.n_experts)(g), axis=-1)
        gate = g[:, :, None, :]  # (B, T1, 1, m)

        def moe(z, name):
            if self.expert_impl == "stacked":
                experts = _StackedExpertMLP(
                    self.n_embd, self.n_inner, self.n_experts, self.act,
                    name=f"{name}_stacked")(z)  # (m,B,T,C)
                return jnp.einsum("mbtc,btm->btc", experts, g)
            experts = jnp.stack(
                [_ExpertMLP(self.n_embd, self.n_inner, self.act,
                            name=f"{name}_{i}")(z)
                 for i in range(self.n_experts)], axis=-1)  # (B,T,C,m)
            return jnp.sum(gate * experts, axis=-1)

        ca = LinearAttention(self.n_embd, self.n_head, self.attn_pdrop,
                             name="crossattn")(
            nn.LayerNorm()(x), nn.LayerNorm()(y), deterministic)
        if self.resid_pdrop > 0.0:
            ca = nn.Dropout(self.resid_pdrop,
                            deterministic=deterministic)(ca)
        x = x + ca
        x = x + nn.LayerNorm()(moe(x, "moe1"))
        sa = LinearAttention(self.n_embd, self.n_head, self.attn_pdrop,
                             name="selfattn")(
            nn.LayerNorm()(x), None, deterministic)
        if self.resid_pdrop > 0.0:
            sa = nn.Dropout(self.resid_pdrop,
                            deterministic=deterministic)(sa)
        x = x + sa
        x = x + nn.LayerNorm()(moe(x, "moe2"))
        return x


def horizontal_fourier_embedding(x, n: int = 3):
    """(B, T, C) -> (B, T, C*(4n+3)) fourier features (mgpt.py:126-133)."""
    freqs = 2.0 ** np.linspace(-n, n, 2 * n + 1)
    freqs = jnp.asarray(freqs)[None, None, None, :]
    xe = x[..., None]
    x_cos = jnp.cos(freqs * xe)
    x_sin = jnp.sin(freqs * xe)
    out = jnp.concatenate([xe, x_cos, x_sin], axis=-1)
    return out.reshape(x.shape[0], x.shape[1], -1)


class _MLP(nn.Module):
    n_hidden: int
    n_out: int
    n_layers: int = 2
    act: str = "gelu"

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_layers - 1):
            x = nn.Dense(self.n_hidden)(x)
            x = ACTIVATIONS[self.act](x)
        return nn.Dense(self.n_out)(x)


class MoEGPTNO(nn.Module):
    """Cross-attention GPT neural operator (mgpt.py:223-330).

    __call__(g_query (B, T1, trunk_size), u_branch (B, T2, branch_size),
    pos (B, T1, space_dim)) -> (B, T1, output_size).
    """

    trunk_size: int = 2
    branch_size: int = 2
    space_dim: int = 2
    output_size: int = 3
    n_layers: int = 2
    n_hidden: int = 64
    n_head: int = 1
    n_experts: int = 2
    mlp_layers: int = 2
    act: str = "gelu"
    ffn_dropout: float = 0.0
    attn_dropout: float = 0.0
    horiz_fourier_dim: int = 0
    expert_impl: str = "loop"  # 'loop' | 'stacked' (expert-parallel layout)

    @nn.compact
    def __call__(self, g, u, pos, deterministic: bool = True):
        if self.horiz_fourier_dim > 0:
            g = horizontal_fourier_embedding(g, self.horiz_fourier_dim)
            u = horizontal_fourier_embedding(u, self.horiz_fourier_dim)
        x = _MLP(self.n_hidden, self.n_hidden, self.mlp_layers,
                 self.act, name="trunk_mlp")(g)
        y = _MLP(self.n_hidden, self.n_hidden, self.mlp_layers,
                 self.act, name="branch_mlp")(u)
        for i in range(self.n_layers):
            x = MoECrossAttentionBlock(
                self.n_hidden, self.n_hidden, self.n_head, self.n_experts,
                self.space_dim, self.act, self.ffn_dropout,
                self.attn_dropout, self.expert_impl, name=f"block_{i}")(
                x, y, pos, deterministic)
        return _MLP(self.n_hidden, self.output_size, self.mlp_layers,
                    name="out_mlp")(x)


class GNOTOperator(nn.Module):
    """Standard-pipeline adapter for MoEGPTNO: x (B, T, c + space_dim) rows
    are [node features | positions]; query and branch both read the
    features, the gate reads the positions (the reference's GNOT operator
    surface, models/mgpt.py:223-330, driven by dgl_data-style point
    clouds). Output (B, T, output_size)."""

    space_dim: int = 2
    output_size: int = 1
    n_layers: int = 2
    n_hidden: int = 64
    n_head: int = 1
    n_experts: int = 2
    mlp_layers: int = 2
    act: str = "gelu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feats = x[..., : -self.space_dim]
        pos = x[..., -self.space_dim:]
        g = jnp.concatenate([feats, pos], axis=-1)
        return MoEGPTNO(
            trunk_size=g.shape[-1], branch_size=g.shape[-1],
            space_dim=self.space_dim, output_size=self.output_size,
            n_layers=self.n_layers, n_hidden=self.n_hidden,
            n_head=self.n_head, n_experts=self.n_experts,
            mlp_layers=self.mlp_layers, act=self.act,
        )(g, g, pos, deterministic)
