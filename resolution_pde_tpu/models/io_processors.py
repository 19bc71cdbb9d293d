"""Input/output processor registry for the configurable S4 models.

Parity target: models/custom_layer.py:144-437 — pure reshape/concat
adapters between dataset layouts (B, T, Sx, [Sy], H) and the backbone's
(batch, sequence, hidden) layout. Implemented as pure functions (they carry
no parameters); registries map the reference's string names.
"""

from __future__ import annotations

import jax.numpy as jnp
from einops import rearrange, repeat


# ---- grid input processors (custom_layer.py:223-277) ----

def concat(x, grid):
    """(B, S..., H) + (B, S..., 1) -> concat on channels."""
    return jnp.concatenate([x, grid], axis=-1)


def concat_nd(x, grid):
    """(B, S, H): unsqueeze features and attach grid per feature."""
    b, s, h = x.shape
    x = x[..., None]
    grid = repeat(grid, "b s h -> b s c h", c=h)
    return jnp.concatenate([x, grid], axis=-1)


def concat_trans_squeeze_1d(x, grid):
    """(B, S, 1) + (B, S, 1) -> (B, 2S)."""
    return jnp.concatenate([x[..., 0], grid[..., 0]], axis=-1)


def concat_flat_trans(x, grid):
    """(B, S, T, H) + (B, S, 1) -> (B, T, S*H + S)."""
    b, s, t, h = x.shape
    x = rearrange(x, "b s t h -> b t (s h)")
    grid = repeat(rearrange(grid, "b s h -> b (s h)"), "b h -> b t h", t=t)
    return jnp.concatenate([x, grid], axis=-1)


def concat_trans(x, grid):
    """(B, S..., T, H) + (B, S..., 1) -> (B, T, S..., H+1)."""
    t = x.shape[-2]
    x = rearrange(x, "b ... t h -> b t ... h")
    grid = repeat(grid, "b ... h -> b t ... h", t=t)
    return jnp.concatenate([x, grid], axis=-1)


GRID_INPUT_REGISTRY = {
    "Concat": concat,
    "ConcatND": concat_nd,
    "ConcatTransSqueeze1D": concat_trans_squeeze_1d,
    "ConcatFlatTrans": concat_flat_trans,
    "ConcatTrans": concat_trans,
}


# ---- input processors (custom_layer.py:280-338, 378-409) ----

def input_id(x):
    return x


def batch_time(x):
    """(B, T, S..., H) -> ((B T), S..., H)."""
    return rearrange(x, "b t ... h -> (b t) ... h")


def batch_space(x):
    """(B, T, S..., H) -> ((B S...), T, H)."""
    return rearrange(x, "b t ... h -> (b ...) t h")


def space_to_hidden(x):
    """(B, T, S, H) -> (B, T, (S H))."""
    return rearrange(x, "b t s h -> b t (s h)")


INPUT_REGISTRY = {
    "identity": input_id,
    "BatchTime": batch_time,
    "BatchSpace": batch_space,
    "SpaceToHidden": space_to_hidden,
}


class BatchSpaceConv:
    """Spatial convolution then batch-space reshape
    (custom_layer.py:388-409). Parameterized, so exposed as a flax module
    factory rather than a pure function; see models/s4_base.py for use."""

    @staticmethod
    def make(d_model: int = 128, kernel_size: int = 3, dim: int = 1):
        import flax.linen as nn

        class _BSC(nn.Module):
            @nn.compact
            def __call__(self, x):
                # x: (B, T, S..., H) -> conv over space -> ((B S...), T, H)
                b, t = x.shape[0], x.shape[1]
                h = x.shape[-1]
                xs = rearrange(x, "b t ... h -> (b t) ... h")
                xs = nn.Conv(d_model, (kernel_size,) * dim,
                             padding="SAME")(xs)
                xs = rearrange(xs, "(b t) ... h -> b t ... h", b=b, t=t)
                return rearrange(xs, "b t ... h -> (b ...) t h")

        return _BSC()


# ---- output processors (custom_layer.py:169-203, 293-349) ----

def out_id(x, input_shape):
    return x


def squeeze(x, input_shape):
    assert x.shape[-1] == 1
    return x[..., 0]


def unsqueeze(x, input_shape):
    return x[..., None]


def unflat_trans(x, input_shape):
    """(B, T, (S D)) -> (B, S, T, D)."""
    d = input_shape[-1]
    s = x.shape[-1] // d
    return rearrange(x, "b t (s d) -> b s t d", s=s, d=d)


def trans(x, input_shape):
    """(B, T, S..., H) -> (B, S..., T, H)."""
    return rearrange(x, "b t ... h -> b ... t h")


def unbatch_time(x, input_shape):
    b, t = input_shape[0], input_shape[1]
    return rearrange(x, "(b t) ... h -> b t ... h", b=b, t=t)


def unbatch_space(x, input_shape):
    """((B S...), T, H) -> (B, T, S..., H)."""
    b, t = input_shape[0], input_shape[1]
    spatial = input_shape[2:-1]
    names = ["sx", "sy", "sz"][: len(spatial)]
    pattern = " ".join(names)
    return rearrange(x, f"(b {pattern}) t h -> b t {pattern} h", b=b,
                     **dict(zip(names, spatial)))


def space_from_hidden(x, input_shape):
    b, t, s, h = input_shape
    return rearrange(x, "b t (s h) -> b t s h", s=s, h=h)


OUTPUT_REGISTRY = {
    "identity": out_id,
    "Squeeze": squeeze,
    "Unsqueeze": unsqueeze,
    "UnflatTrans": unflat_trans,
    "UnbatchTime": unbatch_time,
    "UnbatchSpace": unbatch_space,
    "SpaceFromHidden": space_from_hidden,
    "Trans": trans,
}
