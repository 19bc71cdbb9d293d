"""Fused truncated spectral mix as a Pallas TPU kernel.

Computes, along the last spatial axis (per row r, output channel o):

    out[r, w, o] = sum_m idft[m, w] . ( sum_c W[c, o, m] . dft(x)[r, m, c] )

i.e. truncated forward DFT -> complex channel mix -> zero-padded inverse
DFT — one FFNO axis pass (ops/spectral.py factorized_spectral_conv_2d_dft
semantics) with the spectrum kept in VMEM per row tile instead of doing
three HBM-roundtrip GEMMs.

Layout: x (R, W, C) f32 where R = batch*other-spatial rows; DFT factor
matrices are small ((W, m) and (m, W)) and live in VMEM across the whole
grid. Grid is over row tiles; each program does four MXU matmul groups on
its tile. f32 accumulation throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resolution_pde_tpu.ops.spectral import _dft_matrices


def _make_kernel(precision):
  def _kernel(x_ref, fc_ref, fs_ref, ic_ref, is_ref, wr_ref, wi_ref, out_ref):
    """x (Tr, W, C); fc/fs (W, m); ic/is (m, W); wr/wi (C, O, m);
    out (Tr, W, O)."""
    x = x_ref[:]                      # (Tr, W, C)
    tr, w, c = x.shape
    m = fc_ref.shape[1]
    o = wr_ref.shape[1]

    # forward truncated DFT over W: (Tr*C, W) @ (W, m)
    xt = jnp.transpose(x, (0, 2, 1)).reshape(tr * c, w)
    zr = jnp.dot(xt, fc_ref[:], preferred_element_type=jnp.float32,
                 precision=precision)
    zi = jnp.dot(xt, fs_ref[:], preferred_element_type=jnp.float32,
                 precision=precision)
    zr = zr.reshape(tr, c, m)
    zi = zi.reshape(tr, c, m)

    # complex channel mix, batched over modes:
    # (m, Tr, C) @ (m, C, O) -> (m, Tr, O)
    zr_m = jnp.transpose(zr, (2, 0, 1))
    zi_m = jnp.transpose(zi, (2, 0, 1))
    wr_m = jnp.transpose(wr_ref[:], (2, 0, 1))  # (m, C, O)
    wi_m = jnp.transpose(wi_ref[:], (2, 0, 1))
    dn = (((2,), (1,)), ((0,), (0,)))  # contract C, batch over m
    rr = jax.lax.dot_general(zr_m, wr_m, dn,
                             preferred_element_type=jnp.float32,
                             precision=precision)
    ii = jax.lax.dot_general(zi_m, wi_m, dn,
                             preferred_element_type=jnp.float32,
                             precision=precision)
    ri = jax.lax.dot_general(zr_m, wi_m, dn,
                             preferred_element_type=jnp.float32,
                             precision=precision)
    ir = jax.lax.dot_general(zi_m, wr_m, dn,
                             preferred_element_type=jnp.float32,
                             precision=precision)
    or_m = rr - ii                    # (m, Tr, O)
    oi_m = ri + ir

    # inverse: (Tr*O, m) @ (m, W) for re and im parts
    or_t = jnp.transpose(or_m, (1, 2, 0)).reshape(tr * o, m)
    oi_t = jnp.transpose(oi_m, (1, 2, 0)).reshape(tr * o, m)
    y = (jnp.dot(or_t, ic_ref[:], preferred_element_type=jnp.float32,
                 precision=precision)
         + jnp.dot(oi_t, is_ref[:], preferred_element_type=jnp.float32,
                   precision=precision))
    out_ref[:] = jnp.transpose(y.reshape(tr, o, w), (0, 2, 1))

  return _kernel


@functools.partial(jax.jit,
                   static_argnames=("n_modes", "fft_norm", "row_tile",
                                    "interpret", "precision"))
def truncated_spectral_mix_1d(x, weight, n_modes: int,
                              fft_norm: str = "ortho", row_tile: int = 16,
                              interpret: bool = False,
                              precision: str = "highest"):
    """One FFNO axis pass, fused. x: (R, W, C) f32; weight: (C, O, m, 2).

    Returns (R, W, O) f32. Matches factorized_spectral_conv_1d applied
    rowwise (tested in tests/test_pallas.py).

    precision: 'highest' gives true-f32 MXU passes (matches the FFT path to
    roundoff); 'default' allows bf16 multiplies with f32 accumulation
    (~1e-2 relative, fine for training; ~2x faster).
    """
    r, w, c = x.shape
    m = min(n_modes, w // 2 + 1)
    o = weight.shape[1]
    fc, fs, ic, is_ = (jnp.asarray(a) for a in _dft_matrices(w, m, fft_norm))
    wr = weight[:, :, :m, 0]
    wi = weight[:, :, :m, 1]

    tile = min(row_tile, r)
    if r % tile:
        pad = tile - r % tile
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    rp = x.shape[0]

    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    # f32 multi-pass matmuls need extra scoped VMEM; raise the budget
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        _make_kernel(prec),
        compiler_params=params,
        grid=(rp // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, o, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, o, m), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, w, o), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.float32), fc, fs, ic, is_, wr, wi)
    return out[:r]
