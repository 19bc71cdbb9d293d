"""Packed-complex fused FFNO axis pass as a Pallas TPU kernel, v2.

One kernel per axis pass computes truncated forward DFT -> complex channel
mix -> zero-padded inverse DFT with the spectrum resident in VMEM. This is
the dft_v3 math (ops/spectral.py _dft_pass_last_axis_v3: re/im packed into
single GEMMs so contraction dims are 2m/2C instead of m/C) fused into one
program: the XLA GEMM formulation of the same pass is HBM-bandwidth-bound
(arithmetic intensity ~86 flops/byte at the bench shape), so the
intermediate spectra never touching HBM is worth more than any GEMM-level
tuning. Differences from the v1 kernel (spectral_mix.py):

  - packed re/im: 3 MXU dots per tile (K/N = 2m/2C = 128+) instead of 10
    (K/N = 64),
  - mix batches over modes with M = row_tile (256) instead of 16,
  - bf16 in/out + bf16 multiplies with f32 accumulation for the training
    path (f32 x f32 inputs keep full-precision dots).

The op is linear in x, so the x-adjoint is the SAME kernel with
transposed factors, and the packed-weight gradient is a small batched
einsum in XLA — custom VJP wires both (training works end to end).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from resolution_pde_tpu.ops.spectral import _dft_matrices

_VMEM_LIMIT = 100 * 1024 * 1024


def _make_kernel(cd):
    # Mosaic restriction shaping this kernel: reshapes must not split or
    # merge the minormost (lane) dimension, so the packed re/im lanes are
    # handled by SLICING ([:, :m] / [:, m:]) and CONCAT along lanes, and
    # all reshapes only split/merge sublane dims.
    def _kernel(x_ref, f2_ref, i2_ref, wpk_ref, out_ref):
        """x (Tr, W, C); f2 (W, 2m) cols (s, m); i2 (2m, W) rows (t, m);
        wpk (m, 2C, 2O) with K rows (s, c) and N cols (t, o);
        out (Tr, W, O)."""
        x = x_ref[:]
        tr, w, c = x.shape
        m = wpk_ref.shape[0]
        o = wpk_ref.shape[2] // 2

        # forward packed DFT: (Tr*C, W) @ (W, 2m)
        xt = jnp.transpose(x, (0, 2, 1)).reshape(tr * c, w).astype(cd)
        z = jnp.dot(xt, f2_ref[:].astype(cd),
                    preferred_element_type=jnp.float32)  # (Tr*C, 2m)
        # re/im by lane slice; (m, Tr, C) each; concat lanes -> (s, c) K
        zre = jnp.transpose(z[:, :m].reshape(tr, c, m), (2, 0, 1))
        zim = jnp.transpose(z[:, m:].reshape(tr, c, m), (2, 0, 1))
        zk = jnp.concatenate([zre, zim], axis=-1)        # (m, Tr, 2C)

        # channel mix, batched over modes: (m, Tr, 2C) @ (m, 2C, 2O)
        mixed = jax.lax.dot_general(
            zk.astype(cd), wpk_ref[:].astype(cd),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # (m, Tr, 2O)

        # inverse packed DFT: rows (t, m) -> (Tr*O, 2m) @ (2m, W)
        mre = jnp.transpose(mixed[:, :, :o], (1, 2, 0)).reshape(tr * o, m)
        mim = jnp.transpose(mixed[:, :, o:], (1, 2, 0)).reshape(tr * o, m)
        mk = jnp.concatenate([mre, mim], axis=-1)        # (Tr*O, 2m)
        y = jnp.dot(mk.astype(cd), i2_ref[:].astype(cd),
                    preferred_element_type=jnp.float32)
        out_ref[:] = jnp.transpose(
            y.reshape(tr, o, w), (0, 2, 1)).astype(out_ref.dtype)

    return _kernel


def _pass_pallas(x, f2, i2, wpk, row_tile: int, interpret: bool, cd):
    """x (R, W, C) -> (R, W, O), all factor matrices f32."""
    r, w, c = x.shape
    o = wpk.shape[2] // 2
    tile = min(row_tile, r)
    pad = (-r) % tile
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    rp = x.shape[0]
    out = pl.pallas_call(
        _make_kernel(cd),
        grid=(rp // tile,),
        in_specs=[
            pl.BlockSpec((tile, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(f2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(i2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wpk.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, w, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rp, w, o), x.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, f2, i2, wpk)
    return out[:r]


@functools.lru_cache(maxsize=64)
def _packed_factors(n: int, m: int, norm: str):
    fc, fs, ic, is_ = _dft_matrices(n, m, norm)
    f2 = np.concatenate([fc, fs], axis=1)   # (W, 2m), cols (s, m)
    i2 = np.concatenate([ic, is_], axis=0)  # (2m, W), rows (t, m)
    return f2, i2


def pack_mix_weight(weight, m: int):
    """(C, O, n_modes, 2) real weight -> (m, 2C, 2O) packed real mix
    matrix: the complex product expanded as [[wr, wi], [-wi, wr]] with
    K rows ordered (s, c) and N cols ordered (t, o) — s/t-major so the
    kernel can assemble them by lane-concat. Differentiable (jnp ops)."""
    wr, wi = weight[:, :, :m, 0], weight[:, :, :m, 1]
    w5 = jnp.stack([jnp.stack([wr, wi], axis=2),
                    jnp.stack([-wi, wr], axis=2)], axis=2)  # (C,O,s,t,m)
    c, o = weight.shape[0], weight.shape[1]
    return jnp.transpose(w5, (4, 2, 0, 3, 1)).reshape(m, 2 * c, 2 * o)


@functools.lru_cache(maxsize=None)
def _make_op(n: int, m: int, norm: str, row_tile: int, interpret: bool,
             cd_name: str):
    f2_np, i2_np = _packed_factors(n, m, norm)
    cd = jnp.dtype(cd_name)

    @jax.custom_vjp
    def op(x, wpk):
        return _pass_pallas(x, jnp.asarray(f2_np), jnp.asarray(i2_np), wpk,
                            row_tile, interpret, cd)

    def op_fwd(x, wpk):
        return op(x, wpk), (x, wpk)

    def op_bwd(res, g):
        x, wpk = res
        # linear op: x-adjoint = same kernel, factors transposed, packed
        # weight transposed per mode
        dx = _pass_pallas(g, jnp.asarray(i2_np.T), jnp.asarray(f2_np.T),
                          jnp.transpose(wpk, (0, 2, 1)), row_tile,
                          interpret, cd)
        # packed-weight gradient: dwpk[m, k, n] = sum_r z[m, r, k] *
        # (I^T g)[m, r, n] — two DFT GEMMs + one batched contraction, all
        # small (R x 128 per mode)
        r, w, c = x.shape
        o = wpk.shape[2] // 2
        f2 = jnp.asarray(f2_np, x.dtype)
        i2t = jnp.asarray(i2_np.T, g.dtype)
        z = jnp.matmul(
            jnp.transpose(x, (0, 2, 1)).reshape(r * c, w), f2,
            preferred_element_type=jnp.float32)
        z = jnp.transpose(z.reshape(r, c, 2, m),
                          (3, 0, 2, 1)).reshape(m, r, 2 * c)  # (s, c) rows
        gs = jnp.matmul(
            jnp.transpose(g, (0, 2, 1)).reshape(r * o, w), i2t,
            preferred_element_type=jnp.float32)
        gs = jnp.transpose(gs.reshape(r, o, 2, m),
                           (3, 0, 2, 1)).reshape(m, r, 2 * o)  # (t, o)
        dwpk = jax.lax.dot_general(
            z.astype(cd), gs.astype(cd), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (m, 2C, 2O)
        return dx, dwpk.astype(wpk.dtype)

    op.defvjp(op_fwd, op_bwd)
    return op


def packed_spectral_mix_1d(x, weight, n_modes: int, fft_norm: str = "ortho",
                           row_tile: int = 256, interpret: bool = False,
                           compute_dtype=jnp.bfloat16):
    """One fused FFNO axis pass (v2). x: (R, W, C); weight (C, O, M, 2).
    Returns (R, W, O) in x's dtype. Differentiable; matches
    _dft_pass_last_axis_v3 (tests/test_pallas.py)."""
    n = x.shape[1]
    m = min(n_modes, n // 2 + 1)
    cd = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype
    op = _make_op(int(n), int(m), str(fft_norm), int(row_tile),
                  bool(interpret), jnp.dtype(cd).name)
    wpk = pack_mix_weight(weight, m)
    return op(x, wpk.astype(jnp.float32))


def factorized_spectral_conv_2d_pallas2(x, weight_y, weight_x, n_modes: int,
                                        fft_norm: str = "ortho",
                                        compute_dtype=jnp.bfloat16,
                                        interpret: bool = False):
    """Both FFNO axis passes through the fused v2 kernel.
    x: (B, H, W, C) channels-last -> (B, H, W, C)."""
    b, h, w_sz, c = x.shape
    yy = packed_spectral_mix_1d(
        x.reshape(b * h, w_sz, c), weight_y, n_modes, fft_norm,
        interpret=interpret,
        compute_dtype=compute_dtype).reshape(b, h, w_sz, c)
    xt = jnp.swapaxes(x, 1, 2).reshape(b * w_sz, h, c)
    xx = packed_spectral_mix_1d(
        xt, weight_x, n_modes, fft_norm, interpret=interpret,
        compute_dtype=compute_dtype).reshape(b, w_sz, h, c)
    return yy + jnp.swapaxes(xx, 1, 2)
