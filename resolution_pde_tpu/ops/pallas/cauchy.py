"""Cauchy reduction for the S4 DPLR kernel as a Pallas TPU kernel.

Computes the four Woodbury Cauchy sums of the DPLR generating function,

    k_t[h, l] = sum_n v_t[h, n] / (g[h, l] - Lambda[h, n]),  t = 0..3,

the reduction the reference offloads to CUDA extensions / pykeops Genred
(models/s4.py:73-94 cauchy_keops, :159-168 cauchy_naive). The jnp fallback
(ops/ssm.py cauchy) materializes an (H, L, N) complex broadcast in HBM;
here the (Th, N, Tl) products stay in VMEM per grid tile.

Complex arithmetic is decomposed into real/imag planes (complex
host<->device transfer is UNIMPLEMENTED on this backend and Mosaic's VPU
works on real lanes anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from resolution_pde_tpu.ops.ssm import cexp as ssm_cexp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(vr_ref, vi_ref, lr_ref, li_ref, gr_ref, gi_ref, outr_ref,
            outi_ref):
    """vr/vi: (4, Th, N); lr/li: (Th, N); gr/gi: (Th, Tl);
    outr/outi: (4, Th, Tl)."""
    lr = lr_ref[:][:, :, None]                 # (Th, N, 1)
    li = li_ref[:][:, :, None]
    gr = gr_ref[:][:, None, :]                 # (Th, 1, Tl)
    gi = gi_ref[:][:, None, :]
    dr = gr - lr                               # (Th, N, Tl)
    di = gi - li
    inv = 1.0 / (dr * dr + di * di)
    dr = dr * inv
    di = di * inv
    for t in range(4):
        vr = vr_ref[t][:, :, None]             # (Th, N, 1)
        vi = vi_ref[t][:, :, None]
        # (vr + i vi) * conj(d) * inv = (vr*dr + vi*di) + i(vi*dr - vr*di)
        outr_ref[t] = jnp.sum(vr * dr + vi * di, axis=1)
        outi_ref[t] = jnp.sum(vi * dr - vr * di, axis=1)


@functools.partial(jax.jit, static_argnames=("h_tile", "l_tile",
                                             "interpret"))
def cauchy_pallas(v, g, lambd, h_tile: int = 8, l_tile: int = 256,
                  interpret: bool = False):
    """v: (4, H, N) complex; g: (H, L) complex; lambd: (H, N) complex.
    Returns (4, H, L) complex64: sum_n v[t,h,n] / (g[h,l] - lambd[h,n])."""
    _, h, n = v.shape
    L = g.shape[-1]
    vr = jnp.real(v).astype(jnp.float32)
    vi = jnp.imag(v).astype(jnp.float32)
    lr = jnp.real(lambd).astype(jnp.float32)
    li = jnp.imag(lambd).astype(jnp.float32)
    gr = jnp.real(g).astype(jnp.float32)
    gi = jnp.imag(g).astype(jnp.float32)

    th = min(h_tile, h)
    tl = min(l_tile, L)
    h_pad = (th - h % th) % th
    l_pad = (tl - L % tl) % tl
    if h_pad or l_pad:
        vr = jnp.pad(vr, ((0, 0), (0, h_pad), (0, 0)))
        vi = jnp.pad(vi, ((0, 0), (0, h_pad), (0, 0)))
        lr = jnp.pad(lr, ((0, h_pad), (0, 0)), constant_values=1.0)
        li = jnp.pad(li, ((0, h_pad), (0, 0)))
        gr = jnp.pad(gr, ((0, h_pad), (0, l_pad)))
        gi = jnp.pad(gi, ((0, h_pad), (0, l_pad)))
    hp, lp = h + h_pad, L + l_pad

    outr, outi = pl.pallas_call(
        _kernel,
        grid=(hp // th, lp // tl),
        in_specs=[
            pl.BlockSpec((4, th, n), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, n), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, n), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, n), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tl), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tl), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((4, th, tl), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, th, tl), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((4, hp, lp), jnp.float32)] * 2,
        interpret=interpret,
    )(vr, vi, lr, li, gr, gi)
    return jax.lax.complex(outr[:, :h, :L], outi[:, :h, :L])


def dplr_kernel_pallas(Lambda, P, B, C_tilde, log_dt, L: int,
                       interpret: bool = False):
    """All-feature DPLR kernel with the Cauchy reductions on-chip.

    Lambda, P, B: (H, N) complex; C_tilde: (H, N) complex; log_dt: (H,).
    Returns (H, L) f32 — matches vmap(ops.ssm.dplr_kernel) bit-for-bit in
    f32 (tests/test_pallas.py)."""
    step = jnp.exp(log_dt)[:, None]            # (H, 1)
    omega = ssm_cexp(-2j * jnp.pi * jnp.arange(L) / L)[None, :]
    g = (2.0 / step) * ((1.0 - omega) / (1.0 + omega))    # (H, L)
    c = 2.0 / (1.0 + omega)                               # (1, L)

    a0, a1 = jnp.conj(C_tilde), jnp.conj(P)
    b0, b1 = B, P
    v = jnp.stack([a0 * b0, a0 * b1, a1 * b0, a1 * b1])   # (4, H, N)
    k = cauchy_pallas(v, g, Lambda, interpret=interpret)
    k00, k01, k10, k11 = k[0], k[1], k[2], k[3]
    at_roots = c * (k00 - k01 * (1.0 / (1.0 + k11)) * k10)
    return jnp.real(jnp.fft.ifft(at_roots, L, axis=-1))
