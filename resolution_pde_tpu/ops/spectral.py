"""Spectral convolutions: the core FNO/FFNO ops.

Parity targets in the reference:
  - SpectralConv1d: models/spectral_convolution.py:24-55
      rfft -> complex einsum over the first `modes` frequencies -> zero-pad
      -> irfft(n=X), default ('backward') FFT norm.
  - SpectralConv2d: models/spectral_convolution.py:61-98
      rfft2 with two weight blocks multiplying the low (+) and high (-)
      frequency corners along the first spatial axis.
  - FSpectralConv1d/2d (FFNO): models/spectral_convolution.py:108-318
      per-axis rfft with norm='ortho' and resolution-adaptive
      ``effective_modes = min(n_modes, available_modes)`` weight slicing --
      the property that lets one weight set serve any resolution. Shapes are
      static under jit, so the slice is resolved at trace time and each
      resolution bucket gets its own compiled program.

TPU design notes:
  - FFTs lower to XLA's FFT op; the mode-truncated contraction is expressed
    as an einsum so XLA maps it onto the MXU (complex matmul decomposes into
    four real matmuls).
  - Weights are stored as real arrays with a trailing dim of 2 (real, imag),
    like the reference's FFNO storage, to keep optimizers real-valued.
  - A fused Pallas path for the truncated contraction lives in
    resolution_pde_tpu.ops.pallas and is selected via `use_pallas`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def as_complex(w):
    """View a real array with trailing dim 2 as complex (torch.view_as_complex)."""
    return jax.lax.complex(w[..., 0], w[..., 1])


def _mode_matmul(x_ft, w_pair, subscript):
    """Complex contraction over the channel axis on a truncated spectrum.

    Decomposed into four real einsums ((a+bi)(c+di) = (ac-bd) + (ad+bc)i):
    complex dots are not universally lowered on TPU backends, and explicit
    real contractions land directly on the MXU with f32 accumulation.
    Precision HIGHEST keeps true-f32 multiplies (TPU einsums otherwise use
    bf16 passes, ~1e-3 relative error — too loose for the eval parity
    targets). w_pair is the real storage (..., 2) = (re, im).
    """
    xr, xi = jnp.real(x_ft), jnp.imag(x_ft)
    wr, wi = w_pair[..., 0], w_pair[..., 1]
    hi = jax.lax.Precision.HIGHEST
    out_r = (jnp.einsum(subscript, xr, wr, precision=hi)
             - jnp.einsum(subscript, xi, wi, precision=hi))
    out_i = (jnp.einsum(subscript, xr, wi, precision=hi)
             + jnp.einsum(subscript, xi, wr, precision=hi))
    return jax.lax.complex(out_r, out_i)


def _irfft_safe(spec, n, axis, norm="backward"):
    """irfft with an optimization barrier on the input.

    Some TPU backends MISCOMPILE the fused pad->irfft pattern at large batch
    (observed: ~0.75 absolute error at (2048, 64, 129)->256 on v5e/axon,
    while the isolated irfft is exact). The barrier prevents the bad fusion;
    cost is negligible. Verified by tests/test_spectral.py parity suites
    (CPU) and TPU spot checks.
    """
    spec = jax.lax.optimization_barrier(spec)
    return jnp.fft.irfft(spec, n=n, axis=axis, norm=norm)


def spectral_conv_1d(x, weights, modes: int):
    """Full 1D spectral conv (FNO). x: (B, C_in, X) real; weights:
    (C_in, C_out, modes, 2) real-as-complex. Returns (B, C_out, X).

    Matches models/spectral_convolution.py:38-55 with backward-norm FFT.
    """
    n = x.shape[-1]
    n_freq = n // 2 + 1
    if modes > n_freq:
        raise ValueError(f"modes={modes} exceeds available frequencies {n_freq}")
    x_ft = jnp.fft.rfft(x, axis=-1)
    out_ft = _mode_matmul(x_ft[:, :, :modes], weights, "bix,iox->box")
    out_ft = jnp.pad(out_ft, ((0, 0), (0, 0), (0, n_freq - modes)))
    return _irfft_safe(out_ft, n=n, axis=-1)


def spectral_conv_2d(x, weights1, weights2, modes1: int, modes2: int):
    """Full 2D spectral conv (FNO). x: (B, C_in, H, W) real; weights{1,2}:
    (C_in, C_out, modes1, modes2, 2). Returns (B, C_out, H, W).

    weights1 multiplies the low-frequency corner [:modes1, :modes2]; weights2
    the high-frequency corner [-modes1:, :modes2] along the first spatial
    axis (models/spectral_convolution.py:85-97).
    """
    h, w_sz = x.shape[-2], x.shape[-1]
    n_freq = w_sz // 2 + 1
    # the two first-axis corner blocks ([:modes1] and [-modes1:]) must not
    # overlap, so 2*modes1 <= h (not the rfft length h//2+1)
    if 2 * modes1 > h or modes2 > n_freq:
        raise ValueError(
            f"modes ({modes1},{modes2}) exceed spectrum ({h // 2},{n_freq})"
        )
    x_ft = jnp.fft.rfft2(x, axes=(-2, -1))
    lo = _mode_matmul(x_ft[:, :, :modes1, :modes2], weights1, "bixy,ioxy->boxy")
    hi = _mode_matmul(x_ft[:, :, -modes1:, :modes2], weights2, "bixy,ioxy->boxy")
    b, c_out = lo.shape[0], lo.shape[1]
    mid = jnp.zeros((b, c_out, h - 2 * modes1, modes2), dtype=lo.dtype)
    left = jnp.concatenate([lo, mid, hi], axis=2)  # (B, O, H, modes2)
    out_ft = jnp.pad(left, ((0, 0), (0, 0), (0, 0), (0, n_freq - modes2)))
    out_ft = jax.lax.optimization_barrier(out_ft)
    return jnp.fft.irfft2(out_ft, s=(h, w_sz), axes=(-2, -1))


def factorized_spectral_conv_1d(x, weight, n_modes: int, fft_norm: str = "ortho"):
    """Factorized 1D spectral conv (FFNO), channels-last.

    x: (B, X, C) real; weight: (C, C, n_modes, 2). Returns (B, X, C).
    Resolution-adaptive: uses min(n_modes, X//2+1) modes with the weight
    sliced to match (models/spectral_convolution.py:183-196).
    """
    n = x.shape[-2]
    n_freq = n // 2 + 1
    m = min(n_modes, n_freq)
    xc = jnp.swapaxes(x, -1, -2)  # (B, C, X)
    x_ft = jnp.fft.rfft(xc, axis=-1, norm=fft_norm)
    out_ft = _mode_matmul(x_ft[:, :, :m], weight[:, :, :m], "bix,iox->box")
    out_ft = jnp.pad(out_ft, ((0, 0), (0, 0), (0, n_freq - m)))
    out = _irfft_safe(out_ft, n=n, axis=-1, norm=fft_norm)
    return jnp.swapaxes(out, -1, -2)


def factorized_spectral_conv_2d(x, weight_y, weight_x, n_modes: int,
                                fft_norm: str = "ortho"):
    """Factorized 2D spectral conv (FFNO), channels-last.

    x: (B, H, W, C) real; weight_y/weight_x: (C, C, n_modes, 2).
    Performs independent 1D spectral passes along each spatial axis and sums
    the results in physical space (models/spectral_convolution.py:256-318).
    Each axis uses min(n_modes, axis_freqs) modes.
    """
    h, w_sz = x.shape[-3], x.shape[-2]
    xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)

    # --- y (last) axis pass ---
    n_freq_y = w_sz // 2 + 1
    m_y = min(n_modes, n_freq_y)
    x_fty = jnp.fft.rfft(xc, axis=-1, norm=fft_norm)
    out_y = _mode_matmul(x_fty[:, :, :, :m_y], weight_y[:, :, :m_y], "bixy,ioy->boxy")
    out_y = jnp.pad(out_y, ((0, 0), (0, 0), (0, 0), (0, n_freq_y - m_y)))
    yy = _irfft_safe(out_y, n=w_sz, axis=-1, norm=fft_norm)

    # --- x (second-to-last) axis pass ---
    n_freq_x = h // 2 + 1
    m_x = min(n_modes, n_freq_x)
    x_ftx = jnp.fft.rfft(xc, axis=-2, norm=fft_norm)
    out_x = _mode_matmul(x_ftx[:, :, :m_x, :], weight_x[:, :, :m_x], "bixy,iox->boxy")
    out_x = jnp.pad(out_x, ((0, 0), (0, 0), (0, n_freq_x - m_x), (0, 0)))
    xx = _irfft_safe(out_x, n=h, axis=-2, norm=fft_norm)

    return jnp.moveaxis(xx + yy, 1, -1)


# ---------------------------------------------------------------------------
# Truncated-DFT matmul path (TPU fast path for the factorized conv)
# ---------------------------------------------------------------------------
#
# The FFT path materializes the FULL spectrum (W//2+1 bins) in HBM, slices
# m modes, zero-pads back, and inverse-transforms — on TPU the train step is
# bandwidth-bound on exactly those intermediates. Since only m modes carry
# weights, the truncated transform IS a (W, m) matmul, and the zero-padded
# inverse IS an (m, W) matmul: three MXU GEMMs with no full-spectrum
# round-trip. Numerically identical to the FFT path (see
# tests/test_spectral.py::test_dft_path_matches_fft_path); optionally runs
# the GEMMs in bfloat16 with f32 accumulation for training.

import functools
import numpy as np


@functools.lru_cache(maxsize=64)
def _dft_matrices(n: int, m: int, norm: str):
    """Forward truncated rfft factors (n, m) and conjugate-weighted inverse
    factors (m, n), as numpy float32 (cos, sin, inv_cos, inv_sin)."""
    k = np.arange(m)[None, :]
    w = np.arange(n)[:, None]
    ang = 2.0 * np.pi * w * k / n
    scale = 1.0 / np.sqrt(n) if norm == "ortho" else 1.0
    fwd_cos = (np.cos(ang) * scale).astype(np.float32)         # (n, m)
    fwd_sin = (-np.sin(ang) * scale).astype(np.float32)        # (n, m)
    # inverse with hermitian-symmetry weights
    weights = np.full(m, 2.0)
    weights[0] = 1.0
    if m == n // 2 + 1 and n % 2 == 0:
        weights[-1] = 1.0
    iscale = 1.0 / np.sqrt(n) if norm == "ortho" else 1.0 / n
    inv_cos = (weights[:, None] * np.cos(ang.T) * iscale).astype(np.float32)
    inv_sin = (-weights[:, None] * np.sin(ang.T) * iscale).astype(np.float32)
    return fwd_cos, fwd_sin, inv_cos, inv_sin


def _gemm(a, b, dtype):
    if dtype is not None:
        a = a.astype(dtype)
        b = b.astype(dtype)
        return jnp.matmul(a, b, preferred_element_type=jnp.float32)
    # f32-exact multiplies (TPU default would use bf16 passes)
    return jnp.matmul(a, b, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def factorized_spectral_conv_2d_dft(x, weight_y, weight_x, n_modes: int,
                                    fft_norm: str = "ortho",
                                    gemm_dtype=None):
    """MXU fast path for factorized_spectral_conv_2d: truncated DFTs as
    matmuls. x: (B, H, W, C) channels-last; returns (B, H, W, C).

    gemm_dtype: None keeps f32 GEMMs (numerically matches the FFT path to
    roundoff); jnp.bfloat16 halves bandwidth/doubles MXU rate for training.
    """
    b, h, w_sz, c = x.shape
    xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)

    def store(z):
        # keep truncated-spectrum intermediates in the gemm dtype: halves
        # the HBM traffic between the three GEMM stages in training mode
        return z.astype(gemm_dtype) if gemm_dtype is not None else z

    # ---- y (last axis) pass: contract W -> m_y modes ----
    m_y = min(n_modes, w_sz // 2 + 1)
    fc, fs, ic, is_ = (jnp.asarray(a) for a in
                       _dft_matrices(w_sz, m_y, fft_norm))
    zr = store(_gemm(xc, fc, gemm_dtype))               # (B, C, H, m)
    zi = store(_gemm(xc, fs, gemm_dtype))
    wyr, wyi = weight_y[:, :, :m_y, 0], weight_y[:, :, :m_y, 1]
    prec = (None if gemm_dtype is not None else jax.lax.Precision.HIGHEST)
    or_ = (jnp.einsum("bixm,iom->boxm", zr, wyr,
                      preferred_element_type=jnp.float32, precision=prec)
           - jnp.einsum("bixm,iom->boxm", zi, wyi,
                        preferred_element_type=jnp.float32, precision=prec))
    oi = (jnp.einsum("bixm,iom->boxm", zr, wyi,
                     preferred_element_type=jnp.float32, precision=prec)
          + jnp.einsum("bixm,iom->boxm", zi, wyr,
                       preferred_element_type=jnp.float32, precision=prec))
    yy = (_gemm(store(or_), ic, gemm_dtype)
          + _gemm(store(oi), is_, gemm_dtype))  # (B, C, H, W)

    # ---- x (second-to-last axis) pass: contract H -> m_x modes ----
    m_x = min(n_modes, h // 2 + 1)
    fc, fs, ic, is_ = (jnp.asarray(a) for a in
                       _dft_matrices(h, m_x, fft_norm))
    # contract over H (axis 2): 'bihw,hm->bimw'
    dt = gemm_dtype
    prec = (None if dt is not None else jax.lax.Precision.HIGHEST)
    def cast(a):
        return a.astype(dt) if dt is not None else a
    zr = store(jnp.einsum("bihw,hm->bimw", cast(xc), cast(fc),
                          preferred_element_type=jnp.float32,
                          precision=prec))
    zi = store(jnp.einsum("bihw,hm->bimw", cast(xc), cast(fs),
                          preferred_element_type=jnp.float32,
                          precision=prec))
    wxr, wxi = weight_x[:, :, :m_x, 0], weight_x[:, :, :m_x, 1]
    or_ = (jnp.einsum("bimw,iom->bomw", zr, wxr,
                      preferred_element_type=jnp.float32, precision=prec)
           - jnp.einsum("bimw,iom->bomw", zi, wxi,
                        preferred_element_type=jnp.float32, precision=prec))
    oi = (jnp.einsum("bimw,iom->bomw", zr, wxi,
                     preferred_element_type=jnp.float32, precision=prec)
          + jnp.einsum("bimw,iom->bomw", zi, wxr,
                       preferred_element_type=jnp.float32, precision=prec))
    xx = (jnp.einsum("bomw,mh->bohw", cast(store(or_)), cast(ic),
                     preferred_element_type=jnp.float32, precision=prec)
          + jnp.einsum("bomw,mh->bohw", cast(store(oi)), cast(is_),
                       preferred_element_type=jnp.float32, precision=prec))

    return jnp.moveaxis(xx + yy, 1, -1)


def _dft_pass_last_axis(xc, weight, n_modes: int, fft_norm: str,
                        gemm_dtype):
    """One spectral pass along the LAST axis of (B, C, R, W) via truncated
    DFT GEMMs. Returns (B, C, R, W)."""
    w_sz = xc.shape[-1]
    m = min(n_modes, w_sz // 2 + 1)
    fc, fs, ic, is_ = (jnp.asarray(a) for a in
                       _dft_matrices(w_sz, m, fft_norm))
    prec = (None if gemm_dtype is not None else jax.lax.Precision.HIGHEST)
    zr = _gemm(xc, fc, gemm_dtype)
    zi = _gemm(xc, fs, gemm_dtype)
    wr, wi = weight[:, :, :m, 0], weight[:, :, :m, 1]
    or_ = (jnp.einsum("bixm,iom->boxm", zr, wr,
                      preferred_element_type=jnp.float32, precision=prec)
           - jnp.einsum("bixm,iom->boxm", zi, wi,
                        preferred_element_type=jnp.float32, precision=prec))
    oi = (jnp.einsum("bixm,iom->boxm", zr, wi,
                     preferred_element_type=jnp.float32, precision=prec)
          + jnp.einsum("bixm,iom->boxm", zi, wr,
                       preferred_element_type=jnp.float32, precision=prec))
    return _gemm(or_, ic, gemm_dtype) + _gemm(oi, is_, gemm_dtype)


def factorized_spectral_conv_2d_dft_v2(x, weight_y, weight_x, n_modes: int,
                                       fft_norm: str = "ortho",
                                       gemm_dtype=None):
    """Variant of the DFT path doing BOTH axis passes as last-axis GEMMs
    with an explicit transpose for the x pass (instead of middle-axis
    einsums). Same numerics; kept for per-hardware selection."""
    xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    yy = _dft_pass_last_axis(xc, weight_y, n_modes, fft_norm, gemm_dtype)
    xt = jnp.swapaxes(xc, -1, -2)  # (B, C, W, H)
    xx = _dft_pass_last_axis(xt, weight_x, n_modes, fft_norm, gemm_dtype)
    xx = jnp.swapaxes(xx, -1, -2)
    return jnp.moveaxis(xx + yy, 1, -1)


def _dft_pass_last_axis_v3(xc, weight, n_modes: int, fft_norm: str,
                           gemm_dtype, store_dtype=None):
    """One spectral pass along the LAST axis of (B, C, R, W) with the
    re/im parts packed into single GEMMs:

      forward : xc @ [fc | fs]            (W, 2m)   one GEMM, N = 2m
      mix     : einsum over (channel, re/im)        contraction K = 2C
      inverse : packed spectrum @ [ic ; is] (2m, W) one GEMM, K = 2m

    3 MXU launches instead of 10 and contraction dims of 128/256 instead
    of 64 — same math as _dft_pass_last_axis (complex product expanded
    into the 2x2 real block [[wr, wi], [-wi, wr]]).

    store_dtype: when set (bf16 training path), intermediate GEMM outputs
    are cast AT THE PRODUCER so the HBM-resident spectrum buffers (and
    their backward cotangents) are bf16 rather than f32 — the forward
    numerics are bitwise identical to the consumer-side cast (the next
    GEMM read the same bf16 values either way); only the buffer dtype —
    and therefore HBM traffic on a bandwidth-bound stage — changes."""
    b, c, r, w_sz = xc.shape
    m = min(n_modes, w_sz // 2 + 1)
    fc, fs, ic, is_ = (jnp.asarray(a) for a in
                       _dft_matrices(w_sz, m, fft_norm))
    prec = (None if gemm_dtype is not None else jax.lax.Precision.HIGHEST)

    def cast(a):
        return a.astype(gemm_dtype) if gemm_dtype is not None else a

    def store(a):
        return a.astype(store_dtype) if store_dtype is not None else a

    f2 = jnp.concatenate([fc, fs], axis=1)        # (W, 2m): [re | im]
    i2 = jnp.concatenate([ic, is_], axis=0)       # (2m, W): [re ; im]

    z = store(jnp.matmul(cast(xc), cast(f2),
                         preferred_element_type=jnp.float32,
                         precision=prec))         # (B, C, R, 2m)
    z = z.reshape(b, c, r, 2, m)                  # s in {re, im}

    wr, wi = weight[:, :, :m, 0], weight[:, :, :m, 1]
    # W5[i, o, s, t, m]: out_t = sum_s z_s * W5[..., s, t, :]
    w5 = jnp.stack([jnp.stack([wr, wi], axis=2),
                    jnp.stack([-wi, wr], axis=2)], axis=2)
    # (C, O, s, t, m)
    out = store(jnp.einsum("bihsm,iostm->bohtm", cast(z), cast(w5),
                           preferred_element_type=jnp.float32,
                           precision=prec))
    out = out.reshape(b, wr.shape[1], r, 2 * m)
    return jnp.matmul(cast(out), cast(i2),
                      preferred_element_type=jnp.float32, precision=prec)


def factorized_spectral_conv_2d_dft_v3(x, weight_y, weight_x, n_modes: int,
                                       fft_norm: str = "ortho",
                                       gemm_dtype=None, store_dtype=None):
    """Packed-complex variant of the truncated-DFT factorized conv
    (see _dft_pass_last_axis_v3). Numerics match the fft/dft paths.
    store_dtype=bf16 ('dft_v3s' in FFNO) keeps the HBM-resident spectrum
    intermediates bf16 — forward-identical to gemm_dtype=bf16 alone."""
    xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    yy = _dft_pass_last_axis_v3(xc, weight_y, n_modes, fft_norm, gemm_dtype,
                                store_dtype)
    xt = jnp.swapaxes(xc, -1, -2)
    xx = _dft_pass_last_axis_v3(xt, weight_x, n_modes, fft_norm, gemm_dtype,
                                store_dtype)
    xx = jnp.swapaxes(xx, -1, -2)
    return jnp.moveaxis(xx + yy, 1, -1)


@functools.lru_cache(maxsize=64)
def _dft_fold_matrices(n: int, m: int, norm: str):
    """Half-size DFT factors exploiting the real-input cos/sin symmetry.

    Forward: for real x, z[k] = sum_w x_w e^(-i a w k) splits into an even
    part (cos, w and n-w fold with +) and an odd part (sin, fold with -),
    so the (n, 2m) forward GEMM becomes (n/2+1, m) + (n/2-1, m) — half the
    MACs. Inverse: y_w and y_{n-w} share the same cos/sin rows up to sign,
    so the (2m, n) inverse GEMM becomes two (m, n/2+1) halves recombined by
    a cheap concat. Requires even n.
    """
    assert n % 2 == 0
    h = n // 2
    k = np.arange(m)[None, :]
    scale = 1.0 / np.sqrt(n) if norm == "ortho" else 1.0
    we = np.arange(h + 1)[:, None]          # even-part rows 0..n/2
    wo = np.arange(1, h)[:, None]           # odd-part rows 1..n/2-1
    fwd_cos_h = (np.cos(2 * np.pi * we * k / n) * scale).astype(np.float32)
    fwd_sin_h = (-np.sin(2 * np.pi * wo * k / n) * scale).astype(np.float32)
    # inverse halves: u = re @ inv_cos_h, v = im @ inv_sin_h;
    # y[w] = u+v (w<=n/2), y[n-w] = (u-v)[w] (1<=w<n/2)
    weights = np.full(m, 2.0)
    weights[0] = 1.0
    if m == h + 1:
        weights[-1] = 1.0
    iscale = 1.0 / np.sqrt(n) if norm == "ortho" else 1.0 / n
    ang_h = 2 * np.pi * k.T * np.arange(h + 1)[None, :] / n   # (m, n/2+1)
    inv_cos_h = (weights[:, None] * np.cos(ang_h) * iscale).astype(np.float32)
    inv_sin_h = (-weights[:, None] * np.sin(ang_h) * iscale).astype(np.float32)
    return fwd_cos_h, fwd_sin_h, inv_cos_h, inv_sin_h


def _dft_pass_last_axis_v4(xc, weight, n_modes: int, fft_norm: str,
                           gemm_dtype):
    """Folded-symmetry variant of _dft_pass_last_axis_v3: half the forward
    and inverse transform MACs via the real-input even/odd fold. The mode
    mix is identical to v3 (packed re/im contraction, K = 2C)."""
    b, c, r, w_sz = xc.shape
    m = min(n_modes, w_sz // 2 + 1)
    if w_sz % 2:
        return _dft_pass_last_axis_v3(xc, weight, n_modes, fft_norm,
                                      gemm_dtype)
    h = w_sz // 2
    fch, fsh, ich, ish = (jnp.asarray(a) for a in
                          _dft_fold_matrices(w_sz, m, fft_norm))
    prec = (None if gemm_dtype is not None else jax.lax.Precision.HIGHEST)

    def cast(a):
        return a.astype(gemm_dtype) if gemm_dtype is not None else a

    # fold: e_w = x_w + x_{n-w} (w=1..h-1) with e_0, e_h passthrough;
    #       o_w = x_w - x_{n-w}
    head = xc[..., 1:h]
    tail = xc[..., :h:-1]            # x_{n-1}..x_{h+1}  <-> w=1..h-1
    e = jnp.concatenate([xc[..., :1], head + tail, xc[..., h:h + 1]], -1)
    o = head - tail
    zre = jnp.matmul(cast(e), cast(fch),
                     preferred_element_type=jnp.float32, precision=prec)
    zim = jnp.matmul(cast(o), cast(fsh),
                     preferred_element_type=jnp.float32, precision=prec)
    z = jnp.stack([zre, zim], axis=-2)        # (B, C, R, 2, m)

    wr, wi = weight[:, :, :m, 0], weight[:, :, :m, 1]
    w5 = jnp.stack([jnp.stack([wr, wi], axis=2),
                    jnp.stack([-wi, wr], axis=2)], axis=2)
    out = jnp.einsum("bihsm,iostm->bohtm", cast(z), cast(w5),
                     preferred_element_type=jnp.float32, precision=prec)

    u = jnp.matmul(cast(out[..., 0, :]), cast(ich),
                   preferred_element_type=jnp.float32, precision=prec)
    v = jnp.matmul(cast(out[..., 1, :]), cast(ish),
                   preferred_element_type=jnp.float32, precision=prec)
    lo = u + v                                 # y_w, w = 0..h
    hi = (u - v)[..., h - 1:0:-1]              # y_{n-w} for w = h-1..1
    return jnp.concatenate([lo, hi], axis=-1)


def factorized_spectral_conv_2d_dft_v4(x, weight_y, weight_x, n_modes: int,
                                       fft_norm: str = "ortho",
                                       gemm_dtype=None):
    """Folded-symmetry packed-complex truncated-DFT factorized conv: the
    forward transform runs at half the MACs of dft_v3 (even/odd fold) and
    the inverse at half via output-symmetry recombination. Numerics match
    the fft/dft/dft_v3 paths (tests/test_spectral.py)."""
    xc = jnp.moveaxis(x, -1, 1)  # (B, C, H, W)
    yy = _dft_pass_last_axis_v4(xc, weight_y, n_modes, fft_norm, gemm_dtype)
    xt = jnp.swapaxes(xc, -1, -2)
    xx = _dft_pass_last_axis_v4(xt, weight_x, n_modes, fft_norm, gemm_dtype)
    xx = jnp.swapaxes(xx, -1, -2)
    return jnp.moveaxis(xx + yy, 1, -1)


def _dft_pass_axis_v5(x, weight, axis: int, n_modes: int, fft_norm: str,
                      gemm_dtype, store_dtype=None):
    """One spectral pass along `axis` (1 = H, 2 = W) of CHANNELS-LAST
    (B, H, W, C), with no spatial-minor relayouts: every contraction is
    an einsum whose requested output order IS dot_general's natural
    (batch, lhs_free, rhs_free) order, so nothing forces XLA to
    materialize a transposed copy of an activation-sized tensor.

    Motivation (probe14_other.py on the chip): the v3 formulation's
    moveaxis/swapaxes chain costs ~4-5 ms/step of {1,2,3,0}/{2,1,3,0}
    layout copies around the spectral GEMMs — attributed to "other"
    because copies carry no scope metadata. Here the factor matrices are
    packed host-side in the orders the CHAIN consumes:

      fwd  : 'nms,bnrc->msbrc'   f5 (n, m, s)    [s = re/im]
      mix  : 'msbri,msiot->mbrot' w5 (m, s, i, o, t)
      inv  : 'mtn,mbrot->nbro'   i5 (m, t, n)

    leaving one coarse block-permute per pass at the very end
    ((n, b, r, c) -> (b, ..., c)) that XLA can fold into the following
    add/FF boundary. Same math as _dft_pass_last_axis_v3 (complex
    product as the 2x2 real block); numerics match the fft path.
    """
    n = x.shape[axis]
    m = min(n_modes, n // 2 + 1)
    fc, fs, ic, is_ = (jnp.asarray(a) for a in
                       _dft_matrices(n, m, fft_norm))
    prec = (None if gemm_dtype is not None else jax.lax.Precision.HIGHEST)

    def cast(a):
        return a.astype(gemm_dtype) if gemm_dtype is not None else a

    def store(a):
        return a.astype(store_dtype) if store_dtype is not None else a

    f5 = jnp.stack([fc, fs], axis=2)          # (n, m, s)
    i5 = jnp.stack([ic, is_], axis=1)         # (m, t, n)
    wr, wi = weight[:, :, :m, 0], weight[:, :, :m, 1]
    # (i, o, s, t, m) as in v3, host-reordered to (m, s, i, o, t)
    w5 = jnp.stack([jnp.stack([wr, wi], axis=2),
                    jnp.stack([-wi, wr], axis=2)], axis=2)
    w5 = jnp.transpose(w5, (4, 2, 0, 1, 3))

    spec = "bnrc" if axis == 1 else "brnc"
    z = store(jnp.einsum(f"nms,{spec}->msbrc", cast(f5), cast(x),
                         preferred_element_type=jnp.float32,
                         precision=prec))
    out = store(jnp.einsum("msbri,msiot->mbrot", cast(z), cast(w5),
                           preferred_element_type=jnp.float32,
                           precision=prec))
    y = jnp.einsum("mtn,mbrot->nbro", cast(i5), cast(out),
                   preferred_element_type=jnp.float32, precision=prec)
    # (n, b, r, c) -> channels-last with n back at `axis`
    return jnp.transpose(y, (1, 0, 2, 3) if axis == 1 else (1, 2, 0, 3))


def factorized_spectral_conv_2d_dft_v5(x, weight_y, weight_x, n_modes: int,
                                       fft_norm: str = "ortho",
                                       gemm_dtype=None, store_dtype=None):
    """Transpose-free packed-complex truncated-DFT factorized conv: both
    axis passes run directly on the channels-last activation (see
    _dft_pass_axis_v5). Numerics match the fft/dft/dft_v3 paths
    (tests/test_spectral.py); reference semantics per
    models/spectral_convolution.py:256-313."""
    # weight pairing matches dft_v3: weight_y transforms along W (the
    # last axis of its (B,C,H,W) view), weight_x along H.
    yy = _dft_pass_axis_v5(x, weight_y, 2, n_modes, fft_norm, gemm_dtype,
                           store_dtype)
    xx = _dft_pass_axis_v5(x, weight_x, 1, n_modes, fft_norm, gemm_dtype,
                           store_dtype)
    return yy + xx


def factorized_spectral_conv_2d_pallas(x, weight_y, weight_x, n_modes: int,
                                       fft_norm: str = "ortho",
                                       interpret: bool = False):
    """Both FFNO axis passes through the fused Pallas kernel
    (ops/pallas/spectral_mix.py): per row tile, the truncated spectrum
    never leaves VMEM. f32-exact (Precision.HIGHEST inside the kernel).
    Model-level f32 eval at the bench shape (probe #9): fft 100 ms,
    THIS 74 ms, dft 57 ms, dft_v3 57 ms — so dft_v3 is the preferred
    f32-exact path and the bf16 training fast path; this kernel is kept
    as the VMEM-resident alternative (wins when HBM is contended) and as
    the differentiable fused-spectral building block.

    x: (B, H, W, C) channels-last; returns (B, H, W, C)."""
    from resolution_pde_tpu.ops.pallas.spectral_mix import (
        truncated_spectral_mix_1d)

    b, h, w_sz, c = x.shape
    # y pass: rows are (B*H) slices along W
    yy = truncated_spectral_mix_1d(
        x.reshape(b * h, w_sz, c), weight_y, n_modes, fft_norm,
        interpret=interpret).reshape(b, h, w_sz, c)
    # x pass: rows are (B*W) slices along H
    xt = jnp.swapaxes(x, 1, 2).reshape(b * w_sz, h, c)
    xx = truncated_spectral_mix_1d(
        xt, weight_x, n_modes, fft_norm,
        interpret=interpret).reshape(b, w_sz, h, c)
    xx = jnp.swapaxes(xx, 1, 2)
    return yy + xx
