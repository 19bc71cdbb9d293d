"""State-space model kernels: HiPPO initialization, S4D (diagonal) and S4
(DPLR) convolution-kernel computation, discretization for recurrent mode.

Parity targets:
  - S4D kernel: models/s4d.py:33-69 (ZOH-discretized diagonal SSM,
    Vandermonde contraction K = 2 Re[ (C (e^{dtA}-1)/A) e^{dtA l} ]).
  - S4 DPLR kernel: models/s4.py:1234-1447 (SSMKernelDPLR) — computed via
    the bilinear generating function at the roots of unity with four Cauchy
    contractions and a Woodbury correction.
  - HiPPO-LegS NPLR/DPLR init: models/s4.py:310-500 (transition/nplr/dplr).
  - Recurrent step setup: models/s4.py:1190-1218, 1787-1807.
  - The reference's CUDA/pykeops Cauchy+Vandermonde kernels (models/s4.py:
    46-149) are replaced by jnp contractions that XLA fuses on TPU; the
    reductions are materialization-free after fusion (f32 accumulation on
    the MXU/VPU).

All functions operate per-feature (vmap over H happens in the model layer).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Parameter transforms (models/s4.py:635-664)
# ---------------------------------------------------------------------------

PARAM_TRANSFORMS = ("none", "exp", "relu", "sigmoid", "softplus")


def cexp(z):
    """exp for complex arrays via real decomposition.

    The tunnel TPU backend dropped complex-exp lowering in a round-5
    update (jnp.exp(complex64) in-jit -> UNIMPLEMENTED) while real
    exp/cos/sin and complex mul/div still compile. exp(a+bi) =
    e^a (cos b + i sin b) is the same math XLA would emit."""
    if not jnp.iscomplexobj(z):
        return jnp.exp(z)
    e = jnp.exp(jnp.real(z))
    im = jnp.imag(z)
    return jax.lax.complex(e * jnp.cos(im), e * jnp.sin(im))


def clog(z):
    """log for complex arrays via real decomposition (see cexp):
    log z = log|z| + i atan2(Im z, Re z)."""
    if not jnp.iscomplexobj(z):
        return jnp.log(z)
    re, im = jnp.real(z), jnp.imag(z)
    return jax.lax.complex(0.5 * jnp.log(re * re + im * im),
                           jnp.arctan2(im, re))


def param_transform(x, kind: str = "none"):
    """Positive-parameter transform (models/s4.py:650-664). jnp-traceable."""
    if kind == "none":
        return x
    if kind == "exp":
        return jnp.exp(x)
    if kind == "relu":
        # the reference adds 1e-4 to avoid exact zeros (models/s4.py:658)
        return jax.nn.relu(x) + 1e-4
    if kind == "sigmoid":
        return jax.nn.sigmoid(x)
    if kind == "softplus":
        return jax.nn.softplus(x)
    raise ValueError(f"unknown transform {kind!r}; one of {PARAM_TRANSFORMS}")


def inv_param_transform(x: np.ndarray, kind: str = "none") -> np.ndarray:
    """Inverse transform for initialization (models/s4.py:635-648); clamps
    the positive value at 1e-4 first, exactly like the reference (this is
    what keeps the fourier measure's zero real parts finite)."""
    x = np.maximum(np.asarray(x, np.float64), 1e-4)
    if kind in ("none", "relu"):
        return x
    if kind == "exp":
        return np.log(x)
    if kind == "sigmoid":
        return np.log(x / (1.0 - x))
    if kind == "softplus":
        return np.log(np.expm1(x))
    raise ValueError(f"unknown transform {kind!r}; one of {PARAM_TRANSFORMS}")


def inv_param_transform_jnp(x, kind: str = "none"):
    """Traced variant of inv_param_transform for use inside jitted param
    initializers (the dt init draws from a traced rng). Same 1e-4 clamp."""
    x = jnp.maximum(x, 1e-4)
    if kind in ("none", "relu"):
        return x
    if kind == "exp":
        return jnp.log(x)
    if kind == "sigmoid":
        return jnp.log(x / (1.0 - x))
    if kind == "softplus":
        return jnp.log(jnp.expm1(x))
    raise ValueError(f"unknown transform {kind!r}; one of {PARAM_TRANSFORMS}")


# ---------------------------------------------------------------------------
# HiPPO initialization
# ---------------------------------------------------------------------------

def hippo_legs_matrix(n: int) -> np.ndarray:
    """HiPPO-LegS transition matrix -A (models/s4.py:310 transition())."""
    q = np.arange(n, dtype=np.float64)
    col, row = np.meshgrid(q, q)
    r = 2 * q + 1
    m = -(np.where(row >= col, r, 0) - np.diag(q))
    t = np.sqrt(np.diag(2 * q + 1))
    return t @ m @ np.linalg.inv(t)


def _conj_pair_perm(n: int) -> np.ndarray:
    """Permutation taking an eigh-ASCENDING-imag spectrum to the
    [half, conj(half)] layout where index j and j + n/2 are a conjugate
    pair. eigh orders a skew spectrum as (-a_k, ..., -a_1, a_1, ..., a_k),
    pairing j with n-1-j; downstream full-N consumers
    (DPLRKernelLayer/dplr_recurrent_step_fn dt_tie=False) instead tie
    per-pair quantities by `concatenate([dt, dt])`, i.e. j with j + n/2 —
    the same layout reference-checkpoint transplants use. Without this
    reordering a natively initialized layer would give the two halves of a
    conjugate pair DIFFERENT timesteps, silently breaking the kernel's
    conjugate symmetry (the asymmetric part is discarded by real())."""
    half = n // 2
    return np.concatenate([np.arange(half, n),
                           np.arange(half - 1, -1, -1)])


def _conj_pair_basis(lam_im: np.ndarray, v: np.ndarray):
    """Reorder an eigh-ascending (imag, eigvecs) pair into the
    [half, conj(half)] layout AND fix the per-mode phase gauge so the
    second-half eigenvectors are the exact elementwise conjugates of the
    first half. The diagonalized matrix is real, so conj(v_j) is a valid
    eigenvector for conj(lam_j); eigh's arbitrary phases would otherwise
    leave the rotated B/P of a conjugate pair differing by a phase.
    Zero modes (degenerate at 0, e.g. the fourier measure) keep eigh's
    orthonormal vectors — conjugating could duplicate a real vector."""
    n = lam_im.shape[0]
    half = n // 2
    perm = _conj_pair_perm(n)
    lam_im, v = lam_im[perm], v[:, perm].copy()
    nz = np.abs(lam_im[:half]) > 1e-12
    v[:, half:][:, nz] = np.conj(v[:, :half][:, nz])
    return lam_im, v


def make_dplr_hippo(n: int):
    """Diagonalized HiPPO-LegS in DPLR form (models/s4.py:384-500).

    Returns (Lambda (n,) complex128, P (n,), B (n,)) with
    A = Lambda - P P^*, in [half, conj(half)] order (index j and j + n/2
    are conjugate pairs — see _conj_pair_perm).
    """
    a = hippo_legs_matrix(n)
    p = np.sqrt(np.arange(n, dtype=np.float64) + 0.5)
    b = np.sqrt(2 * np.arange(n, dtype=np.float64) + 1.0)
    s = a + p[:, None] * p[None, :]
    # S is skew-symmetric + (-1/2) I; diagonalize the skew part
    s_diag = np.diagonal(s)
    lambda_real = np.mean(s_diag) * np.ones_like(s_diag)
    lambda_imag, v = np.linalg.eigh(s * -1j)
    lambda_imag, v = _conj_pair_basis(lambda_imag, v)
    p_rot = v.conj().T @ p
    b_rot = v.conj().T @ b
    return lambda_real + 1j * lambda_imag, p_rot, b_rot, v


def hippo_transition(measure: str, n: int):
    """(A, B) continuous-time transition matrices per HiPPO measure
    (models/s4.py:310-355): 'legs' (Legendre scaled), 'legt' (Legendre
    translated, halved for timescale), 'fourier'/'fout' (truncated Fourier
    basis with the rank correction pre-subtracted). Returns
    (A (n, n), B (n,)) float64."""
    if measure == "legs":
        a = hippo_legs_matrix(n)
        b = np.sqrt(2 * np.arange(n, dtype=np.float64) + 1.0)
        return a, b
    if measure == "legt":
        q = np.arange(n, dtype=np.float64)
        r = np.sqrt(2 * q + 1)
        j, i = np.meshgrid(q, q)
        a = -(r[:, None] * np.where(i < j, (-1.0) ** (i - j), 1.0) * r[None, :])
        b = r.copy()
        return 0.5 * a, 0.5 * b  # halved for timescale (s4.py:327-329)
    if measure in ("fourier", "fout"):
        freqs = np.arange(n // 2, dtype=np.float64)
        d = np.stack([np.zeros(n // 2), freqs], axis=-1).reshape(-1)[1:]
        a = np.pi * (-np.diag(d, 1) + np.diag(d, -1))
        b = np.zeros(n, dtype=np.float64)
        b[0::2] = 2 ** 0.5
        b[0] = 1.0
        # the skew part minus the endpoint rank correction (s4.py:347-349)
        return a - b[:, None] * b[None, :], b
    raise ValueError(f"unknown HiPPO measure {measure!r}")


def hippo_rank_correction(measure: str, n: int, rank: int = 1) -> np.ndarray:
    """Low-rank rows P (rank, n) such that A + sum_r P_r P_r^T is normal
    (models/s4.py:357-382). legt needs rank >= 2."""
    if measure == "legs":
        base = np.sqrt(0.5 + np.arange(n, dtype=np.float64))[None]  # (1, n)
    elif measure == "legt":
        p = np.sqrt(1.0 + 2.0 * np.arange(n, dtype=np.float64))
        p0, p1 = p.copy(), p.copy()
        p0[0::2] = 0.0
        p1[1::2] = 0.0
        base = np.stack([p0, p1], axis=0) * 2 ** -0.5  # (2, n), halved
    elif measure in ("fourier", "fout"):
        p = np.zeros(n, dtype=np.float64)
        p[0::2] = 2 ** 0.5
        p[0] = 1.0
        base = p[None]
    else:
        raise ValueError(f"unknown HiPPO measure {measure!r}")
    d = base.shape[0]
    if rank < d:
        raise ValueError(
            f"measure {measure!r} needs rank >= {d}, got {rank}")
    if rank > d:
        base = np.concatenate(
            [base, np.zeros((rank - d, n), np.float64)], axis=0)
    return base


def nplr_init(measure: str, n: int, rank: int = 1, b_clip: float = 2.0):
    """Full-N DPLR diagonalization of a HiPPO measure
    (models/s4.py:384-455 nplr(), full-spectrum variant — the reference
    keeps N/2 conjugate pairs, we keep all N; see PARITY.md #7).

    Returns (Lambda (n,) complex, P (rank, n) complex, B (n,) complex)
    with A = diag(Lambda) - sum_r P_r P_r^*, in [half, conj(half)] order
    (index j and j + n/2 are conjugate pairs — see _conj_pair_perm).
    B's imaginary part is clipped to +-b_clip like the reference
    (s4.py:453-454).
    """
    a, b = hippo_transition(measure, n)
    p = hippo_rank_correction(measure, n, rank)  # (rank, n)
    ap = a + np.einsum("rm,rn->mn", p, p)
    # AP must be (identity +) skew-symmetric: diagonalize the skew part in
    # double precision via the Hermitian eigensolver (s4.py:407-421)
    lam_re = np.mean(np.diagonal(ap)) * np.ones(n)
    lam_im, v = np.linalg.eigh(ap * -1j)
    lam_im, v = _conj_pair_basis(lam_im, v)
    lam = lam_re + 1j * lam_im
    b_rot = v.conj().T @ b.astype(np.complex128)
    p_rot = np.einsum("mn,rm->rn", np.conj(v), p.astype(np.complex128))
    if b_clip is not None:
        b_rot = b_rot.real + 1j * np.clip(b_rot.imag, -b_clip, b_clip)
    return lam, p_rot, b_rot


DIAG_INITS = ("lin", "inv", "legs")
MEASURE_COMBINATIONS = {"hippo": ("legs", "fourier")}


def diag_ssm_init(init: str, n_half: int):
    """Diagonal SSM initialization families (models/s4.py:463-560 dplr()
    with P_scale=0, reached via init='diag-*'; models/s4.py:500-530):

      'lin'  — S4D-Lin: Lambda = -1/2 + i*pi*n, B = 1 (s4d.py:48-51)
      'inv'  — S4D-Inv asymptotic: imag = N/pi * (N/(1+2n) - 1), B = 1
      'legs' — S4D-LegS: the diagonal part of the legs NPLR (negative-imag
               half of the spectrum) with the rotated HiPPO B
               (s4.py:528-549; the 0.5 DPLR factor is dropped there too)

    Returns (neg_real (n,), imag (n,), B (n,) complex128) in the
    positive-imag convention (conjugate of the reference's negative-imag
    storage; the kernel 2*Re is invariant with C conjugated)."""
    big_n = 2 * n_half
    n = np.arange(n_half, dtype=np.float64)
    if init in ("lin", "linear"):
        return 0.5 * np.ones(n_half), np.pi * n, np.ones(n_half, complex)
    if init in ("inv", "inverse"):
        imag = (big_n / np.pi) * (big_n / (1.0 + 2.0 * n) - 1.0)
        return 0.5 * np.ones(n_half), imag, np.ones(n_half, complex)
    if init == "legs":
        lam, _, b = nplr_init("legs", big_n)
        order = np.argsort(lam.imag)[:n_half]  # negative-imag half
        return -lam.real[order], -lam.imag[order], np.conj(b[order])
    raise ValueError(f"unknown diag init {init!r}; one of {DIAG_INITS}")


def s4d_lin_init(h: int, n_half: int):
    """S4D-Lin initialization: Lambda_n = -1/2 + i*pi*n (models/s4d.py:48-51).

    Returns (log_A_real (h, n_half), A_imag (h, n_half)) float32.
    """
    log_a_real = np.log(0.5 * np.ones((h, n_half), dtype=np.float32))
    a_imag = np.pi * np.broadcast_to(
        np.arange(n_half, dtype=np.float32), (h, n_half)).copy()
    return log_a_real, a_imag


def log_dt_init(rng, h: int, dt_min: float = 1e-3, dt_max: float = 1e-1):
    """Uniform-in-log timestep init (models/s4d.py:40-42)."""
    u = jax.random.uniform(rng, (h,))
    return u * (np.log(dt_max) - np.log(dt_min)) + np.log(dt_min)


# ---------------------------------------------------------------------------
# Kernel computations
# ---------------------------------------------------------------------------

def _dt_cols(log_dt, dt):
    """Resolve the timestep to a (H, 1) or (H, N) column array: either
    exp(log_dt) (the historical parameterization) or an explicit dt from
    a dt_transform/dt_tie=False parameterization (models/s4.py:839,1099)."""
    d = jnp.exp(log_dt) if dt is None else dt
    return d[:, None] if d.ndim == 1 else d


def s4d_kernel_zoh(C, A, log_dt, L: int, dt=None):
    """S4D convolution kernel, ZOH discretization (models/s4d.py:53-69).

    C: (H, N) complex; A: (H, N) complex (negative real part);
    log_dt: (H,), or pass dt= ((H,) or (H, N)) directly. Returns (H, L).
    """
    dt = _dt_cols(log_dt, dt)
    dtA = A * dt  # (H, N)
    # Vandermonde: exp(dtA * l) for l in [0, L)
    # contraction in complex split form (TPU-friendly; no complex matmul)
    C_scaled = C * (cexp(dtA) - 1.0) / A  # (H, N)
    # K[h, l] = 2 Re sum_n C_scaled[h, n] * exp(dtA[h, n] * l)
    l_range = jnp.arange(L)
    # exp((a+bi) l) = e^{al} (cos bl + i sin bl)
    a = jnp.real(dtA)[..., None] * l_range  # (H, N, L)
    b = jnp.imag(dtA)[..., None] * l_range
    e = jnp.exp(a)
    re = e * jnp.cos(b)
    im = e * jnp.sin(b)
    k = jnp.einsum("hn,hnl->hl", jnp.real(C_scaled), re) \
        - jnp.einsum("hn,hnl->hl", jnp.imag(C_scaled), im)
    return 2.0 * k


def s4d_kernel_bilinear(C, A, log_dt, L: int, dt=None):
    """S4D kernel, bilinear discretization (models/s4.py:1117-1189,
    disc='bilinear'): C' = C * dt / (1 - dtA/2), dA = (1+dtA/2)/(1-dtA/2),
    K = 2 Re sum_n C'_n dA_n^l. Shapes as s4d_kernel_zoh."""
    dt = _dt_cols(log_dt, dt)
    dtA = A * dt
    C_scaled = C * dt / (1.0 - dtA / 2.0)
    log_dA = clog((1.0 + dtA / 2.0) / (1.0 - dtA / 2.0))  # (H, N)
    l_range = jnp.arange(L)
    a = jnp.real(log_dA)[..., None] * l_range  # (H, N, L)
    b = jnp.imag(log_dA)[..., None] * l_range
    e = jnp.exp(a)
    k = (jnp.einsum("hn,hnl->hl", jnp.real(C_scaled), e * jnp.cos(b))
         - jnp.einsum("hn,hnl->hl", jnp.imag(C_scaled), e * jnp.sin(b)))
    return 2.0 * k


def s4d_kernel_dss(C, A, log_dt, L: int, dt=None):
    """S4D kernel, DSS discretization (models/s4.py:1160-1178, disc='dss'):
    softmax-normalized exponentials that tolerate positive-real eigenvalues.
    Note the reference takes Re (not 2 Re) in this branch. Shapes as
    s4d_kernel_zoh."""
    dt = _dt_cols(log_dt, dt)
    dtA = A * dt  # (H, N)
    l_range = jnp.arange(L)
    pos = jnp.real(A) > 0  # (H, N)
    p = dtA[..., None] * l_range  # (H, N, L)
    p_max = dtA * jnp.where(pos, float(L - 1), 0.0)
    p = p - jax.lax.stop_gradient(p_max)[..., None]
    s = cexp(p)  # (H, N, L) complex
    dtA_neg = dtA * (1.0 - 2.0 * pos)
    num = cexp(dtA_neg) - 1.0
    den = cexp(dtA_neg * L) - 1.0
    x = den * A
    r = jnp.conj(x) / (x * jnp.conj(x) + 1e-7)
    C_scaled = C * num * r  # (H, N)
    k = (jnp.einsum("hn,hnl->hl", jnp.real(C_scaled), jnp.real(s))
         - jnp.einsum("hn,hnl->hl", jnp.imag(C_scaled), jnp.imag(s)))
    return k  # reference uses .float() == real part, no 2x


S4D_KERNELS = {
    "zoh": s4d_kernel_zoh,
    "bilinear": s4d_kernel_bilinear,
    "dss": s4d_kernel_dss,
}


def cauchy(v, omega, lambd):
    """sum_n v_n / (omega_l - lambda_n) -> (..., L). v, lambd: (..., N)
    complex; omega: (L,) complex. Replaces cauchy_naive
    (models/s4.py:159-168)."""
    return jnp.sum(v[..., None, :] / (omega[:, None] - lambd[..., None, :]),
                   axis=-1)


def dplr_kernel(Lambda, P, B, C_tilde, log_dt, L: int, dt=None):
    """S4 DPLR convolution kernel via the bilinear generating function
    evaluated at the roots of unity (models/s4.py:1343-1447 semantics),
    with a rank-general Woodbury correction (s4.py:1408-1432).

    Per-feature: Lambda, B, C_tilde: (N,) complex; P: (N,) or (R, N)
    complex (rank-R low-rank correction); log_dt: scalar, or pass dt=
    (scalar, or (N,) for dt_tie=False — the reference broadcasts dt over
    the state dim, s4.py:1382-1390). Returns real (L,). C_tilde is the
    trained parameter (the (I - Abar^L)-modified C of the S4 paper).
    """
    if P.ndim == 1:
        P = P[None]  # (1, N)
    R = P.shape[0]
    step = jnp.exp(log_dt) if dt is None else dt    # scalar or (N,)
    omega_l = cexp(-2j * jnp.pi * jnp.arange(L) / L)
    z = 2.0 * (1.0 - omega_l) / (1.0 + omega_l)
    c = 2.0 / (1.0 + omega_l)
    # rows a_i in {conj(C~), conj(P_r)}, cols b_j in {B, P_r}
    a = jnp.concatenate([jnp.conj(C_tilde)[None], jnp.conj(P)], axis=0)
    b = jnp.concatenate([B[None], P], axis=0)       # (R+1, N)
    v = a[:, None, :] * b[None, :, :]               # (R+1, R+1, N)
    # sum_n v_n dt_n / (z_l - dt_n Lambda_n): dt folds into v and Lambda
    # exactly as the reference does (s4.py:1382-1390 "A = A*dt ... v*dt")
    r = cauchy(v * step, z, Lambda * step)          # (R+1, R+1, L)
    if R == 1:
        kf = (r[0, 0] - r[0, 1] * (1.0 / (1.0 + r[1, 1])) * r[1, 0])
    else:
        r11 = jnp.moveaxis(r[1:, 1:], -1, 0)        # (L, R, R)
        rhs = jnp.moveaxis(r[1:, 0], -1, 0)[..., None]  # (L, R, 1)
        eye = jnp.eye(R, dtype=r.dtype)
        sol = jnp.linalg.solve(eye + r11, rhs)[..., 0]  # (L, R)
        kf = r[0, 0] - jnp.einsum("rl,lr->l", r[0, 1:], sol)
    out = jnp.fft.ifft(c * kf, L)
    return jnp.real(out)


def discretize_dplr(Lambda, P, B, C_tilde, log_dt, L: int, dt=None):
    """Discrete (Abar, Bbar, C) for recurrent stepping
    (models/s4.py:1190-1218 _setup_step semantics, bilinear transform).

    Per-feature inputs as in dplr_kernel; P may be (N,) rank-1 or (R, N).
    log_dt: scalar, or pass dt= directly (scalar, or (N,) per-state —
    bilinear with diagonal timestep: Abar = (2 diag(1/dt) - A)^{-1}
    (2 diag(1/dt) + A), matching the per-state-dt generating function).
    Returns (Ab (N,N), Bb (N,), C (N,)) complex, where
    y_k = 2 Re(C^* x_k) ... consistent with kernel above.
    """
    step = jnp.exp(log_dt) if dt is None else dt
    n = Lambda.shape[0]
    if P.ndim == 1:
        P = P[None]
    A = jnp.diag(Lambda) - jnp.einsum("rm,rn->mn", P, jnp.conj(P))
    I = jnp.eye(n, dtype=A.dtype)
    D = jnp.diag(jnp.broadcast_to(2.0 / step, (n,)).astype(A.dtype))
    A0 = D + A
    # (2/dt I - A)^{-1} via a dense solve: exact for any rank (the rank-1
    # Woodbury special case is subsumed; N is small so setup cost is moot)
    A1 = jnp.linalg.inv(D - A)
    Ab = A1 @ A0
    Bb = 2.0 * (A1 @ B[:, None])[:, 0]
    # Recover the stepping C from the trained C_tilde:
    # C_tilde = (I - Abar^L)^* C  =>  C = (I - Abar^L)^{-*} C_tilde
    AbL = jnp.linalg.matrix_power(Ab, L)
    C = jnp.linalg.solve(jnp.conj(I - AbL).T, C_tilde[:, None])[:, 0]
    return Ab, Bb, C


def discretize_diag_zoh(A, log_dt, dt=None):
    """Discrete (Abar (N,), Bbar_C (N,)) for S4D recurrence, per feature.

    ZOH: Abar = exp(dt A); effective input weight dB = (exp(dt A)-1)/A
    (matching s4d_kernel_zoh so step-mode equals convolution mode).
    Recurrence: x_k = Abar x_{k-1} + dB u_k; y_k = 2 Re(sum C x_k).
    log_dt or explicit dt=, broadcastable against A (per-feature column
    or per-state full shape).
    """
    dt = jnp.exp(log_dt) if dt is None else dt
    dtA = A * dt
    Ab = cexp(dtA)
    dB = (cexp(dtA) - 1.0) / A
    return Ab, dB


def discretize_diag_bilinear(A, log_dt, dt=None):
    """Bilinear discretization for the diagonal kernel (models/s4.py:
    1203-1205, disc='bilinear'): Abar = (1+dtA/2)/(1-dtA/2),
    dB = dt/(1-dtA/2) — matching s4d_kernel_bilinear so step mode equals
    convolution mode. log_dt or explicit dt= as in discretize_diag_zoh."""
    dt = jnp.exp(log_dt) if dt is None else dt
    dtA = A * dt
    Ab = (1.0 + dtA / 2.0) / (1.0 - dtA / 2.0)
    dB = dt / (1.0 - dtA / 2.0)
    return Ab, dB


def fft_causal_conv(x, k):
    """Causal FFT convolution y = irfft(rfft(x, 2L) * rfft(k, 2L))[:L]
    (models/s4d.py:118-121). x: (..., L) real, k broadcastable (..., L)."""
    L = x.shape[-1]
    n = 2 * L
    xf = jnp.fft.rfft(x, n=n, axis=-1)
    kf = jnp.fft.rfft(k, n=n, axis=-1)
    return jnp.fft.irfft(xf * kf, n=n, axis=-1)[..., :L]
