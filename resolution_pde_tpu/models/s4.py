"""S4 family: S4D (diagonal), S4 (DPLR), FFTConv, S4Block, and the PDE
wrappers S4Model (1D) / S4NDModel (2D).

Parity targets:
  - S4DKernel / S4D block: models/s4d.py:33-129.
  - FFTConv: models/s4.py:1649-1807 (causal FFT conv with n=2L, D skip,
    bidirectional two-sided kernel via pad/flip, GELU, channel flatten).
  - S4Block: models/s4.py:1838-1999 (FFTConv -> dropout -> zero residual ->
    GLU output linear; gate/bottleneck off by default).
  - S4Model: models/s4_1d.py:7-185. NOTE the reference's active forward has
    a dead post-norm (`z = norm(z)` discards the result, s4_1d.py:117) so
    with prenorm=False (the shipped config) NO norm is applied; we
    reproduce that behavior and keep the norm for prenorm=True.
  - S4NDModel / S4ND: models/s4_2d.py:8-120, models/s4nd.py:1815-1918 (one
    SSM kernel per spatial axis, outer-product combined, N-D FFT conv).
    Unlike the 1D wrapper, the 2D wrapper's post-norm IS applied
    (s4_2d.py:120).

SSM parameters (log_dt, A, Lambda, P, B) carry the reference's per-param
optimizer override (lr=min(1e-3, lr), weight_decay=0 — models/s4.py:764-776
and s4d.py:71-81); see SSM_PARAM_NAMES and Trainer(ssm_lr=...).

TPU notes: all complex contractions are decomposed into real arithmetic at
the kernel level (ops/ssm.py); the DPLR Cauchy reduction is an (L, N)
broadcast-divide-reduce that XLA fuses; kernels are materialized once per
step (cheap: H*N*L) and the convolution itself is an rfft/irfft pair.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from resolution_pde_tpu.models.layers import gelu

ACTIVATIONS_S4 = {
    "gelu": gelu,
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "id": lambda x: x,
    "identity": lambda x: x,
}
from resolution_pde_tpu.ops import ssm as ssm_ops
from resolution_pde_tpu.ops.grids import concat_grid_1d, concat_grid_2d

# Parameter names that get the SSM optimizer override (lr cap, no decay).
SSM_PARAM_NAMES = (
    "log_dt", "log_A_real", "A_imag",
    "Lambda_log_neg_re", "Lambda_im", "P_vec", "B_vec",
)


class S4DKernelLayer(nn.Module):
    """Diagonal SSM kernel (models/s4d.py:33-69; option surface of
    SSMKernelDiag, models/s4.py:987-1189). Produces (channels, H, L).

    kernel_impl: 'jnp' (XLA-fused Vandermonde) or 'pallas' (on-chip state
    reduction, ops/pallas/vandermonde.py — the TPU replacement for the
    reference's CUDA/pykeops kernels; bit-exact vs 'jnp' on v5e).
    disc: 'zoh' | 'bilinear' | 'dss' discretization (s4.py:1149-1178);
    the pallas path implements zoh only.
    n_ssm: number of independent (A,) copies tied across H features
    (s4.py:1060-1064 `repeat`); None = H (fully independent, the default).
    dt_tie: False stores one dt per (feature, state) instead of per
    feature (s4.py:819, 839). dt_transform/dt_fast: parameterization of
    the positive timestep (s4.py:820, 992; dt_fast stores asinh(inv_dt),
    sinh at resolve — s4.py:1053, 1097).
    real_transform/imag_transform: positive-parameter transforms for
    -Re A / -Im A (s4.py:994, 1088-1093). With the default
    imag_transform='none' the stored A_imag is the SIGNED imaginary part
    (the minimal-s4d.py convention the golden tests transplant onto);
    any other transform follows SSMKernelDiag exactly:
    Im A = -param_transform(A_imag).
    bandlimit: zero C on state modes whose discrete frequency
    dt*|Im A|/(2pi) exceeds bandlimit/2 (s4.py:1101-1103).
    is_real: real-valued SSM (EMA interpretation, s4.py:999); d_state then
    counts real states directly (the reference doubles the d_state kwarg
    so N stays d_state, s4.py:1014-1016) and only A_real/C are stored.
    Recurrent step mode (s4d_recurrent_step_fn) supports the full option
    surface — pass the same dt/transform/is_real options to the builder.
    """

    d_model: int
    d_state: int = 64
    channels: int = 1
    dt_min: float = 1e-3
    dt_max: float = 1e-1
    kernel_impl: str = "jnp"
    disc: str = "zoh"
    n_ssm: Optional[int] = None
    dt_tie: bool = True
    dt_transform: str = "exp"
    dt_fast: bool = False
    real_transform: str = "exp"
    imag_transform: str = "none"
    bandlimit: Optional[float] = None
    is_real: bool = False
    # initialization family: 'lin' (S4D-Lin, the minimal-s4d default),
    # 'inv' (S4D-Inv), 'legs' (S4D-LegS: diagonal of the legs NPLR with the
    # HiPPO B folded into C), or 'diag' (the reference's combination init,
    # first half of the n_ssm copies 'inv', second half 'lin' —
    # models/s4.py:612-616, 463-560). Named `measure` (not the reference's
    # `init`) because flax reserves Module.init.
    measure: str = "lin"

    @nn.compact
    def __call__(self, L: int):
        h = self.d_model
        n_half = self.d_state if self.is_real else self.d_state // 2
        s = self.n_ssm or h
        if h % s:
            raise ValueError(f"n_ssm={s} must divide d_model={h}")

        def dt_init(rng, shape):
            u = jax.random.uniform(rng, shape)
            raw = (u * (math.log(self.dt_max) - math.log(self.dt_min))
                   + math.log(self.dt_min))
            if self.dt_transform != "exp":
                raw = ssm_ops.inv_param_transform_jnp(
                    jnp.exp(raw), self.dt_transform)
            if self.dt_fast:
                raw = jnp.arcsinh(raw)
            return raw

        log_dt = self.param(
            "log_dt", dt_init, (h,) if self.dt_tie else (h, n_half))
        inits = (("inv", "lin") if self.measure == "diag"
                 else (self.measure,))
        if s % len(inits):
            raise ValueError(
                f"n_ssm={s} must divide the {len(inits)} inits of "
                f"{self.measure!r} (models/s4.py:612-616 combination)")
        rows = [ssm_ops.diag_ssm_init(i, n_half) for i in inits]
        rep_i = s // len(inits)
        neg_real = np.concatenate(
            [np.broadcast_to(r[0], (rep_i, n_half)) for r in rows], 0)
        imag_init = np.concatenate(
            [np.broadcast_to(r[1], (rep_i, n_half)) for r in rows], 0)
        b_init = np.concatenate(
            [np.broadcast_to(r[2], (rep_i, n_half)) for r in rows], 0)
        if self.measure == "lin" and self.real_transform == "exp":
            # historical bit-exact path (f32 log) for the shipped default
            la, ai = ssm_ops.s4d_lin_init(s, n_half)
        else:
            la = ssm_ops.inv_param_transform(
                neg_real, self.real_transform).astype(np.float32)
            ai = imag_init.astype(np.float32)
        log_a_real = self.param("log_A_real", lambda rng, _s: jnp.asarray(la),
                                la.shape)
        # non-constant B inits fold into the random C (the kernel only uses
        # the product B*C, PARITY.md #18); tiled to H like A (s4.py:1062)
        if np.allclose(b_init, 1.0):
            b_fold = None
        else:
            bh = np.tile(b_init, (h // s, 1)) if s != h else b_init
            b_fold = jnp.asarray(
                np.stack([bh.real, bh.imag], -1), jnp.float32)

        def c_init(rng, shape):
            cr = jax.random.normal(rng, shape)
            if b_fold is None:
                return cr
            if self.is_real:
                return cr * b_fold[..., 0]
            re = (cr[..., 0] * b_fold[..., 0]
                  - cr[..., 1] * b_fold[..., 1])
            im = (cr[..., 0] * b_fold[..., 1]
                  + cr[..., 1] * b_fold[..., 0])
            return jnp.stack([re, im], -1)
        a_real = -ssm_ops.param_transform(log_a_real, self.real_transform)
        if self.is_real:
            A = jax.lax.complex(a_real, jnp.zeros_like(a_real))  # (S, N)
            c = self.param("C", c_init, (self.channels, h, n_half))
            C = jax.lax.complex(c, jnp.zeros_like(c))
        else:
            if self.imag_transform != "none":
                ai = ssm_ops.inv_param_transform(
                    ai, self.imag_transform).astype(np.float32)
            a_imag = self.param("A_imag", lambda rng, _s: jnp.asarray(ai),
                                ai.shape)
            # imag_transform='none' keeps the historical signed storage
            # (models/s4d.py:46); otherwise Im A = -param_transform(A_imag)
            # exactly like SSMKernelDiag (models/s4.py:1093)
            im = (a_imag if self.imag_transform == "none"
                  else -ssm_ops.param_transform(a_imag, self.imag_transform))
            A = jax.lax.complex(a_real, im)  # (S, N/2)
            c = self.param("C", c_init, (self.channels, h, n_half, 2))
            C = jax.lax.complex(c[..., 0], c[..., 1])  # (channels, H, N/2)
        if s != h:
            # reference tying TILES the copies: feature h uses copy h mod S
            # (einops 't n -> (v t) n', models/s4.py:1062)
            A = jnp.tile(A, (h // s, 1))        # tied copies -> (H, N/2)

        inv_dt = jnp.sinh(log_dt) if self.dt_fast else log_dt
        dt = ssm_ops.param_transform(inv_dt, self.dt_transform)
        if self.bandlimit is not None:
            # mask C on modes above the bandlimit (models/s4.py:1101-1103)
            dt_b = dt[:, None] if dt.ndim == 1 else dt
            freqs = dt_b * jnp.abs(jnp.imag(A)) / (2.0 * math.pi)
            C = C * (freqs < self.bandlimit * 0.5).astype(C.real.dtype)

        if self.kernel_impl == "pallas":
            if self.disc != "zoh":
                raise ValueError(
                    f"kernel_impl='pallas' supports disc='zoh' only, got "
                    f"{self.disc!r}")
            if not (self.dt_tie and self.dt_transform == "exp"
                    and not self.dt_fast and not self.is_real):
                raise ValueError(
                    "kernel_impl='pallas' supports the default dt "
                    "parameterization (dt_tie=True, dt_transform='exp', "
                    "dt_fast=False) and complex mode only")
            from resolution_pde_tpu.ops.pallas import s4d_kernel_pallas

            interp = jax.default_backend() not in ("tpu", "axon")
            # channels fold into the kernel grid: one launch total
            kern = s4d_kernel_pallas(C, A, log_dt, L, interpret=interp)
        else:
            if self.disc not in ssm_ops.S4D_KERNELS:
                raise ValueError(
                    f"unknown disc {self.disc!r}; expected one of "
                    f"{sorted(ssm_ops.S4D_KERNELS)}")
            kfn = ssm_ops.S4D_KERNELS[self.disc]
            kern = jax.vmap(lambda cc: kfn(cc, A, None, L, dt=dt))(C)
        return kern  # (channels, H, L)

    def discretize(self):
        """Return (Abar, dB, C) arrays for recurrent stepping."""
        raise NotImplementedError("use module-level s4d_discretize on params")


class DPLRKernelLayer(nn.Module):
    """Full S4 kernel in DPLR form (models/s4.py:1234-1447).

    Stores the spectrum at full state size N (the reference stores N/2
    conjugate pairs; full-N is the annotated-S4 convention — capacity is a
    superset and the kernel values agree for conjugate-symmetric params).

    measure: HiPPO init — 'legs' (historical path, bit-identical to prior
    versions), 'legt' (needs rank>=2), 'fourier'/'fout' (models/s4.py:
    310-382 transition/rank_correction via ops.ssm.nplr_init; the non-legs
    measures clip B.imag at +-2 like the reference nplr, s4.py:453-454).
    dt_tie: False stores dt per (feature, conjugate pair) — shape
    (H, d_state/2) exactly like the reference (s4.py:839) — broadcast to
    both halves of the full-N spectrum at resolve.
    dt_transform/dt_fast: timestep parameterization (s4.py:820, 992).
    real_transform: positive-parameter transform for -Re Lambda
    (s4.py:994; init clamps at 1e-4, which keeps the fourier measure's
    zero real parts finite, s4.py:637).
    bandlimit: zero C-tilde on modes whose discrete frequency exceeds
    bandlimit/2 (inherited diag behavior, s4.py:1101-1103).
    Recurrent step mode (dplr_recurrent_step_fn) supports the full option
    surface — pass the same dt/transform options to the builder (per-state
    dt discretizes with a diagonal timestep in the bilinear transform).
    """

    d_model: int
    d_state: int = 64
    channels: int = 1
    dt_min: float = 1e-3
    dt_max: float = 1e-1
    kernel_impl: str = "jnp"  # 'jnp' | 'pallas' (on-chip Cauchy reduction)
    rank: int = 1             # low-rank correction rank (s4.py:357-382)
    n_ssm: Optional[int] = None  # tied (A, B, P) copies (s4.py:1060-1064)
    measure: str = "legs"
    dt_tie: bool = True
    dt_transform: str = "exp"
    dt_fast: bool = False
    real_transform: str = "exp"
    bandlimit: Optional[float] = None

    @nn.compact
    def __call__(self, L: int):
        h, n = self.d_model, self.d_state
        s = self.n_ssm or h
        if h % s:
            raise ValueError(f"n_ssm={s} must divide d_model={h}")
        measures = ssm_ops.MEASURE_COMBINATIONS.get(
            self.measure, (self.measure,))
        if s % len(measures):
            raise ValueError(
                f"n_ssm={s} must be a multiple of the {len(measures)} "
                f"measures of {self.measure!r} (models/s4.py:612-625)")

        def one_measure(m):
            if m == "legs":
                # historical path: keeps the exact init every shipped
                # config and checkpoint was produced with (nplr_init('legs')
                # agrees up to the reference's B.imag clip, which legs
                # never reaches)
                Lam, P, B, _ = ssm_ops.make_dplr_hippo(n)
                # rank > 1: extra rows zero-padded, matching the
                # reference's rank_correction (models/s4.py:379-382)
                P_rows = np.concatenate(
                    [P[None], np.zeros((self.rank - 1, n), P.dtype)], axis=0)
                return Lam, P_rows, B
            return ssm_ops.nplr_init(m, n, self.rank)

        # combination inits (e.g. 'hippo' = legs + fourier) assign each
        # measure a contiguous block of the S trainable copies, exactly
        # like the reference's combination() (models/s4.py:619-630)
        parts = [one_measure(m) for m in measures]
        rep_m = s // len(measures)
        Lam_s = np.concatenate(
            [np.broadcast_to(lam, (rep_m, n)) for lam, _, _ in parts], 0)
        P_s = np.concatenate(
            [np.broadcast_to(p[:, None], (self.rank, rep_m, n))
             for _, p, _ in parts], 1)
        B_s = np.concatenate(
            [np.broadcast_to(b, (rep_m, n)) for _, _, b in parts], 0)

        def dt_init(rng, shape):
            u = jax.random.uniform(rng, shape)
            raw = (u * (math.log(self.dt_max) - math.log(self.dt_min))
                   + math.log(self.dt_min))
            if self.dt_transform != "exp":
                raw = ssm_ops.inv_param_transform_jnp(
                    jnp.exp(raw), self.dt_transform)
            if self.dt_fast:
                raw = jnp.arcsinh(raw)
            return raw

        log_dt = self.param(
            "log_dt", dt_init, (h,) if self.dt_tie else (h, n // 2))
        lam_re = self.param(
            "Lambda_log_neg_re",
            lambda rng, _s: jnp.asarray(
                ssm_ops.inv_param_transform(-Lam_s.real, self.real_transform),
                jnp.float32),
            (s, n),
        )
        lam_im = self.param(
            "Lambda_im",
            lambda rng, _s: jnp.asarray(Lam_s.imag, jnp.float32),
            (s, n),
        )
        # rank-1 keeps the historical (S, N, 2) storage; rank > 1 stores
        # (R, S, N, 2) with a leading rank dim
        p_shape = (s, n, 2) if self.rank == 1 else (self.rank, s, n, 2)
        p_init = (np.stack([P_s[0].real, P_s[0].imag], -1)
                  if self.rank == 1
                  else np.stack([P_s.real, P_s.imag], -1))
        p_vec = self.param(
            "P_vec",
            lambda rng, _s: jnp.asarray(p_init, jnp.float32),
            p_shape,
        )
        b_vec = self.param(
            "B_vec",
            lambda rng, _s: jnp.asarray(
                np.stack([B_s.real, B_s.imag], -1), jnp.float32),
            (s, n, 2),
        )
        c = self.param(
            "C",
            lambda rng, shape: jax.random.normal(rng, shape) *
            (0.5 ** 0.5),
            (self.channels, h, n, 2),
        )
        lam_re_pos = ssm_ops.param_transform(lam_re, self.real_transform)
        Lambda = jax.lax.complex(-lam_re_pos, lam_im)       # (S, N)
        Pc = jax.lax.complex(p_vec[..., 0], p_vec[..., 1])  # (S,N)|(R,S,N)
        Bc = jax.lax.complex(b_vec[..., 0], b_vec[..., 1])
        if s != h:  # tied copies -> per-feature (TILED: h uses h mod S,
            # einops '(v t)' ordering, models/s4.py:1062,1345)
            rep = h // s
            Lambda = jnp.tile(Lambda, (rep, 1))
            Bc = jnp.tile(Bc, (rep, 1))
            Pc = (jnp.tile(Pc, (rep, 1)) if Pc.ndim == 2
                  else jnp.tile(Pc, (1, rep, 1)))
        Cc = jax.lax.complex(c[..., 0], c[..., 1])  # (channels, H, N)

        inv_dt = jnp.sinh(log_dt) if self.dt_fast else log_dt
        dt = ssm_ops.param_transform(inv_dt, self.dt_transform)
        if not self.dt_tie:
            # per-pair dt broadcast to both conjugate halves of the full-N
            # spectrum (the reference broadcasts its (H, N/2) dt over the
            # half spectrum, s4.py:1099)
            dt = jnp.concatenate([dt, dt], axis=-1)  # (H, N)
        if self.bandlimit is not None:
            # mask C-tilde above the bandlimit (models/s4.py:1101-1103)
            dt_b = dt[:, None] if dt.ndim == 1 else dt
            freqs = dt_b * jnp.abs(jnp.imag(Lambda)) / (2.0 * math.pi)
            Cc = Cc * (freqs < self.bandlimit * 0.5).astype(Cc.real.dtype)

        if self.kernel_impl == "pallas":
            if self.rank != 1:
                raise ValueError("kernel_impl='pallas' supports rank=1 only")
            if not (self.dt_tie and self.dt_transform == "exp"
                    and not self.dt_fast):
                raise ValueError(
                    "kernel_impl='pallas' supports the default dt "
                    "parameterization (dt_tie=True, dt_transform='exp', "
                    "dt_fast=False) only")
            from resolution_pde_tpu.ops.pallas.cauchy import (
                dplr_kernel_pallas)

            interp = jax.default_backend() not in ("tpu", "axon")
            # channels fold into the Cauchy grid's H axis: ONE launch for
            # all channels (Lambda/P/B/dt tile; C rows differ per channel)
            ch = self.channels
            tile = lambda z: jnp.concatenate([z] * ch, axis=0)  # noqa: E731
            k = dplr_kernel_pallas(
                tile(Lambda), tile(Pc), tile(Bc),
                Cc.reshape(ch * h, n), jnp.concatenate([log_dt] * ch), L,
                interpret=interp)
            return k.reshape(ch, h, L)

        def per_h(lam_h, p_h, b_h, c_h, dt_h):
            return ssm_ops.dplr_kernel(lam_h, p_h, b_h, c_h, None, L,
                                       dt=dt_h)

        p_axis = 0 if self.rank == 1 else 1

        def per_channel(c_ch):
            return jax.vmap(
                per_h, in_axes=(0, p_axis, 0, 0, 0)
            )(Lambda, Pc, Bc, c_ch, dt)

        return jax.vmap(per_channel)(Cc)  # (channels, H, L)


class FFTConvLayer(nn.Module):
    """FFT convolution around an SSM kernel (models/s4.py:1649-1784).

    Channels-last: x (B, L, H) -> (B, L, channels*H)."""

    d_model: int
    d_state: int = 64
    mode: str = "dplr"  # 'dplr' (S4) or 'diag' (S4D)
    channels: int = 1
    bidirectional: bool = False
    activation: str = "gelu"
    dropout: float = 0.0
    # kernel option surface (SSMKernel, models/s4.py:987-1189)
    disc: str = "zoh"            # diag mode: 'zoh' | 'bilinear' | 'dss'
    n_ssm: Optional[int] = None  # tied (A, B, P) copies
    rank: int = 1                # dplr mode: low-rank correction rank
    kernel_impl: str = "jnp"     # 'jnp' | 'pallas'
    # long-tail kernel options forwarded verbatim to the kernel layer
    # (measure, dt_tie, dt_transform, dt_fast, real/imag_transform,
    # bandlimit, is_real — see S4DKernelLayer / DPLRKernelLayer)
    kernel_args: Optional[dict] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, L, h = x.shape
        channels = self.channels
        kernel_channels = channels * (2 if self.bidirectional else 1)
        kargs = dict(self.kernel_args or {})
        # overlap with explicit fields: kernel_args wins when set there
        # (lets callers carry the whole option bundle in one dict)
        disc = kargs.pop("disc", self.disc)
        n_ssm = kargs.pop("n_ssm", self.n_ssm)
        rank = kargs.pop("rank", self.rank)
        if self.mode in ("dplr", "nplr"):
            k = DPLRKernelLayer(
                self.d_model, self.d_state, channels=kernel_channels,
                rank=rank, n_ssm=n_ssm,
                kernel_impl=self.kernel_impl, **kargs)(L)  # (kc, H, L)
        else:
            k = S4DKernelLayer(
                self.d_model, self.d_state, channels=kernel_channels,
                disc=disc, n_ssm=n_ssm,
                kernel_impl=self.kernel_impl, **kargs)(L)
        D = self.param("D", lambda rng, s: jax.random.normal(rng, s),
                       (channels, h))

        xt = jnp.swapaxes(x, -1, -2)  # (B, H, L)
        n = 2 * L
        if self.bidirectional:
            k0, k1 = k[:channels], k[channels:]
            # two-sided kernel: pad k0 right, reversed k1 left
            # (models/s4.py:1737-1744, incl. the deliberate off-by-one)
            k_two = (jnp.pad(k0, ((0, 0), (0, 0), (0, L)))
                     + jnp.pad(jnp.flip(k1, -1), ((0, 0), (0, 0), (L, 0))))
            kf = jnp.fft.rfft(k_two, n=n, axis=-1)  # (C, H, n/2+1)
        else:
            kf = jnp.fft.rfft(k, n=n, axis=-1)
        xf = jnp.fft.rfft(xt, n=n, axis=-1)  # (B, H, nf)
        yf = jnp.einsum("bhl,chl->bchl", xf, kf)
        y = jnp.fft.irfft(yf, n=n, axis=-1)[..., :L]  # (B, C, H, L)
        y = y + jnp.einsum("bhl,ch->bchl", xt, D)
        y = y.reshape(b, channels * h, L)
        y = jnp.swapaxes(y, -1, -2)  # (B, L, C*H)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        if self.activation is not None:
            if self.activation not in ACTIVATIONS_S4:
                raise ValueError(
                    f"unknown activation {self.activation!r}; expected one "
                    f"of {sorted(ACTIVATIONS_S4)}")
            y = ACTIVATIONS_S4[self.activation](y)
        return y


class S4Block(nn.Module):
    """S4Block (models/s4.py:1838-1999): optional bottleneck down-projection
    and multiplicative gate (GSS-style) around the FFTConv, then
    mult_act -> dropout -> final linear (default 'glu'). With the default
    options (gate=None, bottleneck=None, final_act='glu') the param tree
    and computation match the pre-gate version exactly."""

    d_model: int
    d_state: int = 64
    mode: str = "dplr"
    bidirectional: bool = False
    dropout: float = 0.0
    gate: Optional[int] = None          # gate expansion factor (s4.py:1899)
    gate_act: Optional[str] = None
    bottleneck: Optional[int] = None    # inner-dim divisor (s4.py:1888)
    mult_act: Optional[str] = None
    final_act: Optional[str] = "glu"
    # kernel option surface, forwarded to FFTConvLayer (s4.py:987-1189)
    disc: str = "zoh"
    n_ssm: Optional[int] = None
    rank: int = 1
    kernel_impl: str = "jnp"
    kernel_args: Optional[dict] = None  # long-tail options, see FFTConvLayer

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_inner = (self.d_model // self.bottleneck if self.bottleneck
                   else self.d_model)
        if self.gate:
            v = nn.Dense(d_inner * self.gate, name="input_gate")(x)
            if self.gate_act:
                v = ACTIVATIONS_S4[self.gate_act](v)
        if self.bottleneck:
            x = nn.Dense(d_inner, name="input_linear")(x)
        y = FFTConvLayer(
            d_inner, self.d_state, self.mode, channels=1,
            bidirectional=self.bidirectional, dropout=self.dropout,
            disc=self.disc, n_ssm=self.n_ssm, rank=self.rank,
            kernel_impl=self.kernel_impl, kernel_args=self.kernel_args,
        )(x, deterministic)
        if self.gate:
            if y.shape[-1] != d_inner * self.gate:
                y = nn.Dense(d_inner * self.gate, name="output_gate")(y)
            y = y * v
        if self.mult_act:
            y = ACTIVATIONS_S4[self.mult_act](y)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        if self.final_act is None:
            return y
        if self.final_act == "glu":
            y = nn.Dense(2 * self.d_model)(y)
            return (y[..., : self.d_model]
                    * jax.nn.sigmoid(y[..., self.d_model:]))
        y = nn.Dense(self.d_model)(y)
        return ACTIVATIONS_S4[self.final_act](y)


class S4D(nn.Module):
    """Standalone S4D layer (models/s4d.py:84-129), channels-last."""

    d_model: int
    d_state: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = FFTConvLayer(self.d_model, self.d_state, mode="diag",
                         dropout=self.dropout)(x, deterministic)
        y = nn.Dense(2 * self.d_model)(y)
        return y[..., : self.d_model] * jax.nn.sigmoid(y[..., self.d_model:])


class S4Model(nn.Module):
    """1D S4 PDE model (models/s4_1d.py:7-185).

    Input (B, d_input, L) -> (B, d_output, L). The encoder consumes
    d_input + 1 channels (grid concat); layers are bidirectional S4Blocks
    with residual connections. With prenorm=False (shipped config) no
    normalization is applied, reproducing the reference's discarded
    post-norm (s4_1d.py:115-117).
    """

    d_input: int = 1
    d_output: int = 1
    d_model: int = 256
    n_layers: int = 4
    dropout: float = 0.2
    prenorm: bool = False
    mode: str = "dplr"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jnp.swapaxes(x, -1, -2)  # (B, L, d_input)
        x = concat_grid_1d(x, 0.0, 1.0)
        x = nn.Dense(self.d_model)(x)
        for _ in range(self.n_layers):
            z = x
            if self.prenorm:
                z = nn.LayerNorm()(z)
            z = S4Block(self.d_model, mode=self.mode, bidirectional=True,
                        dropout=self.dropout)(z, deterministic)
            if self.dropout > 0.0:
                z = nn.Dropout(self.dropout,
                               deterministic=deterministic)(z)
            x = z + x
            # post-norm intentionally omitted: reference discards it
        x = nn.Dense(self.d_output)(x)
        return jnp.swapaxes(x, -1, -2)


class S4NDLayer(nn.Module):
    """N-dim S4ND layer: one SSM kernel per spatial axis, combined as an
    outer product in frequency space, then an N-dim FFT convolution —
    the reference's arbitrary-`dim` surface (models/s4nd.py:1815-2100
    sizes its kernel list by the input rank). Channels-last:
    x (B, *spatial, C) -> same; the spatial rank is inferred from the
    input, so one module covers 1D/2D/3D.

    mode: 'diag' (per-axis S4D kernels) or 'dplr' (per-axis full-S4 DPLR
    kernels — the reference S4ND's default, s4nd.py:1844 mode='dplr';
    golden transplant in tests/test_reference_parity.py).
    linear: skip the GELU + GLU output transform, matching the reference's
    default `linear=True` (s4nd.py:1838) where S4ND is conv + D-skip only
    and nonlinearity lives in the surrounding model. Our historical default
    keeps the nonlinear tail (PARITY.md #20).

    Param naming: 2D inputs keep the historical kernel_x (axis 0) /
    kernel_y (axis 1) scopes so existing checkpoints and the golden
    transplant keep loading; other ranks use kernel_ax{i}."""

    d_model: int
    d_state: int = 64
    bidirectional: bool = False
    dropout: float = 0.0
    mode: str = "diag"
    linear: bool = False
    kernel_args: Optional[dict] = None  # long-tail options, see FFTConvLayer

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        spatial = x.shape[1:-1]
        ndim = len(spatial)
        if ndim < 1:
            raise ValueError(f"S4NDLayer needs (B, *spatial, C) input with "
                             f"at least one spatial axis, got {x.shape}")
        c = x.shape[-1]
        kc = 2 if self.bidirectional else 1
        kernel_cls = (DPLRKernelLayer if self.mode in ("dplr", "nplr")
                      else S4DKernelLayer)
        kargs = dict(self.kernel_args or {})
        names = (["kernel_x", "kernel_y"] if ndim == 2
                 else [f"kernel_ax{i}" for i in range(ndim)])
        ks = [kernel_cls(self.d_model, self.d_state, channels=kc,
                         name=names[i], **kargs)(spatial[i])  # (kc, C, L_i)
              for i in range(ndim)]
        D = self.param("D", lambda rng, s: jax.random.normal(rng, s), (c,))

        def two_sided(k, L):
            if not self.bidirectional:
                return k[0]  # (C, L)
            return (jnp.pad(k[0], ((0, 0), (0, L)))
                    + jnp.pad(jnp.flip(k[1], -1), ((0, 0), (L, 0))))

        ns = [2 * L for L in spatial]
        fft_axes = tuple(range(2, 2 + ndim))
        xt = jnp.moveaxis(x, -1, 1)  # (B, C, *spatial)
        xf = jnp.fft.rfftn(xt, s=ns, axes=fft_axes)
        # frequency-domain outer product of the per-axis kernels: full fft
        # on every axis except the last, rfft on the last (matching rfftn)
        kf = None
        for i in range(ndim):
            k2 = two_sided(ks[i], spatial[i])  # (C, L_i or 2L_i)
            if i == ndim - 1:
                kfi = jnp.fft.rfft(k2, n=ns[i], axis=-1)
            else:
                kfi = jnp.fft.fft(k2, n=ns[i], axis=-1)
            shape = [c] + [1] * ndim
            shape[1 + i] = kfi.shape[-1]
            kfi = kfi.reshape(shape)
            kf = kfi if kf is None else kf * kfi
        yf = xf * kf[None]
        y = jnp.fft.irfftn(yf, s=ns, axes=fft_axes)
        y = y[(Ellipsis,) + tuple(slice(0, L) for L in spatial)]
        y = y + xt * D.reshape((1, c) + (1,) * ndim)
        y = jnp.moveaxis(y, 1, -1)
        if self.linear:
            # reference default (s4nd.py:1838 linear=True): conv + D only
            return y
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = gelu(y)
        y = nn.Dense(2 * self.d_model)(y)
        return y[..., : self.d_model] * jax.nn.sigmoid(y[..., self.d_model:])


class S4ND2dLayer(S4NDLayer):
    """2D instantiation of S4NDLayer (name kept for checkpoints, configs,
    and the golden transplant; the generic layer accepts any rank)."""


class S4NDModel(nn.Module):
    """2D S4ND PDE model (models/s4_2d.py:8-160).

    Input (B, C_in, H, W) -> (B, d_output, H, W). Encoder consumes the
    actual input channels + 2 grid channels (the reference hard-codes
    d_input*3 + 2 for its 3-field active-matter data, s4_2d.py:29; we infer
    from the input shape). Post-norm IS applied here (s4_2d.py:120)."""

    d_input: int = 1
    d_output: int = 1
    d_model: int = 256
    n_layers: int = 4
    dropout: float = 0.2
    bidirectional: bool = False
    prenorm: bool = False
    mode: str = "diag"        # per-axis kernel: 'diag' | 'dplr'
    s4nd_linear: bool = False  # True = reference's linear S4ND layers

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jnp.moveaxis(x, 1, -1)  # (B, H, W, C)
        x = concat_grid_2d(x, 0.0, 1.0)
        x = nn.Dense(self.d_model)(x)
        for _ in range(self.n_layers):
            z = x
            if self.prenorm:
                z = nn.LayerNorm()(z)
            z = S4ND2dLayer(self.d_model, bidirectional=self.bidirectional,
                            dropout=self.dropout, mode=self.mode,
                            linear=self.s4nd_linear)(z, deterministic)
            if self.dropout > 0.0:
                z = nn.Dropout(self.dropout,
                               deterministic=deterministic)(z)
            x = z + x
            if not self.prenorm:
                x = nn.LayerNorm()(x)
        x = nn.Dense(self.d_output)(x)
        return jnp.moveaxis(x, -1, 1)


def _resolve_dt(kernel_params, dt_transform: str, dt_fast: bool):
    """Resolve the stored dt parameter to positive timesteps, matching the
    kernel layers' in-call resolution (models/s4.py:1053, 1097-1099).
    Returns (H,) or (H, n) per-state (dt_tie=False storage)."""
    log_dt = kernel_params["log_dt"]
    inv_dt = jnp.sinh(log_dt) if dt_fast else log_dt
    return ssm_ops.param_transform(inv_dt, dt_transform)


def s4d_recurrent_step_fn(kernel_params, L_unused=None, disc: str = "zoh",
                          *, dt_transform: str = "exp", dt_fast: bool = False,
                          real_transform: str = "exp",
                          imag_transform: str = "none",
                          is_real: bool = False,
                          bandlimit=None):
    """Build a recurrent step function from S4DKernelLayer params (the
    TPU replacement for _setup_step/step, models/s4.py:1787-1807).

    disc: 'zoh' | 'bilinear' (like the reference's _setup_step,
    s4.py:1196-1206 — 'dss' has no recurrent form there either).
    The dt/transform/is_real keyword options mirror S4DKernelLayer's
    fields and must match the values the layer was constructed with
    (dt_tie=False needs no flag — it is recognized from the stored dt
    shape). Returns (init_state (H, N) complex zeros,
    step(state, u) -> (state, y)) for single-channel kernels; y matches
    the convolutional output exactly (tested in tests/test_s4.py).
    """
    dt = _resolve_dt(kernel_params, dt_transform, dt_fast)
    a_real = -ssm_ops.param_transform(kernel_params["log_A_real"],
                                      real_transform)
    c = kernel_params["C"][0]  # channel 0
    if is_real:
        A = jax.lax.complex(a_real, jnp.zeros_like(a_real))
        C = jax.lax.complex(c, jnp.zeros_like(c))
    else:
        a_imag = kernel_params["A_imag"]
        im = (a_imag if imag_transform == "none"
              else -ssm_ops.param_transform(a_imag, imag_transform))
        A = jax.lax.complex(a_real, im)
        C = jax.lax.complex(c[..., 0], c[..., 1])
    if A.shape[0] != C.shape[0]:  # n_ssm-tied copies (tiled, h mod S)
        A = jnp.tile(A, (C.shape[0] // A.shape[0], 1))
    dt_cols = dt[:, None] if dt.ndim == 1 else dt  # per-state if tie=False
    if bandlimit is not None:
        # mask C above the bandlimit exactly like the conv path
        # (models/s4.py:1101-1103)
        freqs = dt_cols * jnp.abs(jnp.imag(A)) / (2.0 * math.pi)
        C = C * (freqs < bandlimit * 0.5).astype(C.real.dtype)
    if disc == "zoh":
        Ab, dB = ssm_ops.discretize_diag_zoh(A, None, dt=dt_cols)
    elif disc == "bilinear":
        Ab, dB = ssm_ops.discretize_diag_bilinear(A, None, dt=dt_cols)
    else:
        raise ValueError(
            f"no recurrent form for disc={disc!r} (reference supports "
            "zoh/bilinear only, models/s4.py:1196-1206)")
    h, n_half = A.shape

    def init_state(batch: int):
        return jnp.zeros((batch, h, n_half), dtype=jnp.complex64)

    def step(state, u):
        """state (B, H, N/2); u (B, H) -> (new_state, y (B, H))."""
        new_state = Ab[None] * state + dB[None] * u[..., None]
        y = 2.0 * jnp.real(jnp.sum(C[None] * new_state, axis=-1))
        return new_state, y

    return init_state, step


def dplr_recurrent_step_fn(kernel_params, L: int, *,
                           dt_transform: str = "exp", dt_fast: bool = False,
                           real_transform: str = "exp",
                           bandlimit=None):
    """Recurrent step for the FULL S4 (DPLR) kernel — the TPU replacement
    for SSMKernelDPLR._setup_step/step (models/s4.py:1190-1218, 1787-1807).

    kernel_params: a DPLRKernelLayer param subtree. L is the kernel length
    the layer was trained at (the C recovery inverts I - Abar^L). The
    dt/transform keyword options mirror DPLRKernelLayer's fields and must
    match the layer's construction; dt_tie=False storage ((H, N/2) per
    conjugate pair) is recognized from the stored dt shape and broadcast
    to both halves of the full-N spectrum, exactly like the conv path.
    Returns (init_state, step) with state (B, H, N) complex; y matches the
    convolutional output exactly (tests/test_s4.py).
    """
    dt = _resolve_dt(kernel_params, dt_transform, dt_fast)  # (H,)|(H,N/2)
    Lam = jax.lax.complex(
        -ssm_ops.param_transform(kernel_params["Lambda_log_neg_re"],
                                 real_transform),
        kernel_params["Lambda_im"])                         # (S, N)
    P = jax.lax.complex(kernel_params["P_vec"][..., 0],
                        kernel_params["P_vec"][..., 1])    # (S,N)|(R,S,N)
    B = jax.lax.complex(kernel_params["B_vec"][..., 0],
                        kernel_params["B_vec"][..., 1])
    c = kernel_params["C"][0]                              # channel 0
    C_t = jax.lax.complex(c[..., 0], c[..., 1])            # (H, N)
    if Lam.shape[0] != C_t.shape[0]:  # n_ssm-tied copies (tiled)
        rep = C_t.shape[0] // Lam.shape[0]
        Lam = jnp.tile(Lam, (rep, 1))
        B = jnp.tile(B, (rep, 1))
        P = (jnp.tile(P, (rep, 1)) if P.ndim == 2
             else jnp.tile(P, (1, rep, 1)))

    if dt.ndim == 2:  # dt_tie=False: per pair -> both spectrum halves
        dt = jnp.concatenate([dt, dt], axis=-1)            # (H, N)
    if bandlimit is not None:
        # mask the trained C-tilde above the bandlimit BEFORE the stepping-C
        # recovery, exactly like the conv path (models/s4.py:1101-1103)
        dt_b = dt[:, None] if dt.ndim == 1 else dt
        freqs = dt_b * jnp.abs(jnp.imag(Lam)) / (2.0 * math.pi)
        C_t = C_t * (freqs < bandlimit * 0.5).astype(C_t.real.dtype)
    p_axis = 0 if P.ndim == 2 else 1  # rank-general storage layout
    Ab, Bb, C = jax.vmap(
        lambda lam, p, b, ct, d: ssm_ops.discretize_dplr(
            lam, p, b, ct, None, L, dt=d),
        in_axes=(0, p_axis, 0, 0, 0),
    )(Lam, P, B, C_t, dt)                                  # (H,N,N),(H,N),(H,N)
    h, n = Lam.shape

    def init_state(batch: int):
        return jnp.zeros((batch, h, n), dtype=Ab.dtype)

    def step(state, u):
        """state (B, H, N); u (B, H) -> (new_state, y (B, H))."""
        new_state = (jnp.einsum("hij,bhj->bhi", Ab, state)
                     + Bb[None] * u[..., None])
        y = jnp.real(jnp.einsum("hn,bhn->bh", jnp.conj(C), new_state))
        return new_state, y

    return init_state, step
