"""Kuramoto-Sivashinsky solver (ETDRK4, pseudo-spectral).

The reference consumes externally generated KS data (LPSDA invocations in
run1.sh:146-192, files under res_{R}/visc_.../KS_train_*.h5); this module
makes the framework self-sufficient: it generates KS trajectories in that
exact file format (see datagen/writers.py).

PDE: u_t + u u_x + u_xx + visc * u_xxxx = 0 on [0, L], periodic.
ETDRK4 (Kassam & Trefethen 2005) with contour-integral phi-functions for
stability; integration is a lax.scan — one compiled program on TPU.

The state is the HALF spectrum (rfft): evolving the full complex spectrum
with `real(ifft(.))` inside the nonlinearity — as the original kursiv.m
does — leaves the conjugate-ASYMMETRIC component of v with zero nonlinear
feedback, so roundoff (~1e-16) in the linearly unstable band grows at the
pure linear rate (max k^2 - visc k^4 = 1/(4 visc)) and overflows at
t ~ 4 visc ln(1/eps): t~150 for the classic L=32pi case in f64. rfft
enforces conjugate symmetry by construction, halves the work, and makes
arbitrarily long integrations stable (regression: tests/test_datagen.py).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def _etdrk4_coeffs(lin, dt: float, n_contour: int = 32):
    """Stable phi-function coefficients via contour integral (numpy, once)."""
    lc = lin.astype(np.complex128) * dt
    r = np.exp(2j * np.pi * (np.arange(1, n_contour + 1) - 0.5) / n_contour)
    lr = lc[:, None] + r[None, :]
    q = np.real(np.mean((np.exp(lr / 2) - 1) / lr, axis=1)) * dt
    f1 = np.real(np.mean(
        (-4 - lr + np.exp(lr) * (4 - 3 * lr + lr ** 2)) / lr ** 3, axis=1)) * dt
    f2 = np.real(np.mean(
        (2 + lr + np.exp(lr) * (-2 + lr)) / lr ** 3, axis=1)) * dt
    f3 = np.real(np.mean(
        (-4 - 3 * lr - lr ** 2 + np.exp(lr) * (4 - lr)) / lr ** 3, axis=1)) * dt
    e = np.exp(dt * lin)
    e2 = np.exp(dt * lin / 2)
    return e, e2, q, f1, f2, f3


@partial(jax.jit, static_argnames=("L", "visc", "dt", "n_snapshots",
                                   "steps_per_snapshot"))
def solve_ks(u0, L: float = 64.0, visc: float = 1.0, dt: float = 0.05,
             n_snapshots: int = 51, steps_per_snapshot: int = 40):
    """Integrate KS from u0 (B, N). Returns (B, n_snapshots, N) with the
    initial condition as snapshot 0."""
    n = u0.shape[-1]
    k = 2 * np.pi * np.fft.rfftfreq(n, d=L / n)  # half-spectrum wavenumbers
    lin = k ** 2 - visc * k ** 4  # -(-u_xx - visc u_xxxx)
    e, e2, q, f1, f2, f3 = _etdrk4_coeffs(lin, dt)
    e, e2, q, f1, f2, f3 = map(jnp.asarray, (e, e2, q, f1, f2, f3))
    ik = jnp.asarray(1j * k)
    k_max = k.max()
    dealias = jnp.asarray((k <= (2.0 / 3.0) * k_max).astype(np.float64))

    def nonlin(v):
        u = jnp.fft.irfft(v, n=n, axis=-1)
        return -0.5 * ik * jnp.fft.rfft(u * u, axis=-1) * dealias

    def step(v):
        nv = nonlin(v)
        a = e2 * v + q * nv
        na = nonlin(a)
        b = e2 * v + q * na
        nb = nonlin(b)
        c = e2 * a + q * (2 * nb - nv)
        nc = nonlin(c)
        return e * v + nv * f1 + 2 * (na + nb) * f2 + nc * f3

    v0 = jnp.fft.rfft(u0.astype(jnp.float64)
                      if jax.config.jax_enable_x64 else u0, axis=-1)

    def chunk(v, _):
        v = jax.lax.fori_loop(0, steps_per_snapshot, lambda i, s: step(s), v)
        return v, jnp.fft.irfft(v, n=n, axis=-1)

    _, snaps = jax.lax.scan(chunk, v0, None, length=n_snapshots - 1)
    traj = jnp.concatenate(
        [u0[:, None].astype(snaps.dtype), jnp.moveaxis(snaps, 0, 1)], axis=1)
    return traj.astype(jnp.float32)


def random_ks_initial_conditions(key, n: int, size: int, L: float = 64.0,
                                 lmax: int = 8):
    """Band-limited random initial conditions u0(x) = sum_{l<=lmax}
    a_l sin/cos(2 pi l x / L) (the LPSDA-style lmax cutoff in the KS
    directory naming, conf/dataset/ks/ks_naive_true_mres1.yaml:5)."""
    x = np.arange(size) / size * L
    ka, kp = jax.random.split(key)
    ls = np.arange(1, lmax + 1)
    amps = jax.random.normal(ka, (n, lmax))
    phases = jax.random.uniform(kp, (n, lmax), minval=0, maxval=2 * np.pi)
    arg = jnp.asarray((2 * np.pi / L) * np.outer(ls, x))  # (lmax, N)
    return jnp.sum(
        amps[:, :, None] * jnp.sin(arg[None] + phases[:, :, None]), axis=1)
