"""2D Navier-Stokes (vorticity form) pseudo-spectral solver.

Parity target: data_generation/ns_2d.py:26-128 — Poisson solve for the
streamfunction in Fourier space, spectral derivatives for velocity and
vorticity gradients, nonlinear term formed in physical space with 2/3-rule
dealiasing, Crank-Nicolson semi-implicit update; snapshots recorded every
floor(steps/record_steps) steps. The reference runs on the removed
torch.rfft API (torch <= 1.7); this is the modern complex-FFT formulation.

Full-spectrum stepping with real(ifft2(.)) projections is safe HERE
(unlike datagen/ks.py, which must use rfft): the linear operator
-visc k^2 is pure decay, so the conjugate-asymmetric roundoff component
is damped rather than amplified.

TPU design: the whole time integration is a lax.scan of fori_loop chunks —
one compiled program, no per-step host round-trips; batched over initial
conditions.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("visc", "T", "delta_t", "record_steps"))
def navier_stokes_2d(w0, f, visc: float, T: float, delta_t: float = 1e-4,
                     record_steps: int = 1):
    """Integrate the 2D NS vorticity equation.

    w0: (B, N, N) initial vorticity; f: (N, N) forcing.
    Returns (sol (B, N, N, record_steps), sol_t (record_steps,)).
    """
    n = w0.shape[-1]
    k_max = n // 2
    steps = math.ceil(T / delta_t)
    record_time = steps // record_steps

    k = np.concatenate([np.arange(0, k_max), np.arange(-k_max, 0)])
    k_y = np.broadcast_to(k[None, :], (n, n)).astype(np.float32)
    k_x = k_y.T
    lap = 4 * (np.pi ** 2) * (k_x ** 2 + k_y ** 2)
    lap[0, 0] = 1.0
    dealias = ((np.abs(k_y) <= (2.0 / 3.0) * k_max)
               & (np.abs(k_x) <= (2.0 / 3.0) * k_max)).astype(np.float32)

    k_x = jnp.asarray(k_x)
    k_y = jnp.asarray(k_y)
    lap = jnp.asarray(lap)
    dealias = jnp.asarray(dealias)

    w_h0 = jnp.fft.fft2(w0)
    f_h = jnp.fft.fft2(f)[None]  # broadcast over batch

    cn_num = 1.0 - 0.5 * delta_t * visc * lap
    cn_den = 1.0 + 0.5 * delta_t * visc * lap

    def step(w_h):
        psi_h = w_h / lap
        # u = psi_y -> (2 pi i k_y) psi ; v = -psi_x -> (-2 pi i k_x) psi
        q = jnp.real(jnp.fft.ifft2((2j * jnp.pi * k_y) * psi_h))
        v = jnp.real(jnp.fft.ifft2((-2j * jnp.pi * k_x) * psi_h))
        w_x = jnp.real(jnp.fft.ifft2((2j * jnp.pi * k_x) * w_h))
        w_y = jnp.real(jnp.fft.ifft2((2j * jnp.pi * k_y) * w_h))
        F_h = jnp.fft.fft2(q * w_x + v * w_y) * dealias
        return (-delta_t * F_h + delta_t * f_h + cn_num * w_h) / cn_den

    def record_chunk(w_h, _):
        w_h = jax.lax.fori_loop(0, record_time, lambda i, s: step(s), w_h)
        return w_h, jnp.real(jnp.fft.ifft2(w_h))

    _, snaps = jax.lax.scan(record_chunk, w_h0, None, length=record_steps)
    sol = jnp.moveaxis(snaps, 0, -1)  # (B, N, N, record_steps)
    sol_t = (jnp.arange(1, record_steps + 1) * record_time) * delta_t
    return sol, sol_t


def generate_ns_dataset(key, n_samples: int, s: int = 256,
                        viscosity: float = 1e-4, T: float = 3.2,
                        delta_t: float = 1e-4, record_steps: int = 32,
                        batch_size: int = 50, alpha: float = 2.5,
                        tau: float = 7.0):
    """Driver parity (data_generation/ns_2d.py:131-193): GRF(alpha=2.5,
    tau=7) initial conditions, forcing 0.1(sin+cos)(2 pi (x+y)).

    Returns (a (n, s, s), u (n, s, s, record_steps), t (record_steps,)).
    """
    from resolution_pde_tpu.datagen.random_fields import GaussianRF

    grf = GaussianRF(2, s, alpha=alpha, tau=tau)
    t_lin = np.linspace(0, 1, s + 1)[:-1]
    X, Y = np.meshgrid(t_lin, t_lin, indexing="ij")
    f = jnp.asarray(0.1 * (np.sin(2 * math.pi * (X + Y))
                           + np.cos(2 * math.pi * (X + Y))), jnp.float32)

    a_all, u_all = [], []
    sol_t = None
    for start in range(0, n_samples, batch_size):
        b = min(batch_size, n_samples - start)
        key, sub = jax.random.split(key)
        w0 = grf.sample(sub, b)
        sol, sol_t = navier_stokes_2d(w0, f, viscosity, T, delta_t,
                                      record_steps)
        a_all.append(np.asarray(w0))
        u_all.append(np.asarray(sol))
    return (np.concatenate(a_all), np.concatenate(u_all),
            np.asarray(sol_t))
