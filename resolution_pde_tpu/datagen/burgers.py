"""1D viscous Burgers solver (pseudo-spectral, ETDRK4-free semi-implicit).

Generates PDEBench-format Burgers trajectories ('tensor'/'x-coordinate',
the format dataloaders/burger_naive_markov.py reads). PDE:
u_t + u u_x = nu u_xx on [0, 1), periodic.

Integration: spectral Crank-Nicolson for diffusion + explicit Adams-
Bashforth-like treatment of the advection term, 2/3 dealiasing; lax.scan.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("nu", "dt", "n_snapshots",
                                   "steps_per_snapshot"))
def solve_burgers(u0, nu: float = 1e-3, dt: float = 1e-4,
                  n_snapshots: int = 201, steps_per_snapshot: int = 100):
    """u0: (B, N) on [0, 1). Returns (B, n_snapshots, N), snapshot 0 = u0."""
    n = u0.shape[-1]
    # half-spectrum state (rfft): conjugate symmetry by construction —
    # see datagen/ks.py for why real(ifft(.)) full-spectrum stepping is
    # unsafe (here the CN diffusion damps the asymmetric component, but
    # rfft is still exact and half the work)
    k = 2 * np.pi * np.fft.rfftfreq(n, d=1.0 / n)
    lap = -(k ** 2)
    cn_num = jnp.asarray(1.0 + 0.5 * dt * nu * lap)
    cn_den = jnp.asarray(1.0 - 0.5 * dt * nu * lap)
    ik = jnp.asarray(1j * k)
    k_max = k.max()
    dealias = jnp.asarray((k <= (2.0 / 3.0) * k_max).astype(np.float32))

    def step(v):
        u = jnp.fft.irfft(v, n=n, axis=-1)
        nl = -0.5 * ik * jnp.fft.rfft(u * u, axis=-1) * dealias
        return (cn_num * v + dt * nl) / cn_den

    v0 = jnp.fft.rfft(u0, axis=-1)

    def chunk(v, _):
        v = jax.lax.fori_loop(0, steps_per_snapshot, lambda i, s: step(s), v)
        return v, jnp.fft.irfft(v, n=n, axis=-1)

    _, snaps = jax.lax.scan(chunk, v0, None, length=n_snapshots - 1)
    traj = jnp.concatenate([u0[:, None], jnp.moveaxis(snaps, 0, 1)], axis=1)
    return traj.astype(jnp.float32)
