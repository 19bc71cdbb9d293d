"""Steady-state 2D Darcy flow generator (TPU, batched CG).

The reference has NO Darcy generator — its darcy family reads PDEBench's
`darcy_flow_beta_*.hdf5` (conf/dataset/darcy_flow/darcy_flow_0.01.yaml,
dataloaders/darcy_loader.py:7-126), which this module materializes without
egress:

    -div( a(x) grad u(x) ) = beta   on (0,1)^2,   u = 0 on the boundary

with the PDEBench/FNO-paper coefficient convention: a(x) is piecewise
constant, thresholded from a Gaussian random field (a_plus where GRF >= 0,
a_minus elsewhere; FNO paper uses 12/3).

TPU design: the 5-point finite-volume operator (harmonic face averages)
is a stencil matvec under `jax.scipy.sparse.linalg.cg`, vmapped over the
batch — one jitted program solves the whole batch on-device; no host
round-trips until the final fetch.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _face_coeffs(a):
    """Harmonic-mean face coefficients of a cell-centered (s, s) field.

    Returns (ax, ay): ax (s, s-1) for vertical faces between columns,
    ay (s-1, s) for horizontal faces between rows."""
    ax = 2.0 * a[:, :-1] * a[:, 1:] / (a[:, :-1] + a[:, 1:])
    ay = 2.0 * a[:-1, :] * a[1:, :] / (a[:-1, :] + a[1:, :])
    return ax, ay


def _apply_operator(a, u):
    """-div(a grad u) on an (s, s) cell grid with u=0 Dirichlet ghosts.

    Boundary faces take the cell's own coefficient (ghost cell mirrors a,
    holds u=0). Grid spacing h = 1/s; returns the same (s, s) shape."""
    s = u.shape[-1]
    h2 = (1.0 / s) ** 2
    ax, ay = _face_coeffs(a)

    # interior flux differences: dx[i, j] is the flux through the face
    # between cells (i, j) and (i, j+1); a cell's x-contribution is
    # (east-face flux) - (west-face flux), with zero in the pad slots
    # (boundary faces enter through the wall closure below)
    dx = ax * (u[:, 1:] - u[:, :-1])
    dy = ay * (u[1:, :] - u[:-1, :])
    lap = (jnp.pad(dx, ((0, 0), (0, 1))) - jnp.pad(dx, ((0, 0), (1, 0)))
           + jnp.pad(dy, ((0, 1), (0, 0))) - jnp.pad(dy, ((1, 0), (0, 0))))

    # Dirichlet boundary: ghost u = 0 with face coefficient a_cell, i.e.
    # flux through the wall = a_cell * (0 - u_cell) * 2 (half-cell
    # distance). The factor 2 is the standard ghost-cell Dirichlet
    # closure at distance h/2.
    wall = jnp.zeros_like(u)
    wall = wall.at[:, 0].add(2.0 * a[:, 0] * u[:, 0])
    wall = wall.at[:, -1].add(2.0 * a[:, -1] * u[:, -1])
    wall = wall.at[0, :].add(2.0 * a[0, :] * u[0, :])
    wall = wall.at[-1, :].add(2.0 * a[-1, :] * u[-1, :])

    return -(lap - wall) / h2


from functools import partial


@partial(jax.jit, static_argnames=("beta", "tol", "maxiter"))
def _solve_darcy_batch(a, beta: float, tol: float, maxiter: int):
    """Batched CG solve — module-level jit so repeated per-chunk calls in
    the generation loop reuse ONE compiled program per (shape, args)."""
    s = a.shape[-1]
    f = jnp.full((s, s), float(beta), a.dtype)

    def solve_one(ai):
        op = lambda u: _apply_operator(ai, u)
        # Jacobi (diagonal) preconditioner: the stencil diagonal is the
        # sum of face coefficients + wall closure, scaled by 1/h^2
        ax, ay = _face_coeffs(ai)
        diag = (jnp.pad(ax, ((0, 0), (0, 1))) + jnp.pad(ax, ((0, 0), (1, 0)))
                + jnp.pad(ay, ((0, 1), (0, 0)))
                + jnp.pad(ay, ((1, 0), (0, 0))))
        diag = diag.at[:, 0].add(2.0 * ai[:, 0])
        diag = diag.at[:, -1].add(2.0 * ai[:, -1])
        diag = diag.at[0, :].add(2.0 * ai[0, :])
        diag = diag.at[-1, :].add(2.0 * ai[-1, :])
        diag = diag / (1.0 / s) ** 2
        u, _ = jax.scipy.sparse.linalg.cg(op, f, tol=tol, maxiter=maxiter,
                                          M=lambda r: r / diag)
        # relative residual of the returned iterate, so callers can
        # REJECT unconverged/NaN solves instead of shipping them
        res = jnp.linalg.norm(op(u) - f) / jnp.linalg.norm(f)
        return u, res

    return jax.vmap(solve_one)(a)


def solve_darcy(a, beta: float = 1.0, tol: float = 1e-6,
                maxiter: int | None = None, max_residual: float = 1e-2):
    """Solve -div(a grad u) = beta for a batch of coefficient fields.

    a: (n, s, s) positive coefficients. Solves in f32 (f64 when the
    caller enables jax_enable_x64; nothing in-repo does — the Jacobi-CG
    iterate at tol=1e-6 lands well under the max_residual gate in f32
    for the shipped 12/3 contrast). Raises if any solve's relative
    residual ||Au - f||/||f|| exceeds `max_residual` or is non-finite —
    an unconverged solve must never be written to a dataset."""
    a = jnp.asarray(a, jnp.float64 if jax.config.jax_enable_x64
                    else jnp.float32)
    if maxiter is None:
        maxiter = 40 * a.shape[-1]
    u, res = _solve_darcy_batch(a, float(beta), float(tol), int(maxiter))
    res = np.asarray(res)
    if not np.isfinite(res).all() or res.max() > max_residual:
        raise RuntimeError(
            f"Darcy CG failed to converge: relative residuals "
            f"{res.tolist()} (gate {max_residual}); raise maxiter "
            f"({maxiter}) or loosen the gate")
    return u


def generate_darcy_dataset(key, n_samples: int, s: int = 128,
                           beta: float = 1.0, a_plus: float = 12.0,
                           a_minus: float = 3.0, alpha: float = 2.0,
                           tau: float = 3.0, batch_size: int = 32):
    """PDEBench-style Darcy dataset: thresholded-GRF coefficients and the
    CG-solved pressure field.

    Returns (a (n, s, s), u (n, s, s)) float32."""
    from resolution_pde_tpu.datagen.random_fields import GaussianRF

    grf = GaussianRF(2, s, alpha=alpha, tau=tau)
    a_out, u_out = [], []
    for i in range(0, n_samples, batch_size):
        nb = min(batch_size, n_samples - i)
        key, sub = jax.random.split(key)
        z = grf.sample(sub, nb)
        a = jnp.where(z >= 0, a_plus, a_minus)
        u = solve_darcy(a, beta=beta)
        a_out.append(np.asarray(a, np.float32))
        u_out.append(np.asarray(u, np.float32))
    return np.concatenate(a_out), np.concatenate(u_out)
