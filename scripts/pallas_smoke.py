#!/usr/bin/env python
"""Compiled-Mosaic smoke for every Pallas kernel on the attached TPU.

The test suite exercises these kernels in interpret mode on CPU; after a
backend/runtime update, compiled-path breakage would otherwise surface
only via the headline bench (VERDICT r3 weak #4). This script compiles
and runs each kernel on the real chip (interpret=False) and checks it
against its jnp formulation in f32, one PASS/FAIL line per kernel:

    python scripts/pallas_smoke.py          # on the TPU, takes tpu_lock
    python scripts/pallas_smoke.py --cpu    # interpret-mode sanity run

Kernels: fused_ff fwd / bwd (recompute) / bwd (saved-activations),
spectral_mix (fused 1D axis pass, fwd+vjp), spectral_mix2 (packed-complex
2D pass, fwd+grad), cauchy, dplr_kernel, vandermonde (S4D).

Exit status: nonzero if any kernel FAILs. Wired into the family script's
probe loop (scripts/run_baseline_and_ladders.sh).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPU = "--cpu" in sys.argv
if CPU:
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["RPDE_PLATFORM"] = "cpu"

import numpy as np  # noqa: E402

_FAILURES = []


def _cpu_reference(code: str, **arrays) -> dict:
    """Compute the complex-kernel REFERENCE values in a CPU child.

    Compiled complex-arithmetic XLA programs are not guaranteed on the
    tunnel backend (a backend update turned them UNIMPLEMENTED mid-build
    while every Pallas kernel still compiled fine), and the references
    never needed the chip. `code` runs with `A` (the input arrays) and
    `ssm_ops` in scope and must fill the `OUT` dict."""
    import subprocess
    import tempfile

    from resolution_pde_tpu.utils.backend_probe import child_env

    fi, fin = tempfile.mkstemp(suffix=".npz")
    os.close(fi)
    fo, fout = tempfile.mkstemp(suffix=".npz")
    os.close(fo)
    np.savez(fin, **arrays)
    src = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from resolution_pde_tpu.ops import ssm as ssm_ops\n"
        f"A = dict(np.load({fin!r}))\n"
        "OUT = {}\n"
        + code
        + f"\nnp.savez({fout!r}, **OUT)\n")
    try:
        r = subprocess.run([sys.executable, "-c", src], env=child_env())
        if r.returncode != 0:
            raise RuntimeError(f"cpu reference child exited {r.returncode}")
        return dict(np.load(fout))
    finally:
        os.unlink(fin)
        os.unlink(fout)


def check(name: str, got, want, rtol: float, atol: float):
    got = np.asarray(got, np.float64) if not np.iscomplexobj(
        np.asarray(got)) else np.asarray(got)
    want_a = np.asarray(want)
    diff = np.max(np.abs(np.asarray(got) - want_a))
    scale = np.max(np.abs(want_a)) + 1e-12
    ok = bool(diff <= atol + rtol * scale)
    print(f"{'PASS' if ok else 'FAIL'}  {name:<28} "
          f"max|diff| {diff:.3e} (tol {atol + rtol * scale:.3e})",
          flush=True)
    if not ok:
        _FAILURES.append(name)


def main():
    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from resolution_pde_tpu.ops import ssm as ssm_ops
    from resolution_pde_tpu.ops.pallas.cauchy import (cauchy_pallas,
                                                      dplr_kernel_pallas)
    from resolution_pde_tpu.ops.pallas.fused_ff import fused_feedforward
    from resolution_pde_tpu.ops.pallas.spectral_mix import (
        truncated_spectral_mix_1d)
    from resolution_pde_tpu.ops.pallas.spectral_mix2 import (
        factorized_spectral_conv_2d_pallas2)
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_1d, factorized_spectral_conv_2d_dft_v3)

    interp = CPU
    rng = np.random.default_rng(0)
    print(f"pallas smoke on backend={jax.default_backend()} "
          f"(interpret={interp})", flush=True)

    # ---- fused_ff: fwd + vjp (recompute and saved-activation backwards)
    dim, factor, n_layers = 64, 4, 3
    dims = [dim] + [dim * factor] * (n_layers - 1) + [dim]
    kernels = tuple(jnp.asarray(rng.standard_normal(
        (dims[i], dims[i + 1])) * 0.1, jnp.float32) for i in range(n_layers))
    biases = tuple(jnp.asarray(rng.standard_normal(dims[i + 1]) * 0.1,
                               jnp.float32) for i in range(n_layers))
    ln = (jnp.full((dim,), 1.1, jnp.float32),
          jnp.full((dim,), -0.2, jnp.float32))
    x = jnp.asarray(rng.standard_normal((8, 256, dim)), jnp.float32)

    def ref_ff(x, kernels, biases, ln):
        h = x
        for i, (k, b) in enumerate(zip(kernels, biases)):
            h = h @ k + b
            if i < n_layers - 1:
                h = jax.nn.gelu(h, approximate=True)
        mu = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
        return (h - mu) / jnp.sqrt(var + 1e-5) * ln[0] + ln[1] + x

    def fused(x, kernels, biases, ln, save):
        return fused_feedforward(x, kernels, biases, ln, residual=x,
                                 approx_gelu=True,
                                 compute_dtype=jnp.float32,
                                 interpret=interp, save_acts=save)

    with jax.default_matmul_precision("highest"):
        out = jax.jit(lambda *a: fused(*a, False))(x, kernels, biases, ln)
        ref = jax.jit(ref_ff)(x, kernels, biases, ln)
        check("fused_ff fwd", out, ref, 2e-4, 2e-4)

        def loss_f(save):
            return lambda x, k, b, l: jnp.sum(jnp.sin(fused(x, k, b, l,
                                                            save)))

        loss_r = lambda x, k, b, l: jnp.sum(jnp.sin(ref_ff(x, k, b, l)))  # noqa: E731
        g_ref = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(
            x, kernels, biases, ln)
        for label, save in (("fused_ff bwd (recompute)", False),
                            ("fused_ff bwd (saved)", True)):
            g = jax.jit(jax.grad(loss_f(save), argnums=(0, 1, 2, 3)))(
                x, kernels, biases, ln)
            d = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                    for a, b in zip(jax.tree_util.tree_leaves(g),
                                    jax.tree_util.tree_leaves(g_ref)))
            check(label, d, 0.0, 0.0, 5e-3)

        # ---- spectral_mix: fused 1D axis pass, fwd + vjp
        r, w, c, m = 512, 64, 32, 16
        xs = jnp.asarray(rng.standard_normal((r, w, c)), jnp.float32)
        wt = jnp.asarray(rng.standard_normal((c, c, m, 2)) * 0.1,
                         jnp.float32)
        got = jax.jit(lambda x, wt: truncated_spectral_mix_1d(
            x, wt, m, interpret=interp))(xs, wt)
        want = jax.jit(lambda x, wt: factorized_spectral_conv_1d(
            x, wt, m))(xs, wt)
        check("spectral_mix fwd", got, want, 5e-4, 5e-4)
        gm = jax.jit(jax.grad(lambda x, wt: jnp.sum(jnp.sin(
            truncated_spectral_mix_1d(x, wt, m, interpret=interp))),
            argnums=(0, 1)))(xs, wt)
        gr = jax.jit(jax.grad(lambda x, wt: jnp.sum(jnp.sin(
            factorized_spectral_conv_1d(x, wt, m))), argnums=(0, 1)))(xs, wt)
        d = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(gm, gr))
        check("spectral_mix vjp", d, 0.0, 0.0, 5e-3)

        # ---- spectral_mix2: packed-complex 2D pass, fwd + grad
        x2 = jnp.asarray(rng.standard_normal((2, 64, 64, 32)), jnp.float32)
        wy = jnp.asarray(rng.standard_normal((32, 32, 16, 2)) * 0.1,
                         jnp.float32)
        wx = jnp.asarray(rng.standard_normal((32, 32, 16, 2)) * 0.1,
                         jnp.float32)
        got = jax.jit(lambda x, wy, wx: factorized_spectral_conv_2d_pallas2(
            x, wy, wx, 16, compute_dtype=jnp.float32,
            interpret=interp))(x2, wy, wx)
        want = jax.jit(lambda x, wy, wx: factorized_spectral_conv_2d_dft_v3(
            x, wy, wx, 16))(x2, wy, wx)
        check("spectral_mix2 fwd", got, want, 5e-4, 5e-4)
        g2 = jax.jit(jax.grad(lambda x, wy, wx: jnp.sum(
            factorized_spectral_conv_2d_pallas2(
                x, wy, wx, 16, compute_dtype=jnp.float32,
                interpret=interp) ** 2), argnums=(0, 1, 2)))(x2, wy, wx)
        g2r = jax.jit(jax.grad(lambda x, wy, wx: jnp.sum(
            factorized_spectral_conv_2d_dft_v3(x, wy, wx, 16) ** 2),
            argnums=(0, 1, 2)))(x2, wy, wx)
        d = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(g2, g2r))
        check("spectral_mix2 grad", d, 0.0, 0.0, 1e-2)

    # ---- cauchy (complex arrays built in NUMPY: eager complex arithmetic
    # on device arrays is UNIMPLEMENTED on this backend; complex values
    # enter only as jit arguments)
    # (kept as NUMPY: even the eager complex host->device transfer is
    # UNIMPLEMENTED on this backend; jit argument transfers work)
    h, n, L = 16, 64, 512
    lam = (-(0.1 + rng.uniform(0, 1, (h, n)))
           + 1j * rng.standard_normal((h, n))).astype(np.complex64)
    v = (rng.standard_normal((4, h, n))
         + 1j * rng.standard_normal((4, h, n))).astype(np.complex64)
    g = (rng.standard_normal((h, L))
         + 1j * rng.standard_normal((h, L))).astype(np.complex64)
    # complex stays strictly INTERNAL to the jit (backend update, round 5:
    # complex64 jit arguments/results raise UNIMPLEMENTED at the host
    # boundary; real-in/real-out programs with internal complex math work)
    def _c(re, im):
        return re + 1j * im

    def _parts(a):
        return (np.ascontiguousarray(a.real), np.ascontiguousarray(a.imag))

    re_, im_ = jax.jit(lambda vr, vi, gr, gi, lr, li: (
        lambda o: (o.real, o.imag))(cauchy_pallas(
            _c(vr, vi), _c(gr, gi), _c(lr, li), interpret=interp)))(
        *_parts(v), *_parts(g), *_parts(lam))
    got = np.asarray(re_) + 1j * np.asarray(im_)
    want = _cpu_reference(
        "OUT['want'] = np.asarray(jax.jit(jax.vmap(jax.vmap("
        "ssm_ops.cauchy, (0, 0, 0)), (0, None, None)))("
        "A['v'], A['g'], A['lam']))",
        v=v, g=g, lam=lam)["want"]
    check("cauchy", got, want, 5e-4, 5e-4)

    # ---- dplr kernel
    Lam0, P0, B0, _ = ssm_ops.make_dplr_hippo(n)
    Lam = np.broadcast_to(np.asarray(Lam0), (h, n)).astype(np.complex64)
    P = np.broadcast_to(np.asarray(P0), (h, n)).astype(np.complex64)
    B = np.broadcast_to(np.asarray(B0), (h, n)).astype(np.complex64)
    C_t = (rng.standard_normal((h, n))
           + 1j * rng.standard_normal((h, n))).astype(np.complex64)
    log_dt = np.log(rng.uniform(1e-3, 1e-1, h)).astype(np.float32)
    got = jax.jit(lambda lr, li, pr, pi, br, bi, cr, ci, d:
                  dplr_kernel_pallas(_c(lr, li), _c(pr, pi), _c(br, bi),
                                     _c(cr, ci), d, L, interpret=interp))(
        *_parts(Lam), *_parts(P), *_parts(B), *_parts(C_t), log_dt)
    want = _cpu_reference(
        "OUT['want'] = np.asarray(jax.jit(jax.vmap("
        f"lambda l, p, b, c, d: ssm_ops.dplr_kernel(l, p, b, c, d, {L})))("
        "A['Lam'], A['P'], A['B'], A['C_t'], A['log_dt']))",
        Lam=Lam, P=P, B=B, C_t=C_t, log_dt=log_dt)["want"]
    check("dplr_kernel", got, want, 1e-3, 1e-3)

    # ---- vandermonde (S4D)
    la, ai = ssm_ops.s4d_lin_init(h, n)
    A = (-np.exp(np.asarray(la))
         + 1j * np.asarray(ai)).astype(np.complex64)
    C = (rng.standard_normal((h, n))
         + 1j * rng.standard_normal((h, n))).astype(np.complex64)
    got = jax.jit(lambda cr, ci, ar, ai_, d: ssm_ops_pallas_vandermonde(
        _c(cr, ci), _c(ar, ai_), d, L, interp))(
        *_parts(C), *_parts(A), log_dt)
    want = _cpu_reference(
        "OUT['want'] = np.asarray(jax.jit("
        f"lambda C, A_, d: ssm_ops.s4d_kernel_zoh(C, A_, d, {L}))("
        "A['C'], A['Amat'], A['log_dt']))",
        C=C, Amat=A, log_dt=log_dt)["want"]
    check("vandermonde (s4d)", got, want, 1e-3, 1e-3)

    if _FAILURES:
        raise SystemExit(f"PALLAS SMOKE FAILED: {_FAILURES}")
    print("PALLAS SMOKE: all kernels PASS")


def ssm_ops_pallas_vandermonde(C, A, log_dt, L, interp):
    from resolution_pde_tpu.ops.pallas.vandermonde import s4d_kernel_pallas

    return s4d_kernel_pallas(C, A, log_dt, L, interpret=interp)


if __name__ == "__main__":
    if CPU:
        main()
    else:
        from resolution_pde_tpu.utils.tpu_lock import tpu_lock

        with tpu_lock("pallas_smoke"):
            main()
