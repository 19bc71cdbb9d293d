"""Probe 11: one stage per invocation (argv[1]), results appended to
/tmp/probe11_results.txt — cold compiles on this backend can exceed a
single command timeout, so each stage gets its own process.

Stages: step8 | step16 | step8_pallas2 | step8_ffsaved | step8_v3s |
step8_best | fwd8 | grad8 | spec | spec_s | spec2 | ff | ff_saved
"""

import os
import sys
import time

# Self-locating: `python scripts/probes/probe11_stage.py` puts scripts/probes
# on sys.path, not the repo root — insert it so the package imports without
# an explicit PYTHONPATH.
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def timeit(fn, n=20, reps=3):
    import jax

    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def report(line):
    print(line, flush=True)
    with open("/tmp/probe11_results.txt", "a") as f:
        f.write(line + "\n")


def main(stage):
    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    RES, WIDTH, LAYERS, MODES, FACTOR, FF_LAYERS = 256, 64, 4, 64, 4, 3
    rng = np.random.default_rng(0)

    if stage in ("step8", "step16", "step8_pallas2", "step8_ffsaved",
                 "step8_v3s", "step8_best"):
        from resolution_pde_tpu.models import FFNO2D
        from resolution_pde_tpu.train import Trainer

        BATCH = 16 if stage == "step16" else 8
        x = jnp.asarray(rng.standard_normal((BATCH, 1, RES, RES)),
                        jnp.float32)
        y = jnp.roll(x, 7, axis=-1)
        model = FFNO2D(
            in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
            n_modes=MODES, factor=FACTOR, ff_weight_norm=True,
            n_ff_layers=FF_LAYERS, layer_norm=True, dropout=0.0,
            remat=False, compute_dtype=jnp.bfloat16,
            spectral_impl=("pallas2" if stage == "step8_pallas2"
                           else "dft_v3s" if stage in ("step8_v3s",
                                                       "step8_best")
                           else "dft_v3"),
            approx_gelu=True,
            ff_impl=("fused_saved" if stage in ("step8_ffsaved",
                                                "step8_best")
                     else "fused"))
        trainer = Trainer(model, learning_rate=1e-3)
        holder = {"s": trainer.init(x[:1])}

        def step():
            s, loss = trainer._train_step(holder["s"], x, y, None)
            holder["s"] = s
            return loss

        ms = timeit(step)
        report(f"{stage}: {ms:.2f} ms ({BATCH / ms * 1e3:.1f} samples/s)")
        return

    if stage in ("fwd8", "grad8"):
        from resolution_pde_tpu.models import FFNO2D
        from resolution_pde_tpu.ops.losses import relative_l2

        BATCH = 8
        x = jnp.asarray(rng.standard_normal((BATCH, 1, RES, RES)),
                        jnp.float32)
        y = jnp.roll(x, 7, axis=-1)
        model = FFNO2D(
            in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
            n_modes=MODES, factor=FACTOR, ff_weight_norm=True,
            n_ff_layers=FF_LAYERS, layer_norm=True, dropout=0.0,
            remat=False, compute_dtype=jnp.bfloat16, spectral_impl="dft_v3",
            approx_gelu=True, ff_impl="fused")
        params = jax.jit(model.init)(jax.random.key(0), x[:1])["params"]

        def fwd_loss(p, bx, by):
            pred = model.apply({"params": p}, bx, deterministic=True)
            return relative_l2(pred, by)

        if stage == "fwd8":
            f = jax.jit(fwd_loss)
            ms = timeit(lambda: f(params, x, y))
            report(f"fwd8 (fwd+loss): {ms:.2f} ms")
        else:
            g = jax.jit(jax.grad(fwd_loss))
            ms = timeit(lambda: g(params, x, y))
            report(f"grad8 (fwd+bwd, no opt): {ms:.2f} ms")
        return

    BATCH = 8
    xcl = jnp.asarray(rng.standard_normal((BATCH, RES, RES, WIDTH)),
                      jnp.bfloat16)

    if stage == "spec2":
        from resolution_pde_tpu.ops.pallas.spectral_mix2 import (
            factorized_spectral_conv_2d_pallas2)

        ws = [jnp.asarray(
            rng.standard_normal((WIDTH, WIDTH, MODES, 2)) * 0.1,
            jnp.float32) for _ in range(2 * LAYERS)]

        def spec_loss(ws):
            h = xcl
            for i in range(LAYERS):
                h = factorized_spectral_conv_2d_pallas2(
                    h, ws[2 * i], ws[2 * i + 1], MODES,
                    compute_dtype=jnp.bfloat16).astype(jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(spec_loss))
        report(f"spec2 (pallas v2) stack fwd+bwd: {timeit(lambda: g(ws)):.2f} ms")
        return

    if stage in ("spec", "spec_s"):
        from resolution_pde_tpu.ops.spectral import (
            factorized_spectral_conv_2d_dft_v3)

        ws = [jnp.asarray(
            rng.standard_normal((WIDTH, WIDTH, MODES, 2)) * 0.1,
            jnp.float32) for _ in range(2 * LAYERS)]
        sd = jnp.bfloat16 if stage == "spec_s" else None

        def spec_loss(ws):
            h = xcl
            for i in range(LAYERS):
                h = factorized_spectral_conv_2d_dft_v3(
                    h, ws[2 * i], ws[2 * i + 1], MODES,
                    gemm_dtype=jnp.bfloat16,
                    store_dtype=sd).astype(jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(spec_loss))
        report(f"{stage} stack fwd+bwd: {timeit(lambda: g(ws)):.2f} ms")
        return

    if stage in ("ff", "ff_saved"):
        from resolution_pde_tpu.ops.pallas.fused_ff import fused_feedforward

        F = WIDTH * FACTOR
        ffw = []
        for _ in range(LAYERS):
            ffw.append((
                tuple(jnp.asarray(rng.standard_normal(s) * 0.05,
                                  jnp.float32)
                      for s in ((WIDTH, F), (F, F), (F, WIDTH))),
                tuple(jnp.asarray(np.zeros(s), jnp.float32)
                      for s in (F, F, WIDTH)),
                (jnp.ones((WIDTH,), jnp.float32),
                 jnp.zeros((WIDTH,), jnp.float32)),
            ))

        save = stage == "ff_saved"

        def ff_loss(ffw):
            h = xcl
            for kern, bias, ln in ffw:
                h = fused_feedforward(h, kern, bias, ln, residual=h,
                                      approx_gelu=True,
                                      compute_dtype=jnp.bfloat16,
                                      save_acts=save)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(ff_loss))
        report(f"{stage} stack fwd+bwd: {timeit(lambda: g(ffw)):.2f} ms")
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main(sys.argv[1])
