"""Probe 10: clean per-component breakdown of the bench train step.

Times, each as an isolated jitted program at the bench shape:
  1. full train step (reference point)
  2. forward + loss only
  3. grad (no optimizer)
  4. spectral stack fwd+bwd (per-layer weights, dft_v3 bf16)
  5. fused-FF stack fwd+bwd (per-layer weights)
  6. full step at batch 16
"""

import time

import numpy as np


def timeit(fn, n=20, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = float(np.asarray(jax_leaf(out)).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def jax_leaf(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return leaves[0]


def main():
    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.train import Trainer

    RES, WIDTH, LAYERS, MODES, FACTOR, FF_LAYERS = 256, 64, 4, 64, 4, 3
    kwargs = dict(
        in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
        n_modes=MODES, factor=FACTOR, ff_weight_norm=True,
        n_ff_layers=FF_LAYERS, layer_norm=True, dropout=0.0, remat=False,
        compute_dtype=jnp.bfloat16, spectral_impl="dft_v3",
        approx_gelu=True, ff_impl="fused")
    rng = np.random.default_rng(0)

    for BATCH in (8, 16):
        x = jnp.asarray(rng.standard_normal((BATCH, 1, RES, RES)),
                        jnp.float32)
        y = jnp.roll(x, 7, axis=-1)
        model = FFNO2D(**kwargs)
        trainer = Trainer(model, learning_rate=1e-3)
        state = trainer.init(x[:1])
        holder = {"s": state}

        def step():
            s, loss = trainer._train_step(holder["s"], x, y, None)
            holder["s"] = s
            return loss

        ms = timeit(step)
        print(f"[batch {BATCH}] full step: {ms:.2f} ms "
              f"({BATCH / ms * 1e3:.1f} samples/s)", flush=True)

        if BATCH > 8:
            continue

        from resolution_pde_tpu.ops.losses import relative_l2

        # the original `state` was donated by the first step; use the live one
        params0 = holder["s"].params

        @jax.jit
        def fwd_loss(params, bx, by):
            pred = model.apply({"params": params}, bx, deterministic=True)
            return relative_l2(pred, by)

        print(f"  fwd+loss: {timeit(lambda: fwd_loss(params0, x, y)):.2f} ms",
              flush=True)

        grad_fn = jax.jit(jax.grad(fwd_loss))

        def g():
            return grad_fn(params0, x, y)

        print(f"  grad (no opt): {timeit(g):.2f} ms", flush=True)

    # isolated stacks, per-layer weights
    BATCH = 8
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d_dft_v3)

    xcl = jnp.asarray(rng.standard_normal((BATCH, RES, RES, WIDTH)),
                      jnp.bfloat16)
    ws = [jnp.asarray(rng.standard_normal((WIDTH, WIDTH, MODES, 2)) * 0.1,
                      jnp.float32) for _ in range(2 * LAYERS)]

    def spec_loss(ws):
        h = xcl
        for i in range(LAYERS):
            h = factorized_spectral_conv_2d_dft_v3(
                h, ws[2 * i], ws[2 * i + 1], MODES,
                gemm_dtype=jnp.bfloat16).astype(jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    gspec = jax.jit(jax.grad(spec_loss))
    print(f"spectral stack (per-layer w): {timeit(lambda: gspec(ws)):.2f} ms",
          flush=True)

    from resolution_pde_tpu.ops.pallas.fused_ff import fused_feedforward

    F = WIDTH * FACTOR
    ffw = []
    for _ in range(LAYERS):
        ffw.append((
            tuple(jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
                  for s in ((WIDTH, F), (F, F), (F, WIDTH))),
            tuple(jnp.asarray(np.zeros(s), jnp.float32)
                  for s in (F, F, WIDTH)),
            (jnp.ones((WIDTH,), jnp.float32), jnp.zeros((WIDTH,), jnp.float32)),
        ))

    def ff_loss(ffw):
        h = xcl
        for kern, bias, ln in ffw:
            h = fused_feedforward(h, kern, bias, ln, residual=h,
                                  approx_gelu=True,
                                  compute_dtype=jnp.bfloat16)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    gff = jax.jit(jax.grad(ff_loss))
    print(f"fused-FF stack: {timeit(lambda: gff(ffw)):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
