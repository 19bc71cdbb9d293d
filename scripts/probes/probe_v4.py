"""Probe: dft_v3 vs dft_v4 (folded-symmetry) train-step throughput at the
bench shape, plus a decomposition of the non-FF/non-spectral 'other' time
(in/out projections, grid concat, loss, optimizer)."""

import time

import numpy as np


def timeit(fn, n=20, reps=3):
    fn()  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = float(np.asarray(out).ravel()[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.train import Trainer

    RES, WIDTH, LAYERS, MODES, FACTOR, FF_LAYERS = 256, 64, 4, 64, 4, 3
    BATCH = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 1, RES, RES)), jnp.float32)
    y = jnp.roll(x, 7, axis=-1)

    results = {}
    for impl in ("dft_v3", "dft_v4"):
        model = FFNO2D(
            in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
            n_modes=MODES, factor=FACTOR, ff_weight_norm=True,
            n_ff_layers=FF_LAYERS, layer_norm=True, dropout=0.0,
            remat=False, compute_dtype=jnp.bfloat16, spectral_impl=impl,
            approx_gelu=True, ff_impl="fused")
        trainer = Trainer(model, learning_rate=1e-3)
        state = trainer.init(x[:1])
        holder = {"s": state}

        def step():
            s, loss = trainer._train_step(holder["s"], x, y, None)
            holder["s"] = s
            return loss

        ms = timeit(step)
        results[impl] = ms
        print(f"{impl}: {ms:.2f} ms/step -> "
              f"{BATCH / ms * 1e3:.1f} samples/s", flush=True)

    # isolated spectral stack fwd+bwd (4 layers), v3 vs v4
    from resolution_pde_tpu.ops.spectral import (
        factorized_spectral_conv_2d_dft_v3, factorized_spectral_conv_2d_dft_v4)

    xcl = jnp.asarray(rng.standard_normal((BATCH, RES, RES, WIDTH)),
                      jnp.bfloat16)
    wy = jnp.asarray(rng.standard_normal((WIDTH, WIDTH, MODES, 2)) * 0.1,
                     jnp.float32)
    for name, fn in (("v3", factorized_spectral_conv_2d_dft_v3),
                     ("v4", factorized_spectral_conv_2d_dft_v4)):
        def loss_fn(w, fnc=fn):
            h = xcl
            for _ in range(LAYERS):
                h = fnc(h, w, w, MODES,
                        gemm_dtype=jnp.bfloat16).astype(jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss_fn))
        ms = timeit(lambda: g(wy))
        print(f"spectral stack {name} fwd+bwd: {ms:.2f} ms", flush=True)

    # 'other' decomposition: projections + grid concat + loss + optimizer
    import optax
    from resolution_pde_tpu.ops.losses import relative_l2_loss

    win = jnp.asarray(rng.standard_normal((3, WIDTH)) * 0.1, jnp.float32)
    wout = jnp.asarray(rng.standard_normal((WIDTH, 1)) * 0.1, jnp.float32)

    def entry_exit(wi, wo):
        h = jnp.moveaxis(x, 1, -1)
        gx = jnp.broadcast_to(
            jnp.linspace(0, 1, RES)[:, None, None], (RES, RES, 1))
        gy = jnp.broadcast_to(
            jnp.linspace(0, 1, RES)[None, :, None], (RES, RES, 1))
        g2 = jnp.broadcast_to(jnp.concatenate([gx, gy], -1)[None],
                              (BATCH, RES, RES, 2))
        h = jnp.concatenate([h, g2], -1).astype(jnp.bfloat16)
        h = jnp.matmul(h, wi.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        h = h.astype(jnp.bfloat16)
        out = jnp.matmul(h, wo.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        out = jnp.moveaxis(out, -1, 1).astype(jnp.float32)
        return relative_l2_loss(out, y)

    g2fn = jax.jit(jax.grad(entry_exit, argnums=(0, 1)))
    ms = timeit(lambda: g2fn(win, wout)[0])
    print(f"entry/exit (grid+proj+loss) fwd+bwd: {ms:.2f} ms", flush=True)

    # optimizer update alone at the real param count
    model = FFNO2D(
        in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
        n_modes=MODES, factor=FACTOR, ff_weight_norm=True,
        n_ff_layers=FF_LAYERS, layer_norm=True, dropout=0.0,
        compute_dtype=jnp.bfloat16, spectral_impl="dft_v4",
        approx_gelu=True, ff_impl="fused")
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init(x[:1])
    params = state.params
    tx = optax.adamw(1e-3, weight_decay=1e-4)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def opt_step(p, o):
        grads = jax.tree.map(jnp.ones_like, p)
        up, o2 = tx.update(grads, o, p)
        p2 = optax.apply_updates(p, up)
        return p2, o2

    holder = {"p": params, "o": opt_state}

    def run_opt():
        p2, o2 = opt_step(holder["p"], holder["o"])
        holder["p"], holder["o"] = p2, o2
        return jax.tree.leaves(p2)[0]

    print(f"adamw update alone: {timeit(run_opt):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
