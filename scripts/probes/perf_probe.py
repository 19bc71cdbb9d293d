"""Component-level TPU timing probe for the bench FFNO2D step.

Decomposes the train step into: FF stack, spectral (DFT) stack, projections,
loss+optimizer — each timed as an isolated jitted fwd+bwd. Prints a JSON
dict. Run ONLY on the real TPU (one process at a time):

    env PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _fetch(out)
    return (time.perf_counter() - t0) / n


def _fetch(out):
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf.reshape(-1)[0])


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import flax.linen as nn
    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.models.layers import FeedForward
    from resolution_pde_tpu.ops.spectral import factorized_spectral_conv_2d_dft
    from resolution_pde_tpu.train import Trainer

    RES, WIDTH, LAYERS, MODES, FACTOR, FF_LAYERS = 256, 64, 4, 64, 4, 3
    B = 8
    results = {}
    rng = np.random.default_rng(0)

    # ---- 1. full train step (bench config) ----
    def full_step_time(batch):
        model = FFNO2D(
            in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
            n_modes=MODES, factor=FACTOR, ff_weight_norm=True,
            n_ff_layers=FF_LAYERS, layer_norm=True, dropout=0.0,
            remat=False, compute_dtype=jnp.bfloat16, spectral_impl="dft",
            approx_gelu=True)
        trainer = Trainer(model, learning_rate=1e-3)
        x = jnp.asarray(rng.standard_normal((batch, 1, RES, RES)), jnp.float32)
        y = jnp.roll(x, 7, axis=-1)
        state = trainer.init(x[:1])

        def step(state):
            s, loss = trainer._train_step(state, x, y, None)
            return s, loss

        # stateful timing: donated state, so rebuild closure style
        for _ in range(3):
            state, loss = trainer._train_step(state, x, y, None)
        float(loss)
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            state, loss = trainer._train_step(state, x, y, None)
        float(loss)
        return (time.perf_counter() - t0) / n

    t_full8 = full_step_time(8)
    results["full_step_b8_ms"] = round(t_full8 * 1e3, 3)
    results["samples_per_s_b8"] = round(8 / t_full8, 1)

    # ---- 2. FF-only stack: 4 x FeedForward fwd+bwd on (B,256,256,64) bf16
    class FFStack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(LAYERS):
                x = x + FeedForward(WIDTH, FACTOR, FF_LAYERS, False, True,
                                    0.0, dtype=jnp.bfloat16,
                                    approx_gelu=True)(x)
            return x

    ff = FFStack()
    xa = jnp.asarray(rng.standard_normal((B, RES, RES, WIDTH)),
                     jnp.bfloat16)
    ffp = jax.jit(ff.init)(jax.random.key(0), xa)

    @jax.jit
    def ff_fwdbwd(p, x):
        def loss(p):
            return jnp.sum(ff.apply(p, x).astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(p)
        return l, g

    results["ff_stack_fwdbwd_ms"] = round(
        timeit(ff_fwdbwd, ffp, xa) * 1e3, 3)

    # ---- 3. spectral-only stack: 4 x dft conv fwd+bwd ----
    wkey = jax.random.key(1)
    w = jax.jit(lambda k: 0.02 * jax.random.normal(
        k, (LAYERS, 2, WIDTH, WIDTH, MODES, 2)))(wkey)
    xf = xa.astype(jnp.float32)

    @jax.jit
    def spec_fwdbwd(w, x):
        def loss(w):
            z = x
            for i in range(LAYERS):
                z = z + factorized_spectral_conv_2d_dft(
                    z, w[i, 0], w[i, 1], MODES, gemm_dtype=jnp.bfloat16)
            return jnp.sum(z ** 2)
        l, g = jax.value_and_grad(loss)(w)
        return l, g

    results["spec_stack_fwdbwd_ms"] = round(
        timeit(spec_fwdbwd, w, xf) * 1e3, 3)

    # ---- 3b. spectral stack fed bf16 (skip the f32 round-trip) ----
    xb = xa

    @jax.jit
    def spec_fwdbwd_bf16(w, x):
        def loss(w):
            z = x
            for i in range(LAYERS):
                z = z + factorized_spectral_conv_2d_dft(
                    z.astype(jnp.bfloat16), w[i, 0], w[i, 1], MODES,
                    gemm_dtype=jnp.bfloat16).astype(z.dtype)
            return jnp.sum(z.astype(jnp.float32) ** 2)
        l, g = jax.value_and_grad(loss)(w)
        return l, g

    results["spec_stack_bf16io_fwdbwd_ms"] = round(
        timeit(spec_fwdbwd_bf16, w, xb) * 1e3, 3)

    # ---- 4. full step at batch 16 ----
    try:
        t16 = full_step_time(16)
        results["full_step_b16_ms"] = round(t16 * 1e3, 3)
        results["samples_per_s_b16"] = round(16 / t16, 1)
    except Exception as e:  # OOM etc.
        results["full_step_b16_error"] = repr(e)[:200]

    print(json.dumps(results))


if __name__ == "__main__":
    main()
