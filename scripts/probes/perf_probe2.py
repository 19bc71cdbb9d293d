"""TPU probe #2: fused Pallas FF vs dense, and the full fused train step.

    env PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe2.py
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import flax.linen as nn
    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.models.layers import FeedForward
    from resolution_pde_tpu.train import Trainer

    RES, WIDTH, LAYERS, MODES, FACTOR, FF_LAYERS = 256, 64, 4, 64, 4, 3
    B = 8
    results = {}
    rng = np.random.default_rng(0)

    # ---- fused FF stack fwd+bwd (compare: dense was 27.456 ms) ----
    class FFStack(nn.Module):
        impl: str

        @nn.compact
        def __call__(self, x):
            for _ in range(LAYERS):
                x = x + FeedForward(WIDTH, FACTOR, FF_LAYERS, False, True,
                                    0.0, dtype=jnp.bfloat16,
                                    approx_gelu=True, ff_impl=self.impl)(x)
            return x

    ff = FFStack("fused")
    xa = jnp.asarray(rng.standard_normal((B, RES, RES, WIDTH)), jnp.bfloat16)
    ffp = jax.jit(ff.init)(jax.random.key(0), xa)

    @jax.jit
    def ff_fwdbwd(p, x):
        def loss(p):
            return jnp.sum(ff.apply(p, x).astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(p)

    for _ in range(3):
        out = ff_fwdbwd(ffp, xa)
    float(out[0])
    t0 = time.perf_counter()
    for _ in range(20):
        out = ff_fwdbwd(ffp, xa)
    float(out[0])
    results["ff_stack_fused_fwdbwd_ms"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 3)

    # numeric sanity: fused vs dense on TPU (bf16, loose tolerance)
    ffd = FFStack("dense")

    @jax.jit
    def diff(p, x):
        a = ff.apply(p, x).astype(jnp.float32)
        b = ffd.apply(p, x).astype(jnp.float32)
        return (jnp.max(jnp.abs(a - b)),
                jnp.max(jnp.abs(b)))
    d, m = diff(ffp, xa)
    results["fused_vs_dense_maxabsdiff"] = float(d)
    results["dense_maxabs"] = float(m)

    # ---- full train step with fused FF ----
    def full_step_time(batch, ff_impl):
        model = FFNO2D(
            in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
            n_modes=MODES, factor=FACTOR, ff_weight_norm=True,
            n_ff_layers=FF_LAYERS, layer_norm=True, dropout=0.0,
            remat=False, compute_dtype=jnp.bfloat16, spectral_impl="dft",
            approx_gelu=True, ff_impl=ff_impl)
        trainer = Trainer(model, learning_rate=1e-3)
        x = jnp.asarray(rng.standard_normal((batch, 1, RES, RES)),
                        jnp.float32)
        y = jnp.roll(x, 7, axis=-1)
        state = trainer.init(x[:1])
        for _ in range(3):
            state, loss = trainer._train_step(state, x, y, None)
        warm = float(loss)
        assert np.isfinite(warm), warm
        t0 = time.perf_counter()
        n = 20
        for _ in range(n):
            state, loss = trainer._train_step(state, x, y, None)
        float(loss)
        return (time.perf_counter() - t0) / n

    t = full_step_time(8, "fused")
    results["full_step_fused_b8_ms"] = round(t * 1e3, 3)
    results["samples_per_s_fused_b8"] = round(8 / t, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
