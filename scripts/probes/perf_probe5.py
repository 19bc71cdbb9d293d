"""TPU probe #5: spectral variants (dft vs v2 vs v3 packed-complex),
all bf16 IO, fwd+bwd; plus full fused step at batch 16."""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from resolution_pde_tpu.ops import spectral as S
    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.train import Trainer

    RES, WIDTH, LAYERS, MODES = 256, 64, 4, 64
    B = 8
    results = {}
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((B, RES, RES, WIDTH)), jnp.bfloat16)
    w = jax.jit(lambda k: 0.02 * jax.random.normal(
        k, (LAYERS, 2, WIDTH, WIDTH, MODES, 2)))(jax.random.key(1))

    def timeit(fn, *args, n=20):
        for _ in range(3):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / n

    for name, fn in [("dft", S.factorized_spectral_conv_2d_dft),
                     ("dft_v2", S.factorized_spectral_conv_2d_dft_v2),
                     ("dft_v3", S.factorized_spectral_conv_2d_dft_v3)]:
        @jax.jit
        def stack(w, x, fn=fn):
            def loss(w):
                z = x
                for i in range(LAYERS):
                    z = z + fn(z, w[i, 0], w[i, 1], MODES,
                               gemm_dtype=jnp.bfloat16).astype(z.dtype)
                return jnp.sum(z.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(w)
        try:
            results[f"spec_{name}_bf16_fwdbwd_ms"] = round(
                timeit(stack, w, xb) * 1e3, 3)
        except Exception as e:
            results[f"spec_{name}_err"] = repr(e)[:160]

    # full fused step, batch 8 and 16, best spectral impl measured above
    best = min((v, k) for k, v in results.items() if k.endswith("_ms"))
    impl = best[1].split("_bf16")[0].replace("spec_", "")
    results["best_spec"] = impl
    for batch in (8, 16):
        model = FFNO2D(
            in_channels=1, out_channels=1, width=WIDTH, n_layers=LAYERS,
            n_modes=MODES, factor=4, ff_weight_norm=True, n_ff_layers=3,
            layer_norm=True, dropout=0.0, remat=False,
            compute_dtype=jnp.bfloat16, spectral_impl=impl,
            approx_gelu=True, ff_impl="fused")
        trainer = Trainer(model, learning_rate=1e-3)
        x = jnp.asarray(rng.standard_normal((batch, 1, RES, RES)),
                        jnp.float32)
        y = jnp.roll(x, 7, axis=-1)
        state = trainer.init(x[:1])
        for _ in range(3):
            state, loss = trainer._train_step(state, x, y, None)
        assert np.isfinite(float(loss))
        t0 = time.perf_counter()
        for _ in range(20):
            state, loss = trainer._train_step(state, x, y, None)
        float(loss)
        dt = (time.perf_counter() - t0) / 20
        results[f"full_fused_{impl}_b{batch}_sps"] = round(batch / dt, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
