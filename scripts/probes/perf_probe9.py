"""TPU probe #9: f32-exact EVAL forward throughput of the three spectral
impls at the bench shape (the parity-eval path, not the bf16 train path)."""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from resolution_pde_tpu.models import FFNO2D

    results = {}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 1, 256, 256)), jnp.float32)
    for impl in ("fft", "dft", "dft_v3", "pallas"):
        m = FFNO2D(in_channels=1, out_channels=1, width=64, n_layers=4,
                   n_modes=64, ff_weight_norm=True, n_ff_layers=3,
                   layer_norm=True, spectral_impl=impl)
        try:
            p = jax.jit(m.init)(jax.random.key(0), x[:1])
            fwd = jax.jit(lambda p, x: m.apply(p, x))
            for _ in range(3):
                out = fwd(p, x)
            float(out[0, 0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(15):
                out = fwd(p, x)
            float(out[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / 15
            results[f"eval_fwd_{impl}_ms"] = round(dt * 1e3, 3)
        except Exception as e:
            results[f"eval_fwd_{impl}_err"] = repr(e)[:150]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
