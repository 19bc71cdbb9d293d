"""TPU probe #4: raw MXU roofline — what matmul rate does this chip
actually deliver for various shapes/dtypes?"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    results = {}
    rng = np.random.default_rng(0)

    def bench_matmul(m, k, n, dtype, n_iter=10, chain=8):
        a = jnp.asarray(rng.standard_normal((m, k)), dtype)
        b = jnp.asarray(rng.standard_normal((k, n)), dtype)

        @jax.jit
        def f(a, b):
            x = a
            for _ in range(chain):
                x = jnp.dot(x, b, preferred_element_type=jnp.float32
                            ).astype(dtype)
            return jnp.sum(x.astype(jnp.float32))

        for _ in range(3):
            out = f(a, b)
        float(out)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            out = f(a, b)
        float(out)
        dt = (time.perf_counter() - t0) / n_iter
        flops = 2.0 * m * k * n * chain
        return flops / dt / 1e12, dt * 1e3

    # big square: the best case the MXU can possibly do
    for dtype, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        tf, ms = bench_matmul(4096, 4096, 4096, dtype)
        results[f"square4096_{name}_tflops"] = round(tf, 1)
        results[f"square4096_{name}_ms"] = round(ms, 3)

    # FF-shaped: tall-skinny with K=256,N=256 (the middle FF GEMM)
    tf, ms = bench_matmul(524288 // 4, 256, 256, jnp.bfloat16, chain=8)
    results["ffmid_bf16_tflops"] = round(tf, 1)

    # K=64 entry GEMM shape
    tf, ms = bench_matmul(524288 // 4, 64, 64, jnp.bfloat16, chain=8)
    results["k64_bf16_tflops"] = round(tf, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
