"""TPU probe #7: does the channels-last <-> channels-first moveaxis pair
around each spectral conv cost real time, or does XLA fuse it?"""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from resolution_pde_tpu.ops import spectral as S

    RES, WIDTH, LAYERS, MODES, B = 256, 64, 4, 64, 8
    results = {}
    rng = np.random.default_rng(0)

    def timeit(fn, *args, n=20):
        for _ in range(3):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / n

    w = jax.jit(lambda k: 0.02 * jax.random.normal(
        k, (LAYERS, 2, WIDTH, WIDTH, MODES, 2)))(jax.random.key(1))

    # (a) channels-last API (current): moveaxis in/out per layer
    xl = jnp.asarray(rng.standard_normal((B, RES, RES, WIDTH)), jnp.bfloat16)

    @jax.jit
    def stack_cl(w, x):
        def loss(w):
            z = x
            for i in range(LAYERS):
                z = z + S.factorized_spectral_conv_2d_dft_v3(
                    z, w[i, 0], w[i, 1], MODES,
                    gemm_dtype=jnp.bfloat16).astype(z.dtype)
            return jnp.sum(z.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(w)

    results["spec_v3_channels_last_ms"] = round(
        timeit(stack_cl, w, xl) * 1e3, 3)

    # (b) channels-first: no moveaxis, passes called directly
    xc = jnp.asarray(rng.standard_normal((B, WIDTH, RES, RES)), jnp.bfloat16)

    @jax.jit
    def stack_cf(w, x):
        def loss(w):
            z = x
            for i in range(LAYERS):
                yy = S._dft_pass_last_axis_v3(z, w[i, 0], MODES, "ortho",
                                              jnp.bfloat16)
                zt = jnp.swapaxes(z, -1, -2)
                xx = S._dft_pass_last_axis_v3(zt, w[i, 1], MODES, "ortho",
                                              jnp.bfloat16)
                xx = jnp.swapaxes(xx, -1, -2)
                z = z + (xx + yy).astype(z.dtype)
            return jnp.sum(z.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(w)

    results["spec_v3_channels_first_ms"] = round(
        timeit(stack_cf, w, xc) * 1e3, 3)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
