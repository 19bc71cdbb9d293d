"""TPU probe #8: interleaved half-tile FF fwd kernel — does giving Mosaic
two independent dependency chains let it overlap VPU (gelu) with MXU?"""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, C, F = 524288, 64, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, C)), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((C, F)) * 0.05, jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((F, F)) * 0.05, jnp.bfloat16)
    k3 = jnp.asarray(rng.standard_normal((F, C)) * 0.05, jnp.bfloat16)
    results = {}

    def gelu(z):
        u = 0.7978845608 * (z + 0.044715 * z * z * z)
        return 0.5 * z * (1.0 + jnp.tanh(u))

    def chain(h, k1, k2, k3):
        z1 = jnp.dot(h, k1, preferred_element_type=jnp.float32)
        h1 = gelu(z1).astype(jnp.bfloat16)
        z2 = jnp.dot(h1, k2, preferred_element_type=jnp.float32)
        h2 = gelu(z2).astype(jnp.bfloat16)
        return jnp.dot(h2, k3, preferred_element_type=jnp.float32)

    def make(tile, nsplit):
        def kernel(x_ref, k1_ref, k2_ref, k3_ref, out_ref):
            k1_, k2_, k3_ = k1_ref[:], k2_ref[:], k3_ref[:]
            sub = tile // nsplit
            outs = []
            if nsplit == 1:
                out_ref[:] = chain(x_ref[:], k1_, k2_, k3_).astype(
                    out_ref.dtype)
                return
            # independent half-chains: interleave by construction
            hs = [x_ref[i * sub:(i + 1) * sub] for i in range(nsplit)]
            z1 = [jnp.dot(h, k1_, preferred_element_type=jnp.float32)
                  for h in hs]
            h1 = [gelu(z).astype(jnp.bfloat16) for z in z1]
            z2 = [jnp.dot(h, k2_, preferred_element_type=jnp.float32)
                  for h in h1]
            h2 = [gelu(z).astype(jnp.bfloat16) for z in z2]
            for i in range(nsplit):
                out_ref[i * sub:(i + 1) * sub] = jnp.dot(
                    h2[i], k3_,
                    preferred_element_type=jnp.float32).astype(out_ref.dtype)

        def cspec(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda i, _n=nd: (0,) * _n,
                                memory_space=pltpu.VMEM)

        @jax.jit
        def run(x, k1, k2, k3):
            return pl.pallas_call(
                kernel,
                grid=(N // tile,),
                in_specs=[pl.BlockSpec((tile, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                          cspec(k1.shape), cspec(k2.shape), cspec(k3.shape)],
                out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            )(x, k1, k2, k3)
        return run

    for tile, nsplit in ((4096, 1), (4096, 2), (4096, 4), (2048, 2)):
        try:
            fn = make(tile, nsplit)
            for _ in range(3):
                out = fn(x, k1, k2, k3)
            float(out[0, 0])
            t0 = time.perf_counter()
            for _ in range(30):
                out = fn(x, k1, k2, k3)
            float(out[0, 0])
            results[f"ff_t{tile}_s{nsplit}_ms"] = round(
                (time.perf_counter() - t0) / 30 * 1e3, 3)
        except Exception as e:
            results[f"ff_t{tile}_s{nsplit}_err"] = repr(e)[:120]

    print(json.dumps(results))


if __name__ == "__main__":
    main()
