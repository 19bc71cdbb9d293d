"""TPU probe #3: isolate the VPU cost of GELU/tanh and test activation
variants inside the fused FF kernel (fwd only)."""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


def timeit(fn, *args, n=30, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / n


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}
    rng = np.random.default_rng(0)
    N, F = 524288, 256
    xf = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    xb = xf.astype(jnp.bfloat16)

    # elementwise op costs at the hidden-activation scale (134M elems f32)
    for name, fn in [
        ("tanh_f32", lambda x: jnp.tanh(x)),
        ("tanh_bf16", lambda x: jnp.tanh(x.astype(jnp.bfloat16))),
        ("exp_f32", lambda x: jnp.exp(x)),
        ("relu_f32", lambda x: jnp.maximum(x, 0)),
        ("gelu_tanh_f32", lambda x: jax.nn.gelu(x, approximate=True)),
        ("copy", lambda x: x + 1.0),
    ]:
        results[f"elem_{name}_ms"] = round(
            timeit(jax.jit(fn), xf) * 1e3, 3)

    # ---- fused FF fwd kernel with different activations / tiles ----
    C = 64
    k1 = jnp.asarray(rng.standard_normal((C, F)) * 0.05, jnp.bfloat16)
    k2 = jnp.asarray(rng.standard_normal((F, F)) * 0.05, jnp.bfloat16)
    k3 = jnp.asarray(rng.standard_normal((F, C)) * 0.05, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((N, C)), jnp.bfloat16)

    def act_tanh(z):
        u = 0.7978845608 * (z + 0.044715 * z * z * z)
        return 0.5 * z * (1.0 + jnp.tanh(u))

    def act_relu(z):
        return jnp.maximum(z, 0.0)

    def act_poly(z):
        # tanh(u) ~ odd minimax-ish poly, clipped; u = sqrt(2/pi)(z+c z^3)
        u = 0.7978845608 * (z + 0.044715 * z * z * z)
        u = jnp.clip(u, -3.0, 3.0)
        u2 = u * u
        t = u * (1.0 + u2 * (-0.3333314 + u2 * (0.1333923 + u2 * -0.0520301)))
        t = jnp.clip(t, -1.0, 1.0)
        return 0.5 * z * (1.0 + t)

    def act_tanh_bf16(z):
        zb = z.astype(jnp.bfloat16)
        u = 0.7978845608 * (zb + 0.044715 * zb * zb * zb)
        return (0.5 * zb * (1.0 + jnp.tanh(u))).astype(jnp.float32)

    def make_ff(act, tile, keep_bf16):
        def kernel(x_ref, k1_ref, k2_ref, k3_ref, out_ref):
            h = x_ref[:]
            z1 = jnp.dot(h, k1_ref[:], preferred_element_type=jnp.float32)
            h1 = act(z1).astype(jnp.bfloat16)
            z2 = jnp.dot(h1, k2_ref[:], preferred_element_type=jnp.float32)
            h2 = act(z2).astype(jnp.bfloat16)
            z3 = jnp.dot(h2, k3_ref[:], preferred_element_type=jnp.float32)
            out_ref[:] = z3.astype(out_ref.dtype)

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

    for name, act in [("tanh", act_tanh), ("relu", act_relu),
                      ("poly", act_poly), ("tanh_bf16", act_tanh_bf16)]:
        for tile in (512, 2048):
            try:
                t = timeit(make_ff(act, tile, True), x, k1, k2, k3)
                results[f"ffwd_{name}_t{tile}_ms"] = round(t * 1e3, 3)
            except Exception as e:
                results[f"ffwd_{name}_t{tile}_err"] = repr(e)[:120]

    print(json.dumps(results))


if __name__ == "__main__":
    main()
