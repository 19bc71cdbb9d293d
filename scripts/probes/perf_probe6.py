"""TPU microbench: Pallas Cauchy DPLR kernel vs jnp broadcast-reduce,
and S4D Vandermonde single-launch multichannel."""
import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/rpde_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from resolution_pde_tpu.ops import ssm as ssm_ops
    from resolution_pde_tpu.ops.pallas.cauchy import dplr_kernel_pallas
    from resolution_pde_tpu.ops.pallas import s4d_kernel_pallas

    results = {}
    rng = np.random.default_rng(0)
    H, N, L = 256, 64, 8192  # S4 KS-scale kernel materialization

    Lam0, P0, B0, _ = ssm_ops.make_dplr_hippo(N)
    # complex transfer + eager compute are UNIMPLEMENTED on this backend:
    # cast on host, combine re/im inside jit
    dev_c = jax.jit(lambda re, im: jax.lax.complex(re, im))

    def _c(re, im):
        return dev_c(np.ascontiguousarray(re, np.float32),
                     np.ascontiguousarray(im, np.float32))
    Lam = _c(np.broadcast_to(Lam0.real, (H, N)),
             np.broadcast_to(Lam0.imag, (H, N)))
    P = _c(np.broadcast_to(P0.real, (H, N)),
           np.broadcast_to(P0.imag, (H, N)))
    B = _c(np.broadcast_to(B0.real, (H, N)),
           np.broadcast_to(B0.imag, (H, N)))
    C = _c(rng.standard_normal((H, N)), rng.standard_normal((H, N)))
    log_dt = jax.device_put(np.log(rng.uniform(1e-3, 1e-1, H)).astype(np.float32))

    # pass ALL complex arrays as jit ARGUMENTS: complex closures become
    # baked-in constants, and constant upload is a complex host->device
    # transfer, which this backend cannot do (UNIMPLEMENTED)
    @jax.jit
    def jnp_path(Lam, P, B, C, log_dt):
        return jax.vmap(lambda l, p, b, c, d: ssm_ops.dplr_kernel(
            l, p, b, c, d, L))(Lam, P, B, C, log_dt)

    @jax.jit
    def pallas_path(Lam, P, B, C, log_dt):
        return dplr_kernel_pallas(Lam, P, B, C, log_dt, L)

    for name, fn in (("dplr_jnp", jnp_path), ("dplr_pallas", pallas_path)):
        try:
            for _ in range(2):
                out = fn(Lam, P, B, C, log_dt)
            float(out[0, 0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(Lam, P, B, C, log_dt)
            float(out[0, 0])
            results[f"{name}_ms"] = round(
                (time.perf_counter() - t0) / 10 * 1e3, 3)
        except Exception as e:
            results[f"{name}_err"] = repr(e)[:200]

    # parity check on TPU
    try:
        d = jax.jit(lambda *a: jnp.max(jnp.abs(jnp_path(*a)
                                               - pallas_path(*a))))(
            Lam, P, B, C, log_dt)
        results["dplr_maxabsdiff"] = float(d)
    except Exception as e:
        results["dplr_cmp_err"] = repr(e)[:200]

    # S4D multi-channel single launch (complex built INSIDE the jit)
    try:
        ar = -np.abs(rng.standard_normal((H, N // 2))).astype(np.float32) - 0.2
        ai = rng.standard_normal((H, N // 2)).astype(np.float32)
        c2r = rng.standard_normal((2, H, N // 2)).astype(np.float32)
        c2i = rng.standard_normal((2, H, N // 2)).astype(np.float32)

        @jax.jit
        def s4d_multi(c2r, c2i, ar, ai, log_dt):
            return s4d_kernel_pallas(jax.lax.complex(c2r, c2i),
                                     jax.lax.complex(ar, ai), log_dt, L)

        for _ in range(2):
            out = s4d_multi(c2r, c2i, ar, ai, log_dt)
        float(out[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(10):
            out = s4d_multi(c2r, c2i, ar, ai, log_dt)
        float(out[0, 0, 0])
        results["s4d_pallas_2ch_ms"] = round(
            (time.perf_counter() - t0) / 10 * 1e3, 3)
    except Exception as e:
        results["s4d_err"] = repr(e)[:200]

    print(json.dumps(results))


if __name__ == "__main__":
    main()
