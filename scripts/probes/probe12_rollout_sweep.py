"""Probe 12: TPU wall-time of the autoregressive rollout sweep, new
device-side accumulation vs the round-2 per-step host-fetch pattern
(VERDICT r2 weak #3 / item #6 acceptance measurement)."""

import time

import numpy as np


def main():
    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from resolution_pde_tpu.evaluation.rollout import (perform_rollout,
                                                      rollout_loss)
    from resolution_pde_tpu.models import FFNO1D
    from resolution_pde_tpu.ops.losses import relative_l2
    from resolution_pde_tpu.ops.normalizers import SimpleNormalizer

    rng = np.random.default_rng(0)
    model = FFNO1D(in_channels=1, out_channels=1, width=32, n_layers=2,
                   n_modes=16)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 1, 128), jnp.float32))
    xn = SimpleNormalizer(0.0, 1.0)
    yn = SimpleNormalizer(0.0, 1.0)
    STEPS, BATCH = 16, 16
    resolutions = (128, 256, 512)
    trajs = {r: rng.standard_normal((32, STEPS + 1, r)).astype(np.float32)
             for r in resolutions}

    def sweep_new():
        return {r: rollout_loss(model, params, trajs[r], STEPS, xn, yn,
                                batch_size=BATCH) for r in resolutions}

    def sweep_legacy():
        # round-2 pattern: one float() per rollout step per batch
        out = {}
        for r in resolutions:
            t = trajs[r]

            @jax.jit
            def batch_rollout(p, ic):
                return perform_rollout(model, p, ic, STEPS, xn, yn)

            total, batches = 0.0, 0
            for i in range(0, len(t), BATCH):
                traj = jnp.asarray(t[i:i + BATCH])
                ic = traj[:, 0][:, None]
                preds = yn.decode(batch_rollout(params, xn.encode(ic)))
                gt = traj[:, 1:STEPS + 1]
                losses = [float(relative_l2(preds[:, s, 0], gt[:, s]))
                          for s in range(STEPS)]
                total += sum(losses) / len(losses)
                batches += 1
            out[r] = total / batches
        return out

    for name, fn in (("new (device-side accumulation)", sweep_new),
                     ("legacy (per-step host fetch)", sweep_legacy)):
        fn()  # compile
        t0 = time.perf_counter()
        res = fn()
        dt = time.perf_counter() - t0
        print(f"{name}: {dt * 1e3:.0f} ms for "
              f"{len(resolutions)} resolutions x {STEPS} steps "
              f"(losses {[f'{v:.3f}' for v in res.values()]})", flush=True)
        with open("/tmp/probe12_results.txt", "a") as f:
            f.write(f"{name}: {dt * 1e3:.0f} ms\n")


if __name__ == "__main__":
    main()
