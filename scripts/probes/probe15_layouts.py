"""probe15: do AUTO in/out layouts kill the per-step relayout copies?

probe14's breakdown of the bench step's 11 ms "other" stage showed ~8 ms
of layout copies, including per-step relayouts of the fused-FF weight
kernels (state.params[...]['kernel'] copies at ~315 us each): the
optimizer writes params in one layout, the Pallas custom call wants
another, and XLA re-copies every step. Trainer(auto_layout=True)
(train/trainer._AutoLayoutStep) compiles the donated step with
jax.experimental.layout Format(Layout.AUTO) over the state so XLA keeps
params in the compute-preferred layout across steps.

A/B's the PRODUCTION paths: Trainer(auto_layout=False) vs
Trainer(auto_layout=True) at the bench shapes; prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

from resolution_pde_tpu.utils.jax_cache import enable_compile_cache
from resolution_pde_tpu.utils.tpu_lock import tpu_lock


def _time_step(call, state, x, y, n=20, reps=2):
    # the step DONATES state — always chain the freshest one
    state, loss = call(state, x, y, None)
    float(loss)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = call(state, x, y, None)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    enable_compile_cache()
    import jax.numpy as jnp

    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.train import Trainer

    model = FFNO2D(in_channels=1, out_channels=1, width=64, n_layers=4,
                   n_modes=64, factor=4, ff_weight_norm=True,
                   n_ff_layers=3, layer_norm=True, dropout=0.0,
                   compute_dtype=jnp.bfloat16, spectral_impl="dft_v3",
                   approx_gelu=True, ff_impl="fused")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 1, 256, 256)), jnp.float32)
    y = jnp.roll(x, 7, axis=-1)

    out = {}
    for name, auto in (("base_ms", False), ("auto_ms", True)):
        try:
            trainer = Trainer(model, learning_rate=1e-3, auto_layout=auto)
            state = trainer.init(x[:1])
            out[name] = round(
                _time_step(trainer._train_step, state, x, y), 2)
            if auto and trainer._train_step._fallback is not None:
                out["auto_fellback"] = True
        except Exception as e:  # noqa: BLE001
            out[name.replace("_ms", "_error")] = (
                f"{type(e).__name__}: {e}"[:300])
    print(json.dumps(out))


if __name__ == "__main__":
    with tpu_lock("probe15"):
        main()
