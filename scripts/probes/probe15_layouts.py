"""probe15: do AUTO in/out layouts kill the per-step relayout copies?

probe14's breakdown of the bench step's 11 ms "other" stage showed ~8 ms
of layout copies, including per-step relayouts of the fused-FF weight
kernels (state.params[...]['kernel'] copies at ~315 us each): the
optimizer writes params in one layout, the Pallas custom call wants
another, and XLA re-copies every step. jax.jit(in_shardings/out_shardings
= Format(Layout.AUTO)) lets XLA pick boundary layouts to match internal
use, so the donated state can circulate in the compute-preferred layout.

Measures the CURRENT step (cache-hit compile) and the AUTO-layout step
(fresh compile, one-time) at the bench shapes; prints one JSON line.
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
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.train import Trainer

    model = FFNO2D(in_channels=1, out_channels=1, width=64, n_layers=4,
                   n_modes=64, factor=4, ff_weight_norm=True,
                   n_ff_layers=3, layer_norm=True, dropout=0.0,
                   compute_dtype=jnp.bfloat16, spectral_impl="dft_v3",
                   approx_gelu=True, ff_impl="fused")
    trainer = Trainer(model, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 1, 256, 256)), jnp.float32)
    y = jnp.roll(x, 7, axis=-1)
    state = trainer.init(x[:1])

    out = {}
    # a fresh step per variant: donated buffers cannot be reused
    base_ms = _time_step(trainer._train_step, state, x, y)
    out["base_ms"] = round(base_ms, 2)

    try:
        fn = trainer._train_step.__wrapped__
        auto = jax.tree_util.tree_map(
            lambda _: Format(Layout.AUTO), (state, x, y))
        step_auto = jax.jit(fn, donate_argnums=(0,),
                            in_shardings=(*auto, None),
                            out_shardings=Format(Layout.AUTO))
        state2 = trainer.init(x[:1])
        lowered = step_auto.lower(state2, x, y, None)
        compiled = lowered.compile()
        in_fmts = compiled.input_formats[0]
        args = jax.tree_util.tree_map(
            lambda a, f: jax.device_put(a, f), (state2, x, y),
            in_fmts[:3])
        auto_ms = _time_step(lambda s, xx, yy, _:
                             compiled(s, xx, yy, None), *args)
        out["auto_ms"] = round(auto_ms, 2)
    except Exception as e:  # noqa: BLE001
        out["auto_error"] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps(out))


if __name__ == "__main__":
    with tpu_lock("probe15"):
        main()
