"""probe13: in-program step decomposition from a jax.profiler trace.

VERDICT r4 weak #1: the isolated-stack decomposition double-counts (fetch
smear + no in-step overlap), reporting other_ms = -17. The fix is to time
the stages INSIDE one compiled program: capture a device trace of the
real bench train step, attribute every device-plane event to
{spectral, ff, other} by its HLO metadata (jax.named_scope paths
propagate into op names), and report per-step sums — which add up to the
step by construction because a TPU core executes ops serially.

Usage:
    python scripts/probes/probe13_trace.py            # on the chip
    python scripts/probes/probe13_trace.py --cpu      # parser dev/smoke

Prints one JSON line: {"step_ms":..., "ff_ms":..., "spectral_ms":...,
"other_ms":..., "n_steps":...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        os.environ.setdefault("XLA_FLAGS", "")
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

        enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.train import Trainer

    if cpu:
        RES, WIDTH, LAYERS, MODES, BATCH = 32, 16, 2, 8, 2
        kw = {}
    else:
        RES, WIDTH, LAYERS, MODES, BATCH = 256, 64, 4, 64, 8
        kw = dict(compute_dtype=jnp.bfloat16,
                  spectral_impl=os.environ.get("RPDE_SPECTRAL_IMPL",
                                               "dft_v3"),
                  approx_gelu=True,
                  ff_impl=os.environ.get("RPDE_FF_IMPL", "fused"))
    model = FFNO2D(in_channels=1, out_channels=1, width=WIDTH,
                   n_layers=LAYERS, n_modes=MODES, factor=4,
                   ff_weight_norm=True, n_ff_layers=3, layer_norm=True,
                   dropout=0.0, **kw)
    trainer = Trainer(model, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 1, RES, RES)), jnp.float32)
    y = jnp.roll(x, 7, axis=-1)
    state = trainer.init(x[:1])

    from resolution_pde_tpu.utils.trace_decomp import step_decomposition

    trace_dir = tempfile.mkdtemp(prefix="rpde_trace_")
    d = step_decomposition(trainer, state, x, y, trace_dir, n_steps=5)
    out = {k: round(v, 3) for k, v in d.items()}
    out["trace_dir"] = trace_dir
    print(json.dumps(out))


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        main()
    else:
        from resolution_pde_tpu.utils.tpu_lock import tpu_lock

        with tpu_lock("probe13"):
            main()
