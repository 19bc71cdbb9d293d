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

import glob
import json
import os
import sys
import tempfile

import numpy as np


def classify(name: str) -> str:
    """Map a device event name (HLO op name, scope-prefixed) to a stage.

    The model annotates its hot paths with jax.named_scope("spectral") /
    ("ff") (models/ffno.py); XLA carries the scope into fusion names and
    pallas custom-call names.
    """
    n = name.lower()
    if "specconv" in n:
        return "spectral"
    if "ffstack" in n:
        return "ff"
    return "other"


def parse_trace(trace_dir: str):
    """Sum device-plane event durations per stage, per step.

    Returns (totals_by_stage_us, device_busy_us, n_planes_used).
    Only TPU/accelerator planes count (host planes would double-book).
    """
    from jax.profiler import ProfileData

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    totals: dict = {}
    busy = 0.0
    planes_used = 0
    for path in paths:
        data = ProfileData.from_serialized_xspace(
            open(path, "rb").read())
        for plane in data.planes:
            pname = plane.name.lower()
            # device planes: "/device:TPU:0" / "TPU:0" / gpu; skip host
            if "tpu" not in pname and "gpu" not in pname and (
                    "device" not in pname or "host" in pname):
                continue
            planes_used += 1
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op lines carry per-op events; step/module lines
                # would double-count the same wall interval
                if "step" in lname or "module" in lname:
                    continue
                for event in line.events:
                    dur = event.duration_ns / 1e3  # us
                    totals[classify(event.name)] = (
                        totals.get(classify(event.name), 0.0) + dur)
                    busy += dur
    return totals, busy, planes_used


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

    n_steps = 5
    trace_dir = tempfile.mkdtemp(prefix="rpde_trace_")
    state, _ = trainer.profile_step(state, x, y, trace_dir,
                                    n_steps=n_steps)
    totals, busy, planes = parse_trace(trace_dir)
    per_step = {k: v / n_steps / 1e3 for k, v in totals.items()}  # ms
    out = {
        "n_steps": n_steps,
        "planes": planes,
        "ff_ms": round(per_step.get("ff", 0.0), 3),
        "spectral_ms": round(per_step.get("spectral", 0.0), 3),
        "other_ms": round(per_step.get("other", 0.0), 3),
        "device_busy_ms_per_step": round(busy / n_steps / 1e3, 3),
        "trace_dir": trace_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        main()
    else:
        from resolution_pde_tpu.utils.tpu_lock import tpu_lock

        with tpu_lock("probe13"):
            main()
