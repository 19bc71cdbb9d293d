"""probe14: per-op breakdown of the bench step's "other" stage.

probe13 showed the in-step decomposition (ff ~14.5 ms, spectral ~7.5 ms,
other ~11 ms). This dumps the top individual HLO ops of the "other"
stage (op name, per-step ms, event count, HLO text prefix) so the copy /
convert / optimizer split is evidence, not narrative. Run with
RPDE_AUTO_LAYOUT=1 to break down the AUTO-layout step instead.

Usage: python scripts/probes/probe14_other.py [--cpu]
Prints one JSON line {"step_ms":..., "top_other":[...]} plus a table.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import tempfile

import numpy as np

_HLO_RE = re.compile(r"%?([\w.\-]+) = ([^\n]*)")


def hlo_lines(compiled_text: str) -> dict:
    out = {}
    for m in _HLO_RE.finditer(compiled_text):
        out.setdefault(m.group(1), m.group(2)[:140])
    return out


def per_op_times(trace_dir: str):
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    totals: dict = {}
    counts: dict = {}
    names: dict = {}
    steps: list = []
    for path in paths:
        with open(path, "rb") as f:
            data = ProfileData.from_serialized_xspace(f.read())
        for plane in data.planes:
            if not plane.name.lower().startswith("/device:"):
                continue
            for line in plane.lines:
                if line.name == "Steps":
                    steps.extend(e.duration_ns / 1e3 for e in line.events)
                if line.name != "XLA Ops":
                    continue
                for event in line.events:
                    op = event.name.split(" ", 1)[0].lstrip("%")
                    totals[op] = totals.get(op, 0.0) + event.duration_ns / 1e3
                    counts[op] = counts.get(op, 0) + 1
                    names.setdefault(op, event.name[:200])
    return totals, counts, steps, names


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

        enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from resolution_pde_tpu.models import FFNO2D
    from resolution_pde_tpu.train import Trainer
    from resolution_pde_tpu.utils.trace_decomp import (
        stage_map_from_compiled)

    if cpu:
        RES, WIDTH, LAYERS, MODES, BATCH = 32, 16, 2, 8, 2
        kw = {}
    else:
        RES, WIDTH, LAYERS, MODES, BATCH = 256, 64, 4, 64, 8
        kw = dict(compute_dtype=jnp.bfloat16,
                  spectral_impl=os.environ.get("RPDE_SPECTRAL_IMPL",
                                               "dft_v3"),
                  approx_gelu=True, ff_impl="fused")
    model = FFNO2D(in_channels=1, out_channels=1, width=WIDTH,
                   n_layers=LAYERS, n_modes=MODES, factor=4,
                   ff_weight_norm=True, n_ff_layers=3, layer_norm=True,
                   dropout=0.0, **kw)
    trainer = Trainer(
        model, learning_rate=1e-3,
        auto_layout=os.environ.get("RPDE_AUTO_LAYOUT", "0") != "0")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 1, RES, RES)), jnp.float32)
    y = jnp.roll(x, 7, axis=-1)
    state = trainer.init(x[:1])

    compiled = trainer._train_step.lower(state, x, y, None).compile()
    text = compiled.as_text()
    stage_of = stage_map_from_compiled(text)
    lines = hlo_lines(text)

    trace_dir = tempfile.mkdtemp(prefix="rpde_p14_")
    state, _ = trainer.profile_step(state, x, y, trace_dir, n_steps=5)
    totals, counts, steps, names = per_op_times(trace_dir)
    n = max(len(steps), 5)

    other = [(v / n / 1e3, counts[op] / n, op) for op, v in totals.items()
             if stage_of.get(op, "other") == "other"]
    other.sort(reverse=True)
    top = []
    for ms, cnt, op in other[:25]:
        hlo = lines.get(op, "") or names.get(op, "")
        top.append({"op": op, "ms": round(ms, 3), "n": round(cnt, 1),
                    "hlo": hlo[:160]})
        print(f"{ms:8.3f} ms  x{cnt:4.1f}  {op:<28} {hlo[:160]}",
              flush=True)
    out = {
        "step_ms": round(sum(steps) / len(steps) / 1e3, 2) if steps
        else None,
        "other_total_ms": round(sum(m for m, _, _ in other), 2),
        "auto_layout": trainer.auto_layout and
        getattr(trainer._train_step, "_fallback", None) is None,
        "top_other": top[:12],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        main()
    else:
        from resolution_pde_tpu.utils.tpu_lock import tpu_lock

        with tpu_lock("probe14"):
            main()
