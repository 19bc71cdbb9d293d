#!/usr/bin/env python
"""Tiny-scale CPU rehearsal of a sweep family — run the EXACT leg
pipelines (train, super-res sweep, rollout, tables) against a
just-generated miniature dataset before spending TPU time on the real
thing.

Why this exists: a sweep leg is a composition of overrides that may
never have executed together (model x dataset x eval strategy x rollout
knobs), and the chip pays minutes of compile per leg before a wiring
bug surfaces. Both times this rehearsal ran ahead of a family it caught
a real defect on the CPU in seconds: the true-mres eval-swap layout bug
(KS_valid/KS_test missing from the per-resolution tree), and the
cno2d_original_ns size pairing (fixed-size model vs data resolution).

    python scripts/rehearse_family.py ns_models
    python scripts/rehearse_family.py ns_models only=pos_ns
    python scripts/rehearse_family.py ks_models n=8 res=64

Pins the CPU backend in-process (the axon TPU stays free; tpu_lock is
skipped when CPU-pinned), generates a miniature dataset for the
family's PDE under /tmp, and rewires each leg's data/eval knobs to the
miniature scale. Everything else — drivers, eval sweeps, table writers
— is the production path, 1 epoch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# isolate=true legs run in CHILD processes where the sitecustomize re-pins
# JAX_PLATFORMS=axon; backend_probe.pin_platform only honors $RPDE_PLATFORM,
# so without this a "CPU rehearsal" would run isolated legs on the real TPU
# — unserialized, because this CPU-pinned parent skips tpu_lock.
os.environ["RPDE_PLATFORM"] = "cpu"

# family -> (pde, generate_data args beyond out=, per-leg extra overrides)
# The overrides point every leg of the family at the miniature dataset and
# shrink eval scope to resolutions the tiny file actually contains.
_REHEARSALS = {
    "ns_models": ("ns", ["n=8", "resolutions=[{res}]", "n_snapshots=12",
                         "viscosity=1e-03", "seed=3"],
                  ["dataset.dataset_params.saved_folder={out}",
                   "dataset.dataset_params.filename=ns_{res}_1e-03.h5",
                   "dataset.original_res={res}",
                   "dataset.max_test_resolution={res}",
                   # fixed-size CNO legs must match the rehearsal's train
                   # resolution (res/2 after the legs' reduced_resolution=2),
                   # exactly as the real legs' 128 matches 256/2
                   "dataset.cno_train_size={half}"]),
    "ks_models": ("ks", ["n=16", "resolutions=[{res}]", "n_snapshots=12",
                         "viscosity=0.075", "seed=3", "et=2.5"],
                  ["dataset.dataset_params.saved_folder={out}",
                   "dataset.max_test_resolution={res}",
                   "dataset.original_res={res}",
                   "dataset.cno_train_size={res}"]),
}


def main(argv):
    if not argv or argv[0] not in _REHEARSALS:
        raise SystemExit(f"usage: rehearse_family.py <family> [only=...] "
                         f"[n=N] [res=R]; families: {sorted(_REHEARSALS)}")
    family = argv[0]
    res = 64
    passthrough = []
    for a in argv[1:]:
        if a.startswith("res="):
            res = int(a.split("=", 1)[1])
        else:
            passthrough.append(a)

    pde, gen_args, leg_extras = _REHEARSALS[family]
    out = f"/tmp/rehearse_{pde}_{res}"
    fmt = dict(out=out, res=res, half=max(res // 2, 16))
    # The marker records the EXACT generation arg list: rerunning with a
    # different n= (or after editing _REHEARSALS gen args) must regenerate
    # the miniature dataset, not silently reuse a stale one.
    gen_argv = ([f"pde={pde}", f"out={out}"]
                + [a.format(**fmt) for a in gen_args]
                + [a for a in passthrough if a.startswith("n=")])
    marker = os.path.join(out, ".generated")
    stamp = " ".join(gen_argv)
    prev = open(marker).read() if os.path.exists(marker) else None
    if prev != stamp:
        from resolution_pde_tpu.cli.generate_data import main as gen
        gen(gen_argv)
        with open(marker, "w") as f:
            f.write(stamp)

    from resolution_pde_tpu.cli.sweep import main as sweep
    results = sweep([f"family={family}", "rehearsal=true"]
                    + [a for a in passthrough if not a.startswith("n=")]
                    + [a.format(**fmt) for a in leg_extras]
                    + ["training.epochs=1", "training.t_max=1",
                       "save_figures=false"])
    # Nonzero exit when any leg failed, so `rehearse_family.py <fam> &&
    # <real sweep>` works as a scripted pre-TPU gate (sweep.main records
    # per-leg failures in the table instead of raising).
    raise SystemExit(0 if all(v is not None for v in results.values())
                     else 1)


if __name__ == "__main__":
    main(sys.argv[1:])
