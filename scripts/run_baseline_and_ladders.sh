#!/bin/bash
# Reproduce the reference's experiment families end-to-end on the TPU:
#   1. baseline (the five BASELINE.json canonical configs)
#   2. ks_ladder  (resolution-strategy ladder; needs the PINO KS file)
#   3. burger_ladder (needs the PDEBench multires dirs)
# Data prerequisites materialized first (idempotent: skips existing files).
# Sweeps run with isolate=true so a transient tunnel outage cannot poison
# a whole family (see cli/sweep.py).
set -e
cd /root/repo
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
# Remember whether the caller pinned EPOCHS: the baseline family defaults
# to 50 but the ladder tail is sized for its own default (20) — only an
# explicit caller override should force both to the same count.
EPOCHS_SET="${EPOCHS+y}"
EPOCHS="${EPOCHS:-50}"
# same lock file the Python drivers honor (utils/tpu_lock.py)
LOCK="${RPDE_TPU_LOCK:-/tmp/rpde_tpu.lock}"

# Quick perf A/B first (minutes, informs the bench default): fused FF
# recompute backward vs saved-pre-activation backward, isolated stack and
# full train step. One process per stage (cold compiles can be long).
# RUN_PROBES=0 skips (e.g. when the stages already ran this session).
# compiled-Mosaic correctness smoke for every Pallas kernel first
# (self-locking; one PASS/FAIL line per kernel, nonzero on any FAIL).
# A FAIL gates the session: hours of training on a broken kernel is
# the exact scenario the smoke exists to prevent. Unconditional — the
# smoke is a gate, not a probe; RUN_PROBES only governs the A/B stages.
if ! python scripts/pallas_smoke.py; then
    if [ "${ALLOW_SMOKE_FAIL:-0}" = "1" ]; then
        echo "PALLAS SMOKE FAILED (ALLOW_SMOKE_FAIL=1, continuing)"
    else
        echo "PALLAS SMOKE FAILED — aborting (ALLOW_SMOKE_FAIL=1 overrides)"
        exit 1
    fi
fi
if [ "${RUN_PROBES:-1}" != "0" ]; then
    for st in ff ff_saved step8 step8_ffsaved spec spec_s step8_v3s step8_best; do
        flock "$LOCK" python scripts/probes/probe11_stage.py "$st" || true
    done
fi

# Baseline-family data prerequisites (idempotent: a fresh VM loses the
# untracked data/ tree — regenerate whatever is missing, solves on-device).
# Guard on the LAST artifact generate_ks writes (the res_32 tree files
# come after the naive train/valid/test triple), so an interrupted
# generation is redone rather than shipped partial.
KS_LAST="data/ks/res_32/visc_0.075_L64.0_lmax8_et5.0_nte51_nt51/KS_test.h5"
if [ ! -f "$KS_LAST" ]; then
    python -m resolution_pde_tpu.cli.generate_data pde=ks out=data/ks \
        n=512 resolutions=[512,256,128,64,32] n_snapshots=51 \
        viscosity=0.075 seed=11
fi
if [ ! -f data/burgers/1D_Burgers_Sols_Nu0.001.hdf5 ]; then
    python -m resolution_pde_tpu.cli.generate_data pde=burgers \
        out=data/burgers n=512 resolutions=[1024] n_snapshots=51 \
        viscosity=0.001 seed=12
fi
if [ ! -f data/ns/ns_256_1e-03.h5 ]; then
    python -m resolution_pde_tpu.cli.generate_data pde=ns out=data/ns \
        n=128 resolutions=[256] n_snapshots=26 viscosity=1e-03 seed=13
fi

# headline family first — ladder data generation can wait. sweep exits
# nonzero when ANY leg failed (tables are still written); under set -e
# that must not abort the whole pipeline before the ladders run. A
# committed all-legs-green `.ok` marker (written by cli/sweep.py into the
# run dir) skips the family across machine resets.
if ! ls runs/sweeps/baseline_*/.ok >/dev/null 2>&1; then
    if ! python -m resolution_pde_tpu.cli.sweep family=baseline isolate=true \
        training.epochs=$EPOCHS training.t_max=$EPOCHS; then
        echo "baseline family had failed legs; continuing to the ladder tail"
    fi
fi

# Everything after the baseline family (BASELINE #5 eval drivers, ladder
# data prerequisites, four ladder-family sweeps) lives in ONE place — the
# resumable tail script. EPOCHS passes through only when the caller
# pinned it; otherwise the tail keeps its own sizing default (20).
if [ -n "$EPOCHS_SET" ]; then
    exec env EPOCHS="$EPOCHS" bash "$(dirname "$0")/run_ladders_tail.sh"
fi
exec bash "$(dirname "$0")/run_ladders_tail.sh"
