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
EPOCHS="${EPOCHS:-50}"
# same lock file the Python drivers honor (utils/tpu_lock.py)
LOCK="${RPDE_TPU_LOCK:-/tmp/rpde_tpu.lock}"

# Quick perf A/B first (minutes, informs the bench default): fused FF
# recompute backward vs saved-pre-activation backward, isolated stack and
# full train step. One process per stage (cold compiles can be long).
# RUN_PROBES=0 skips (e.g. when the stages already ran this session).
if [ "${RUN_PROBES:-1}" != "0" ]; then
    for st in ff ff_saved step8 step8_ffsaved spec spec_s step8_v3s step8_best; do
        flock "$LOCK" python scripts/probes/probe11_stage.py "$st" || true
    done
fi

# Baseline-family data prerequisites (idempotent: a fresh VM loses the
# untracked data/ tree — regenerate whatever is missing, solves on-device).
if [ ! -f data/ks/KS_train_2048.h5 ]; then
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

# headline family first — ladder data generation can wait
python -m resolution_pde_tpu.cli.sweep family=baseline isolate=true \
    training.epochs=$EPOCHS training.t_max=$EPOCHS

# BASELINE #5 tail: re-load the S4 leg's checkpoint through the two
# standalone eval drivers (reference autoregressive_eval.py +
# frequency_evaluation.py) — the canonical config is "S4/S4D on KS +
# rollout + frequency sweep", not just the training run.
# glob: save_run_checkpoint names the file ks_${SLURM_JOB_ID:-local}
S4CKPT=$(ls -d checkpoints/s4model/ks_* 2>/dev/null | head -1)
if [ -n "$S4CKPT" ]; then
    flock "$LOCK" python -m resolution_pde_tpu.cli.autoregressive_eval model=s4_1d \
        dataset=ks_s4 "dataset.saved_checkpoint_path=$S4CKPT" || true
    flock "$LOCK" python -m resolution_pde_tpu.cli.frequency_evaluation model=s4_1d \
        dataset=ks_s4 "dataset.saved_checkpoint_path=$S4CKPT" || true
fi

if [ ! -f data/pino/ks/ks_pino.h5 ]; then
    python -m resolution_pde_tpu.cli.generate_data pde=ks out=data/pino/ks \
        n=256 resolutions=[1024] n_snapshots=51 seed=21
    cp data/pino/ks/KS_train_2048.h5 data/pino/ks/ks_pino.h5
fi
if [ ! -d data/pdebench_gen/burgers_1024_0.001 ]; then
    python -m resolution_pde_tpu.cli.generate_data pde=burgers \
        out=data/pdebench_gen n=256 resolutions=[1024,512,256,128] \
        n_snapshots=51 viscosity=0.001 seed=22
fi
mkdir -p data/pdebench
if [ ! -f data/pdebench/1D_Burgers_Sols_Nu0.001.hdf5 ]; then
    cp data/pdebench_gen/1D_Burgers_Sols_Nu0.001.hdf5 data/pdebench/
fi

for fam in ks_ladder burger_ladder ks_models; do
    python -m resolution_pde_tpu.cli.sweep family=$fam isolate=true \
        training.epochs=$EPOCHS training.t_max=$EPOCHS
done

# Active-matter ladder: The Well needs egress, so synthesize the exact
# multi-file ingestion layout with NS solves (see generate_data pde=active).
if [ ! -f data/well/active_matter/train/active_matter_0.hdf5 ]; then
    python -m resolution_pde_tpu.cli.generate_data pde=active \
        out=data/well/active_matter/train n=24 resolutions=[256] \
        n_snapshots=49 seed=23
fi
python -m resolution_pde_tpu.cli.sweep family=ns_active_ladder isolate=true \
    training.epochs=$EPOCHS training.t_max=$EPOCHS
echo "ALL FAMILIES DONE"
