#!/usr/bin/env bash
# Experiment launcher (the reference's run1.sh equivalent, minus SLURM —
# on TPU VMs, run directly or via your scheduler of choice).
#
# Usage: scripts/launch_experiments.sh <experiment>
set -euo pipefail
cd "$(dirname "$0")/.."

EXP="${1:-ks_ffno}"

case "$EXP" in
  burger_fno)        # BASELINE config 1: FNO1d Burgers@1024 naive
    python -m resolution_pde_tpu.cli.main_1d model=fno_1d dataset=burger_naive ;;
  ks_ffno)           # BASELINE config 2: FFNO1D KS@512 true multi-res
    python -m resolution_pde_tpu.cli.main_1d model=ffno_1d dataset=ks_naive_true_mres1 ;;
  ns_ffno)           # BASELINE config 3: FFNO2D NS@256 true multi-res
    python -m resolution_pde_tpu.cli.main_2d model=ffno_2d dataset=ns_naive_true_mres1 training.batch_size=32 ;;
  ns_cno)            # BASELINE config 4: CNO2d resize-trained NS
    python -m resolution_pde_tpu.cli.main_2d model=cno_2d dataset=ns_naive ;;
  ks_s4)             # BASELINE config 5: S4 on KS windows + rollout + frequency sweep
    python -m resolution_pde_tpu.cli.main_1d model=s4_1d dataset=ks_s4
    python -m resolution_pde_tpu.cli.autoregressive_eval model=s4_1d dataset=ks_s4 ;;
  bench)
    python bench.py ;;
  *)
    echo "unknown experiment: $EXP" >&2; exit 1 ;;
esac
