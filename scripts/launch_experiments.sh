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
  # --- round-2 config families ---
  ks_mres)           # single-file multires (naive downsample mix)
    python -m resolution_pde_tpu.cli.main_1d model=ffno_1d dataset=ks_naive_mres ;;
  ks_resize)         # FFT-resize strategy
    python -m resolution_pde_tpu.cli.main_1d model=cno_1d dataset=ks_resize ;;
  ks_pino)           # PINO-format KS, minmax normalization
    python -m resolution_pde_tpu.cli.main_1d model=ffno_1d dataset=ks_pino ;;
  burger_mres)       # single-file multires Burgers
    python -m resolution_pde_tpu.cli.main_1d model=ffno_1d dataset=burger_naive_mres ;;
  burger_true_mres)  # true multi-resolution Burgers (per-res dirs)
    python -m resolution_pde_tpu.cli.main_1d model=ffno_1d dataset=burger_naive_true_mres ;;
  ns_active)         # multi-file active matter (The-Well format)
    python -m resolution_pde_tpu.cli.main_2d model=ffno_2d dataset=ns_active_t2 ;;
  darcy)             # steady-state Darcy
    python -m resolution_pde_tpu.cli.main_2d model=fno_2d dataset=darcy_flow ;;
  pos)               # Poseidon/ScOT operator
    python -m resolution_pde_tpu.cli.main_2d model=pos dataset=ns_naive ;;
  gnot)              # GNOT point-cloud operator
    python -m resolution_pde_tpu.cli.main_2d model=mgpt dataset=ns_gnot ;;
  demo_1d)           # self-contained end-to-end KS demo (generates data)
    python scripts/integration_demo.py ;;
  demo_2d)           # self-contained end-to-end NS demo, TPU fast path
    python scripts/integration_demo_2d.py --fast ;;
  bench)
    python bench.py ;;
  *)
    echo "unknown experiment: $EXP" >&2; exit 1 ;;
esac
