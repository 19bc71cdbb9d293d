"""Full-system integration demo: generate Kuramoto-Sivashinsky data with the
on-device ETDRK4 solver, write reference-format files, train FFNO1D through
the standard CLI pipeline, and run the complete evaluation suite
(super-resolution sweep, autoregressive rollout, frequency decomposition,
plots).

    python scripts/integration_demo.py [--epochs 40] [--n-traj 128]

This is the end-to-end convergence check SURVEY.md §4 calls for, on data
from the §2.6-style solver — no external files needed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--n-traj", type=int, default=128)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--out", default="runs/integration_demo")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (tests/debug)")
    ap.add_argument("--model", choices=("ffno", "s4d", "s4"),
                    default="ffno",
                    help="ffno: FFNO1D on Markov pairs; s4d/s4: S4 window "
                         "models (BASELINE config 5) incl. the "
                         "sliding-window rollout")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()

    from resolution_pde_tpu.datagen import solve_ks, write_ks_file
    from resolution_pde_tpu.datagen.ks import random_ks_initial_conditions

    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)

    # --- generate chaotic KS trajectories (burn-in then record) ---
    print(f"generating {args.n_traj} KS trajectories at {args.res}...")
    for name, n, seed in (("KS_train_2048.h5", args.n_traj, 1),
                          ("KS_valid.h5", max(args.n_traj // 8, 8), 2),
                          ("KS_test.h5", max(args.n_traj // 8, 8), 3)):
        u0 = random_ks_initial_conditions(jax.random.key(seed), n, args.res,
                                          L=64.0, lmax=8)
        # burn-in to the attractor, then record 26 snapshots
        burn = solve_ks(u0, L=64.0, dt=0.05, n_snapshots=2,
                        steps_per_snapshot=400)
        traj = solve_ks(burn[:, -1], L=64.0, dt=0.05, n_snapshots=26,
                        steps_per_snapshot=10)
        write_ks_file(os.path.join(data_dir, name), np.asarray(traj), L=64.0,
                      dt=0.5)
        print(f"  {name}: {traj.shape}, range "
              f"[{float(traj.min()):.2f}, {float(traj.max()):.2f}]")

    # --- train + evaluate through the standard CLI driver ---
    from resolution_pde_tpu.cli.main_1d import main as main_1d

    if args.model == "ffno":
        overrides = [
            "model=ffno_1d",
            "dataset=ks_naive",
            f"dataset.dataset_params.saved_folder={data_dir}",
            f"dataset.original_res={args.res}",
            f"dataset.max_test_resolution={args.res}",
            "dataset.rollout_steps=8",
            "model.width=64",
            "model.n_modes=32",
            "model.n_layers=4",
            "model.dropout=0.0",
            f"training.epochs={args.epochs}",
            "training.batch_size=64",
            "training.learning_rate=1e-3",
        ]
    else:
        # BASELINE config 5: S4/S4D window model on KS + rollout sweep
        window = 10
        overrides = [
            f"model={args.model}_1d",
            "dataset=ks_s4",
            f"dataset.dataset_params.saved_folder={data_dir}",
            f"dataset.dataset_params.window_size={window}",
            f"dataset.window_size={window}",
            f"dataset.original_res={args.res}",
            f"dataset.max_test_resolution={args.res}",
            "dataset.rollout_steps=8",
            f"model.d_input={window}",
            "model.d_model=64",
            "model.n_layers=4",
            "model.dropout=0.0",
            f"training.epochs={args.epochs}",
            "training.batch_size=64",
            "training.learning_rate=1e-3",
        ]
    out = main_1d(overrides)

    # --- plots ---
    from resolution_pde_tpu.utils.plotting import (
        plot_super_resolution, save_results_csv)

    fig_dir = os.path.join(args.out, "figures")
    plot_super_resolution(out["super_resolution"],
                          save_path=os.path.join(fig_dir, "superres.png"),
                          train_res=args.res)
    save_results_csv(out["super_resolution"],
                     os.path.join(fig_dir, "superres.csv"),
                     columns=("resolution", "rel_l2"))
    save_results_csv(out["rollout"], os.path.join(fig_dir, "rollout.csv"),
                     columns=("resolution", "rollout_rel_l2"))

    print("\n==== integration demo summary ====")
    print(f"test rel-L2: {out['test_loss']:.4f}")
    for r, v in sorted(out["super_resolution"].items()):
        print(f"  super-res @{r:4d}: {v:.4f}")
    for r, v in sorted(out["rollout"].items()):
        print(f"  rollout   @{r:4d}: {v:.4f}")
    print(f"figures in {fig_dir}")
    return out


if __name__ == "__main__":
    main()
