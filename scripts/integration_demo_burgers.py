"""BASELINE config 1 end-to-end: FNO1d on Burgers@1024, naive strategy.

Self-contained: Gaussian-random-field initial conditions -> the on-device
pseudo-spectral Burgers solver (datagen/burgers.py) -> PDEBench-format
file -> the standard 1D CLI driver (model=fno_1d dataset=burger_naive)
with the full [32..1024] super-resolution sweep and autoregressive
rollout.

    python scripts/integration_demo_burgers.py [--epochs 30] [--n-traj 256]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-traj", type=int, default=256)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--nu", type=float, default=1e-3)
    ap.add_argument("--out", default="runs/integration_demo_burgers")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from resolution_pde_tpu.datagen.burgers import solve_burgers
    from resolution_pde_tpu.datagen.random_fields import GaussianRF
    from resolution_pde_tpu.datagen.writers import write_pdebench_file

    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)

    print(f"generating {args.n_traj} Burgers trajectories at {args.res}...")
    grf = GaussianRF(dim=1, size=args.res, alpha=2.5, tau=7.0)
    u0 = grf.sample(jax.random.key(0), args.n_traj)
    u0 = jnp.asarray(u0, jnp.float32)
    # 21 snapshots over T ~ 0.4 (enough advection to steepen fronts)
    traj = solve_burgers(u0, nu=args.nu, dt=1e-4, n_snapshots=21,
                         steps_per_snapshot=200)
    traj = np.asarray(traj)
    assert np.isfinite(traj).all()
    write_pdebench_file(
        os.path.join(data_dir, "1D_Burgers_Sols_Nu0.001.hdf5"), traj)
    print(f"  trajectories: {traj.shape}, range "
          f"[{traj.min():.2f}, {traj.max():.2f}]")

    from resolution_pde_tpu.cli.main_1d import main as main_1d

    out = main_1d([
        "model=fno_1d",
        "dataset=burger_naive",
        f"dataset.dataset_params.saved_folder={data_dir}",
        f"dataset.original_res={args.res}",
        f"dataset.max_test_resolution={args.res}",
        "dataset.rollout_steps=8",
        f"training.epochs={args.epochs}",
        "training.batch_size=64",
        "training.learning_rate=1e-3",
    ])

    print("\n==== Burgers@%d (BASELINE config 1) summary ====" % args.res)
    print(f"test rel-L2: {out['test_loss']:.4f}")
    for r, v in sorted(out["super_resolution"].items()):
        print(f"  super-res @{r:5d}: {v:.4f}")
    for r, v in sorted(out["rollout"].items()):
        print(f"  rollout   @{r:5d}: {v:.4f}")
    return out


if __name__ == "__main__":
    main()
