"""2D full-system integration demo: generate Navier-Stokes vorticity data
with the on-device pseudo-spectral solver, train FFNO2D through the 2D CLI
driver (mixed-precision TPU fast path), and run the super-resolution sweep.

    python scripts/integration_demo_2d.py [--epochs 8] [--n-traj 24]
                                          [--res 64] [--cpu]

The 2D counterpart of scripts/integration_demo.py — the end-to-end
convergence check on the reference's flagship PDE (SURVEY.md §2.6 solver ->
§2.4 NS loader -> 2D driver -> §2.5 eval)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-traj", type=int, default=24)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--record-steps", type=int, default=10)
    ap.add_argument("--T", type=float, default=1.0)
    ap.add_argument("--out", default="runs/integration_demo_2d")
    ap.add_argument("--fast", action="store_true",
                    help="bf16 + dft_v3 + fused-FF training fast path")
    ap.add_argument("--model", choices=("ffno", "cno", "scot"),
                    default="ffno",
                    help="ffno: FFNO2D naive; cno: CNO2d resize training "
                         "(BASELINE config 4 — batches antialias-resized "
                         "to cno_train_size, use_resize evaluation)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    if args.record_steps >= args.res:
        raise SystemExit(
            f"--record-steps {args.record_steps} must be < --res "
            f"{args.res}: the NS file format distinguishes the time axis "
            "from spatial axes by size (datagen/writers.py, data/io.py "
            "read_ns)")
    if args.fast and args.model != "ffno":
        raise SystemExit("--fast (bf16 + dft_v3 + fused FF) applies to "
                         "--model ffno only")

    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()

    from resolution_pde_tpu.datagen.navier_stokes import generate_ns_dataset
    from resolution_pde_tpu.datagen.writers import write_ns_file

    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)
    fname = f"ns_{args.res}_demo.h5"

    print(f"generating {args.n_traj} NS trajectories at {args.res}^2 "
          f"(viscosity 1e-3, T={args.T})...")
    a, u, t = generate_ns_dataset(
        jax.random.key(0), args.n_traj, s=args.res, viscosity=1e-3,
        T=args.T, delta_t=5e-4, record_steps=args.record_steps,
        batch_size=args.n_traj)
    write_ns_file(os.path.join(data_dir, fname), u, a=a, t=t)
    print(f"  u: {u.shape}, range [{u.min():.2f}, {u.max():.2f}]")

    from resolution_pde_tpu.cli.main_2d import main as main_2d

    common_overrides = [
        "dataset=ns_naive",
        f"dataset.dataset_params.filename={fname}",
        f"dataset.dataset_params.saved_folder={data_dir}",
        f"dataset.original_res={args.res}",
        f"dataset.max_test_resolution={args.res}",
        "dataset.rollout_steps=0",
        f"training.epochs={args.epochs}",
        "training.batch_size=8",
    ]
    if args.model == "cno":
        # BASELINE config 4: CNO2d resize training — antialias-resize every
        # batch to the fixed train size, evaluate via resize_to_train
        overrides = common_overrides + [
            "model=cno_2d",
            f"dataset.cno_train_size={args.res // 2}",
            "dataset.evaluation_type=use_resize",
            "dataset.resize_to_train=true",
            "training.cno_resize_training=true",
            "model.N_layers=3",
            "model.N_res=2",
            "model.N_res_neck=2",
            "model.channel_multiplier=16",
        ]
    elif args.model == "scot":
        # Poseidon architecture (ScOT2d, conf/model/pos surface) scaled to
        # demo size: 2 stages, 1 vorticity channel. window_size must
        # divide the stage-0 token grid (res/patch_size).
        overrides = common_overrides + [
            "model=pos",
            "model.num_channels=1",
            "model.num_out_channels=1",
            "model.embed_dim=48",
            "model.depths=[2,2]",
            "model.num_heads=[3,6]",
            "model.skip_connections=[2,0]",
            "model.window_size=8",
        ]
    else:
        overrides = common_overrides + [
            "model=ffno_2d",
            "model.width=32",
            "model.n_layers=3",
            "model.n_modes=16",
            "model.factor=4",
            "model.n_ff_layers=2",
            "model.layer_norm=true",
        ]
    if args.fast and args.model == "ffno":
        overrides += [
            "model.compute_dtype=bfloat16",
            "model.spectral_impl=dft_v3",
            "model.approx_gelu=true",
            "model.ff_impl=fused",
        ]
    out = main_2d(overrides)

    summary = {
        "test_rel_l2": float(out["test_loss"]),
        "super_resolution": {int(k): float(v)
                             for k, v in out["super_resolution"].items()},
    }
    print("\n==== 2D integration demo summary ====")
    print(json.dumps(summary, indent=2))
    assert np.isfinite(summary["test_rel_l2"])
    return summary


if __name__ == "__main__":
    main()
