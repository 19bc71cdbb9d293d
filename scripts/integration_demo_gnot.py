"""End-to-end GNOT (MoE-GPT point-cloud operator) physics demo on TPU.

Generates NS vorticity on-device, converts frames to a point cloud
(the dgl-free realization of the reference's graph loader,
dataloaders/dgl_data.py:33-147), trains GNOTOperator (models/mgpt.py —
linear cross-attention over [features | positions] nodes, MoE feed
forward) through the standard Trainer, and reports test rel-L2.

Usage:
    python scripts/integration_demo_gnot.py            # TPU
    python scripts/integration_demo_gnot.py --cpu --res 16 --epochs 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--n-traj", type=int, default=24)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--record-steps", type=int, default=10)
    ap.add_argument("--n-hidden", type=int, default=64)
    ap.add_argument("--n-layers", type=int, default=2)
    ap.add_argument("--out", default="runs/integration_demo_gnot")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache

    enable_compile_cache()

    from resolution_pde_tpu.datagen.navier_stokes import generate_ns_dataset
    from resolution_pde_tpu.datagen.writers import write_ns_file

    data_dir = os.path.join(args.out, "data")
    os.makedirs(data_dir, exist_ok=True)
    fname = f"ns_{args.res}_demo.h5"

    print(f"generating {args.n_traj} NS trajectories at {args.res}^2 ...")
    a, u, t = generate_ns_dataset(
        jax.random.key(0), args.n_traj, s=args.res, viscosity=1e-3,
        T=1.0, delta_t=5e-4, record_steps=args.record_steps,
        batch_size=args.n_traj)
    write_ns_file(os.path.join(data_dir, fname), u, a=a, t=t)
    print(f"  u: {u.shape}")

    from resolution_pde_tpu.configs import (instantiate_dataset,
                                            instantiate_model, load_config)
    from resolution_pde_tpu.data.loader import Loader
    from resolution_pde_tpu.ops.losses import relative_l2
    from resolution_pde_tpu.train import Trainer

    cfg = load_config(model="mgpt", dataset="ns_gnot")
    out = instantiate_dataset(cfg.dataset.dataset_params,
                              filename=fname, saved_folder=data_dir)
    train, val, test, y_norm = out[0], out[1], out[2], out[5]
    print(f"point cloud: x {train.x.shape} (features|positions), "
          f"y {train.y.shape}")

    model = instantiate_model(cfg.model, n_hidden=args.n_hidden,
                              n_layers=args.n_layers)
    trainer = Trainer(model, learning_rate=1e-3, y_normalizer=y_norm,
                      use_normalizer=False)
    state = trainer.init(jnp.asarray(train.x[:2]))
    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(state.params))
    print(f"GNOTOperator params: {n_params / 1e6:.2f}M")

    loader = Loader(train, 8, shuffle=True, seed=0)
    losses = []
    for ep in range(args.epochs):
        state, loss = trainer.train_epoch(state, loader)
        losses.append(float(loss))
        print(f"epoch {ep}: train rel-L2 {loss:.4f}", flush=True)

    test_loss = trainer.evaluate(state, Loader(test, 8, shuffle=False))
    summary = {"train_first": losses[0], "train_last": losses[-1],
               "test_rel_l2": float(test_loss)}
    print("\n==== GNOT integration demo summary ====")
    print(json.dumps(summary, indent=2))
    assert np.isfinite(summary["test_rel_l2"])
    assert losses[-1] < losses[0]
    return summary


if __name__ == "__main__":
    main()
