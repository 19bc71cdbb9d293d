"""1D training driver (reference main_1d.py:33-310).

    python -m resolution_pde_tpu.cli.main_1d model=ffno_1d \\
        dataset=ks_naive training.epochs=100
"""

from __future__ import annotations

import os
import sys

import jax
import numpy as np

from resolution_pde_tpu.configs import parse_cli, instantiate_dataset
from resolution_pde_tpu.cli import common
from resolution_pde_tpu.evaluation import (
    evaluate_all_resolutions,
    evaluate_rollout_all_resolutions,
)
from resolution_pde_tpu.utils.metrics import MetricsLogger


def main(argv=None, spatial_ndim: int = 1):
    # Persistent XLA compile cache: on this backend a cold FFNO2D compile
    # can exceed 10 min; with the cache a retried/isolated sweep leg (each
    # its own process) re-loads the program in seconds instead.
    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache
    enable_compile_cache()
    cfg = parse_cli(argv if argv is not None else sys.argv[1:])
    norm_type = cfg.dataset.dataset_params.get("normalization_type", "simple")

    data = instantiate_dataset(cfg.dataset.dataset_params)
    bundle = common.unpack_data(data, norm_type)

    batch_size = cfg.training.get("batch_size", 16)
    if spatial_ndim == 2:
        # reference main_2d.py:88-94 scales the global batch by the device
        # count so the per-device batch stays constant under DataParallel;
        # mirror it over the mesh's data-parallel extent
        from resolution_pde_tpu.parallel.mesh import (data_axis_size,
                                                      make_mesh)
        batch_size *= data_axis_size(make_mesh())
    train_loader, val_loader, test_loader = common.build_loaders(
        bundle, batch_size, cfg.dataset.get("train_mres", False),
        seed=cfg.training.get("seed", 0))

    sample = common.sample_input(bundle)
    if cfg.training.get("cno_resize_training"):
        # BASELINE config 4: every batch is antialias-resized to the
        # model's fixed training resolution (train/cno_resize.py — the
        # working version of the reference's dead interpolate_training.py)
        from resolution_pde_tpu.train.cno_resize import (ResizingLoader,
                                                         resize_batch_to)

        size = (cfg.dataset.get("cno_train_size")
                or cfg.dataset.get("original_res"))
        train_loader = ResizingLoader(train_loader, size, spatial_ndim)
        val_loader = ResizingLoader(val_loader, size, spatial_ndim)
        test_loader = ResizingLoader(test_loader, size, spatial_ndim)
        sample = resize_batch_to(jax.numpy.asarray(sample), size,
                                 spatial_ndim)

    model = common.build_model(cfg)
    trainer = common.build_trainer(cfg, model, bundle["y_normalizer"])
    state = trainer.init(sample)
    state = common.maybe_warm_start(cfg, trainer, state)

    n_params = sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(state.params))
    print(f"Total model parameters: {n_params / 1e6:.2f}M")

    logger = MetricsLogger(cfg.project_name, config=cfg,
                           use_wandb=cfg.get("log_to_wandb", False))

    schedule = common.build_schedule(cfg)
    # training.resume_from: continue a killed run exactly (step counter,
    # optimizer state, dropout-key phase, scheduler counters, LR curve)
    state, prior_hist, epochs_done, schedule = common.maybe_resume(
        cfg, state, schedule, train_loader=train_loader)
    import time as _t

    t_fit = _t.perf_counter()
    state, history = trainer.fit(
        state,
        train_loader,
        val_loader,
        epochs=max(cfg.training.get("epochs", 1) - epochs_done, 0),
        schedule=schedule,
        log_fn=logger.log,
        # training.checkpoint_every=N: async resumable snapshot every N
        # epochs to the run checkpoint path
        epoch_callback=common.periodic_checkpointer(cfg, schedule,
                                                    prior_hist=prior_hist),
    )
    if prior_hist:
        # stitch the restored epochs in front so the saved history (and
        # plots) cover the whole run, not just the resumed tail
        for k in ("train_loss", "val_loss", "lr"):
            if k in prior_hist:
                cur = getattr(history, k)
                cur[:0] = [float(v) for v in prior_hist[k]]

    train_seconds = _t.perf_counter() - t_fit

    test_loss = trainer.evaluate(state, test_loader)
    print(f"Test L2 loss: {test_loss:.6f}")
    logger.log({"test_loss": test_loss})

    ckpt_path = common.save_run_checkpoint(cfg, state, history, schedule)
    print(f"Checkpoint saved: {ckpt_path}")

    variables = {"params": state.params, **state.model_state}

    # --- super-resolution sweep (naive_utils / resize_utils) ---
    save_figures = bool(cfg.get("save_figures",
                                cfg.training.get("save_figures", False)))
    fig_dir = None
    if save_figures:
        # reference writes figures/<job_id> (main_1d.py:208-210)
        import time as _time

        fig_dir = os.path.join(
            "figures", f"{cfg.project_name}_{int(_time.time())}")

    results = {}
    sweep = None
    if cfg.dataset.get("max_test_resolution"):
        sweep = evaluate_all_resolutions(
            model, variables, common.make_superres_builder(cfg),
            current_res=common.eval_train_res(cfg),
            max_test_resolution=cfg.dataset.get("max_test_resolution"),
            x_normalizer=bundle["x_normalizer"],
            y_normalizer=bundle["y_normalizer"],
            batch_size=batch_size,
            spatial_ndim=spatial_ndim,
            resize_to_train=common.resize_trained(cfg),
            analyze_frequencies=save_figures,
            n_plot_examples=5 if save_figures else 0,
        )
        results = sweep["results"]
        logger.log_table(
            "super_resolution", ["resolution", "rel_l2"],
            [(r, v) for r, v in sorted(results.items())])
        for r, v in sorted(results.items()):
            print(f"Resolution {r:4d}: rel-L2 {v:.6f}")

    if save_figures and sweep is not None:
        from resolution_pde_tpu.utils import plotting as P

        pde = cfg.dataset.get("pde", "pde")
        P.plot_super_resolution(results, save_path=os.path.join(
            fig_dir, f"{pde}_super_resolution.png"))
        P.save_results_csv(results, os.path.join(
            fig_dir, f"{pde}_super_resolution.csv"),
            columns=("resolution", "rel_l2"))
        P.plot_examples_multiple(sweep["plot_data"], pde=pde,
                                 save_dir=fig_dir,
                                 spatial_ndim=spatial_ndim)
        if spatial_ndim == 2 and sweep["plot_data"]:
            P.plot_ns_channels(sweep["plot_data"], save_dir=fig_dir)
        for res, (err, mag, freqs) in sweep["frequency_data"].items():
            P.plot_frequency_decomposition(
                err, mag, freqs,
                save_path=os.path.join(fig_dir,
                                       f"{pde}_frequency_res{res}.png"))
        if sweep["frequency_data"]:
            # reference's combined multi-resolution overlay
            # (utils/frequency_analysis_plot.py:9-129)
            P.plot_frequency_analysis(
                sweep["frequency_data"], pde=pde,
                current_res=common.eval_train_res(cfg),
                save_dir=fig_dir)
        if (spatial_ndim == 2
                and cfg.dataset.get("evaluation_type") == "use_resize"
                and sweep["plot_data"]):
            base = max(sweep["plot_data"])
            x0 = sweep["plot_data"][base]["inputs"][:1, :1]
            for res in sorted(results):
                if res != base:
                    P.analyze_resize_frequencies(x0, base, res,
                                                 save_dir=fig_dir)
        print(f"Figures written to {fig_dir}")

    # --- autoregressive rollout (autoregressive_step) ---
    # The reference's rollout is 1D-only (main_2d.py has none; its
    # evaluate_1d_rollout_all_resolution is wired to main_1d only); ours
    # runs wherever the dataset carries rollout trajectories — the 2D
    # factories do (ns_markov_dataset rollout slot), so NS configs with
    # rollout_steps > 0 get the same lax.scan rollout sweep.
    rollout_results = {}
    if (bundle["rollout"] is not None
            and cfg.dataset.get("rollout_steps", 0) > 0):
        rollout_per_step = {}
        rollout_results = evaluate_rollout_all_resolutions(
            model, variables,
            common.make_rollout_builder(cfg, bundle["rollout"]),
            current_res=common.eval_train_res(cfg),
            max_test_resolution=cfg.dataset.get("max_test_resolution"),
            rollout_steps=cfg.dataset.get("rollout_steps", 16),
            x_normalizer=bundle["x_normalizer"],
            y_normalizer=bundle["y_normalizer"],
            batch_size=batch_size,
            # sliding-window (S4) datasets roll out by window shifting;
            # Markov configs' vestigial window_size key must not trigger it
            window_size=common.rollout_window_size(cfg),
            per_step_out=rollout_per_step,
            # fixed-size (CNO) models roll out off-train-res via the
            # per-step resize round-trip (rollout.py perform_rollout);
            # resolution-flexible models keep naive feedback (reference)
            resize_to_train=common.rollout_resize_to_train(cfg),
            spatial_ndim=spatial_ndim,
        )
        logger.log_table(
            "rollout", ["resolution", "rollout_rel_l2"],
            [(r, v) for r, v in sorted(rollout_results.items())])
        # per-step error curves, the reference's rollout CSV content
        # (autoregressive_step.py:415)
        for r, curve in sorted(rollout_per_step.items()):
            logger.log_table(
                f"rollout_steps_res{r}", ["step", "rel_l2"],
                [(s + 1, v) for s, v in enumerate(curve)])
        for r, v in sorted(rollout_results.items()):
            print(f"Rollout @ {r:4d}: rel-L2 {v:.6f}")

    logger.finish()
    dp = cfg.dataset.dataset_params
    devs = jax.devices()
    return {
        "test_loss": test_loss,
        "super_resolution": results,
        "rollout": rollout_results,
        "checkpoint": ckpt_path,
        "history": history,
        "n_params": int(n_params),
        "train_seconds": train_seconds,
        # run provenance for the sweep tables (VERDICT r3 weak #2): a
        # 1-epoch CPU rehearsal must be distinguishable from a chip result
        "provenance": {
            "platform": f"{jax.default_backend()}"
                        f"({devs[0].device_kind})" if devs
                        else jax.default_backend(),
            "epochs": int(cfg.training.get("epochs", 0)),
            "dataset": str(dp.get("filename")
                           or dp.get("filename_pattern")
                           or dp.get("saved_folder") or ""),
            # stamped at LEG RUN time, not table-write time: code can
            # change between legs of a long family sweep
            "git_sha": _leg_git_sha(),
        },
    }


def _leg_git_sha() -> str:
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        r = subprocess.run(["git", "-C", repo, "rev-parse", "--short",
                            "HEAD"], capture_output=True, timeout=10)
        return r.stdout.decode().strip() if r.returncode == 0 else ""
    except Exception:
        return ""


if __name__ == "__main__":
    main()
