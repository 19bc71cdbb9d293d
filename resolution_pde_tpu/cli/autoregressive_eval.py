"""Rollout evaluation driver (reference autoregressive_eval.py:31-223):
load a checkpoint, re-run teacher-forcing eval + rollout eval at all
resolutions.

    python -m resolution_pde_tpu.cli.autoregressive_eval model=ffno_1d \\
        dataset=ks_naive dataset.saved_checkpoint_path=checkpoints/...
"""

from __future__ import annotations

import sys

from resolution_pde_tpu.configs import parse_cli, instantiate_dataset
from resolution_pde_tpu.cli import common
from resolution_pde_tpu.evaluation import (
    evaluate_all_resolutions,
    evaluate_rollout_all_resolutions,
)
from resolution_pde_tpu.utils.metrics import MetricsLogger


def main(argv=None):
    from resolution_pde_tpu.utils.jax_cache import enable_compile_cache
    enable_compile_cache()  # cold compiles can exceed 10 min on this backend
    cfg = parse_cli(argv if argv is not None else sys.argv[1:])
    norm_type = cfg.dataset.dataset_params.get("normalization_type", "simple")

    data = instantiate_dataset(cfg.dataset.dataset_params)
    bundle = common.unpack_data(data, norm_type)

    model = common.build_model(cfg)
    trainer = common.build_trainer(cfg, model, bundle["y_normalizer"])
    state = trainer.init(common.sample_input(bundle))
    state = common.maybe_warm_start(cfg, trainer, state)  # checkpoint load

    variables = {"params": state.params, **state.model_state}
    batch_size = cfg.training.get("batch_size", 16)
    logger = MetricsLogger(cfg.project_name + "_rollout", config=cfg,
                           use_wandb=cfg.get("log_to_wandb", False))

    sweep = evaluate_all_resolutions(
        model, variables, common.make_superres_builder(cfg),
        current_res=common.eval_train_res(cfg),
        max_test_resolution=cfg.dataset.get("max_test_resolution"),
        x_normalizer=bundle["x_normalizer"],
        y_normalizer=bundle["y_normalizer"],
        batch_size=batch_size,
    )
    per_step = {}
    rollout = evaluate_rollout_all_resolutions(
        model, variables,
        common.make_rollout_builder(cfg, bundle["rollout"]),
        current_res=common.eval_train_res(cfg),
        max_test_resolution=cfg.dataset.get("max_test_resolution"),
        rollout_steps=cfg.dataset.get("rollout_steps", 16),
        x_normalizer=bundle["x_normalizer"],
        y_normalizer=bundle["y_normalizer"],
        batch_size=batch_size,
        window_size=common.rollout_window_size(cfg),
        per_step_out=per_step,
        # fixed-size (CNO) models roll out off-train-res via the per-step
        # resize round-trip (rollout.py perform_rollout)
        resize_to_train=common.rollout_resize_to_train(cfg),
    )
    logger.log_table("teacher_forcing", ["resolution", "rel_l2"],
                     sorted(sweep["results"].items()))
    logger.log_table("rollout", ["resolution", "rollout_rel_l2"],
                     sorted(rollout.items()))
    for r, curve in sorted(per_step.items()):
        # the reference's per-step rollout CSV (autoregressive_step.py:415)
        logger.log_table(f"rollout_steps_res{r}", ["step", "rel_l2"],
                         [(s + 1, v) for s, v in enumerate(curve)])
    logger.finish()
    for r in sorted(rollout):
        print(f"res {r:4d}: teacher-forcing {sweep['results'][r]:.6f} "
              f"rollout {rollout[r]:.6f}")
    return {"teacher_forcing": sweep["results"], "rollout": rollout,
            "rollout_per_step": per_step}


if __name__ == "__main__":
    main()
