"""Shared driver logic for the CLI entry points.

Reproduces the reference pipeline (main_1d.py:33-310 / main_2d.py:37-325):
dataset factory -> (grouped) loaders -> model -> AdamW + scheduler ->
train/evaluate -> checkpoint -> super-resolution eval -> rollout eval ->
summary tables.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from resolution_pde_tpu.configs import (
    Config,
    instantiate_dataset,
    instantiate_model,
)
from resolution_pde_tpu.data.loader import (
    Loader,
    ResolutionBucketedLoader,
)
from resolution_pde_tpu.data.dataset import MultiResDataset
from resolution_pde_tpu.train import Trainer
from resolution_pde_tpu.train.schedules import get_schedule
from resolution_pde_tpu.utils.metrics import MetricsLogger


def unpack_data(data, normalization_type: str):
    """Split the factory tuple (main_1d.py:70-83 semantics)."""
    train, val, test, rollout = data[:4]
    out = {"train": train, "val": val, "test": test, "rollout": rollout}
    if normalization_type == "minmax":
        out.update(dict(zip(
            ("min_data", "max_data", "min_model", "max_model"), data[4:8])))
        # minmax eval uses denormalize_data(x*(max-min)+min)
        # (train/training.py:90-91, 116-124) == MinMaxNormalizer.decode
        from resolution_pde_tpu.data.dataset import MinMaxNormalizer

        out["x_normalizer"] = MinMaxNormalizer(out["min_data"],
                                               out["max_data"])
        out["y_normalizer"] = MinMaxNormalizer(out["min_model"],
                                               out["max_model"])
    else:
        out["x_normalizer"], out["y_normalizer"] = data[4:6]
    return out


def build_loaders(bundle, batch_size: int, train_mres: bool, seed: int = 0):
    if train_mres or isinstance(bundle["train"], MultiResDataset):
        return (
            ResolutionBucketedLoader(bundle["train"], batch_size,
                                     shuffle=True, seed=seed),
            ResolutionBucketedLoader(bundle["val"], batch_size, shuffle=False),
            ResolutionBucketedLoader(bundle["test"], batch_size,
                                     shuffle=False),
        )
    return (
        Loader(bundle["train"], batch_size, shuffle=True, seed=seed),
        Loader(bundle["val"], batch_size, shuffle=False),
        Loader(bundle["test"], batch_size, shuffle=False),
    )


def sample_input(bundle):
    ds = bundle["train"]
    if isinstance(ds, MultiResDataset):
        first = ds.buckets[ds.resolutions[0]]
        return first.x[:2]
    return ds.x[:2]


def build_model(cfg: Config):
    extra = {}
    target = cfg.model.get("_target_", "")
    if "CNO" in target and "size" not in cfg.model:
        extra["size"] = cfg.dataset.get("cno_train_size",
                                        cfg.dataset.get("original_res"))
    return instantiate_model(cfg.model, **extra)


def build_trainer(cfg: Config, model, y_normalizer, mesh=None) -> Trainer:
    tr = cfg.training
    is_s4 = "s4" in cfg.model.get("_target_", "").lower()
    return Trainer(
        model,
        learning_rate=tr.get("learning_rate", 1e-3),
        weight_decay=tr.get("weight_decay", 1e-4),
        use_normalizer=tr.get("use_normalizer", False),
        y_normalizer=y_normalizer,
        ssm_lr=1e-3 if is_s4 else None,
        mesh=mesh,
        seed=tr.get("seed", 0),
    )


def build_schedule(cfg: Config):
    tr = cfg.training
    return get_schedule(
        tr.get("scheduler", "cosine"),
        tr.get("learning_rate", 1e-3),
        tr.get("epochs", 100),
        t_max=tr.get("t_max", 100),
        eta_min=tr.get("eta_min", 1e-5),
        step_size=tr.get("step_size", 30),
        gamma=tr.get("gamma", 0.5),
    )


def eval_dataset_params(cfg: Config) -> dict:
    """Parameters for re-instantiating the test dataset at eval resolutions
    (naive_utils.py:69-93: swap _target_ to eval_dataset_target, use
    eval_filename/eval_saved_folder when given, data_normalizer=False)."""
    params = dict(cfg.dataset.dataset_params)
    ds = cfg.dataset
    if "eval_dataset_target" in ds:
        params["_target_"] = ds["eval_dataset_target"]
        # multires factory kwargs don't apply to the plain factory
        for k in ("data_mres_size", "add_res", "add_res_samples",
                  "downsample_from_res", "viscosity", "L", "lmax", "et",
                  "nte", "nt", "train_s", "file_map"):
            params.pop(k, None)
    if "eval_filename" in ds:
        params["filename"] = ds["eval_filename"]
    if "eval_saved_folder" in ds:
        params["saved_folder"] = ds["eval_saved_folder"]
    params["data_normalizer"] = False
    return params


def make_superres_builder(cfg: Config):
    """dataset_builder(res) -> raw test ArrayDataset at that resolution."""
    base = eval_dataset_params(cfg)
    original_res = cfg.dataset.get("original_res")
    use_resize = cfg.dataset.get("evaluation_type") == "use_resize"

    def builder(res: int):
        params = dict(base)
        if use_resize:
            params["s"] = res
            params["reduced_resolution"] = 1
        else:
            params["reduced_resolution"] = max(original_res // res, 1)
        out = instantiate_dataset(params)
        return out[2]  # raw test split

    return builder


def make_rollout_builder(cfg: Config):
    base = eval_dataset_params(cfg)
    original_res = cfg.dataset.get("original_res")
    use_resize = cfg.dataset.get("evaluation_type") == "use_resize"

    def builder(res: int):
        params = dict(base)
        if use_resize:
            params["s"] = res
            params["reduced_resolution"] = 1
        else:
            params["reduced_resolution"] = max(original_res // res, 1)
        out = instantiate_dataset(params)
        return out[3]  # rollout trajectory dataset

    return builder


def save_run_checkpoint(cfg: Config, state, history) -> str:
    from resolution_pde_tpu.train.checkpoint import save_checkpoint

    model_type = cfg.model.get("_target_", "model").rsplit(".", 1)[-1].lower()
    job_id = os.environ.get("SLURM_JOB_ID", "local")
    path = os.path.join(cfg.get("checkpoint_dir", "checkpoints"), model_type,
                        f"{cfg.dataset.get('pde', 'pde')}_{job_id}")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_checkpoint(path, state, history={
        "train_loss": history.train_loss,
        "val_loss": history.val_loss,
        "lr": history.lr,
    })
    return path


def maybe_warm_start(cfg: Config, trainer, state):
    ckpt = cfg.dataset.get("saved_checkpoint_path")
    if not ckpt:
        return state
    from resolution_pde_tpu.train.checkpoint import restore_checkpoint

    state, _ = restore_checkpoint(ckpt, state)
    print(f"Loaded model checkpoint: {ckpt}")
    return state
