"""Plotting/export and GNOT-utility tests."""

import os

import numpy as np

from resolution_pde_tpu.utils.plotting import (
    plot_1d_predictions,
    plot_2d_predictions,
    plot_super_resolution,
    plot_frequency_decomposition,
    plot_rollout,
    save_results_csv,
)
from resolution_pde_tpu.utils.gnot import (
    MultipleTensors,
    weighted_lp_rel_loss,
    weighted_lp_loss,
    UnitTransformer,
    PointWiseUnitTransformer,
)
from resolution_pde_tpu.utils.metrics import MetricsLogger


def test_plots_write_files(tmp_path, rng):
    p = rng.standard_normal((4, 1, 32)).astype(np.float32)
    t = rng.standard_normal((4, 1, 32)).astype(np.float32)
    f1 = plot_1d_predictions(p, t, save_path=str(tmp_path / "p1.png"))
    assert os.path.exists(f1)

    p2 = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    f2 = plot_2d_predictions(p2, p2, save_path=str(tmp_path / "p2.png"))
    assert os.path.exists(f2)

    f3 = plot_super_resolution({32: 0.1, 64: 0.05, 128: 0.2},
                               save_path=str(tmp_path / "sr.png"),
                               train_res=64)
    assert os.path.exists(f3)

    f4 = plot_frequency_decomposition(
        np.abs(rng.standard_normal(17)), np.abs(rng.standard_normal(17)),
        np.linspace(0, 0.5, 17), save_path=str(tmp_path / "freq.png"))
    assert os.path.exists(f4)

    traj = rng.standard_normal((6, 32)).astype(np.float32)
    f5 = plot_rollout(traj, traj + 0.1, save_path=str(tmp_path / "ro.png"))
    assert os.path.exists(f5)

    f6 = save_results_csv({32: 0.1, 64: 0.2}, str(tmp_path / "r.csv"),
                          columns=("resolution", "rel_l2"))
    assert open(f6).read().startswith("resolution,rel_l2")


def test_metrics_logger_csv(tmp_path):
    logger = MetricsLogger("proj", run_name="t", out_dir=str(tmp_path),
                           config={"a": 1}, use_wandb=False)
    logger.log({"loss": 0.5}, step=0)
    logger.log({"loss": 0.25}, step=1)
    table = logger.log_table("sweep", ["res", "err"], [(32, 0.1)])
    path = logger.finish()
    assert os.path.exists(path)
    assert os.path.exists(table)
    assert "loss" in open(path).read()


def test_gnot_losses(rng):
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((4, 10, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, 10, 2)), jnp.float32)
    rel = float(weighted_lp_rel_loss(x, y))
    ab = float(weighted_lp_loss(x, y))
    assert np.isfinite(rel) and rel > 0
    assert np.isfinite(ab) and ab > 0
    assert float(weighted_lp_rel_loss(y, y)) < 1e-6


def test_gnot_transformers(rng):
    x = rng.standard_normal((50, 10, 3)).astype(np.float32) * 2 + 1
    ut = UnitTransformer.fit(x)
    enc = np.asarray(ut.encode(x))
    assert abs(enc.reshape(-1, 3).mean(0)).max() < 1e-5
    np.testing.assert_allclose(np.asarray(ut.decode(ut.encode(x))), x,
                               rtol=1e-5, atol=1e-5)
    pt = PointWiseUnitTransformer.fit(x)
    np.testing.assert_allclose(np.asarray(pt.decode(pt.encode(x))), x,
                               rtol=1e-5, atol=1e-5)
    mt = MultipleTensors([x, x[:2]])
    assert len(mt) == 2 and mt[1].shape[0] == 2


def test_frequency_analysis_overlay(tmp_path, rng):
    """Combined multi-resolution frequency figure writes one file from the
    finalized decomposition dict (frequency_analysis_plot.py:9-129)."""
    from resolution_pde_tpu.utils.plotting import plot_frequency_analysis

    fd = {}
    for res in (32, 64):
        n = res // 2 + 1
        fd[res] = (np.abs(rng.standard_normal(n)) + 1e-3,
                   np.abs(rng.standard_normal(n)) + 1e-3,
                   np.arange(n, dtype=np.float64) / res)
    path = plot_frequency_analysis(fd, pde="ks", current_res=64,
                                   save_dir=str(tmp_path / "figs"))
    assert path is not None and os.path.exists(path)


def test_trace_decomp_stage_map():
    """stage_map_from_compiled extracts {hlo op -> stage} from optimized
    HLO op_name metadata (utils/trace_decomp.py — the bench's in-program
    step decomposition; named scopes specconv/ffstack ride the metadata)."""
    from resolution_pde_tpu.utils.trace_decomp import (
        classify_path, stage_map_from_compiled)

    hlo = '''
  %fusion.351 = bf16[64]{0} fusion(...), metadata={op_name="jit(train_step)/jvp(FFNO2D)/specconv/dot_general" source_file="x.py"}
  %custom-call.7 = f32[8]{0} custom-call(...), metadata={op_name="jit(train_step)/transpose(jvp(FFNO2D))/ffstack/pallas_call" source_file="y.py"}
  %copy.448 = f32[2]{0} copy(...), metadata={op_name="jit(train_step)/convert_element_type"}
  %add.1 = f32[2]{0} add(...)
'''
    m = stage_map_from_compiled(hlo)
    assert m["fusion.351"] == "spectral"
    assert m["custom-call.7"] == "ff"
    assert m["copy.448"] == "other"
    assert "add.1" not in m  # no metadata -> defaults to other at lookup
    assert classify_path("a/specconv/b") == "spectral"
    assert classify_path("a/ffstack/b") == "ff"
    assert classify_path("a/b") == "other"
