"""Data-generation tests: GRF statistics/parity, NS solver physics
(conservation/decay sanity + parity vs an independent torch reimplementation
of the reference stepping), KS/Burgers solver sanity, writer round-trips."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resolution_pde_tpu.datagen import (
    GaussianRF,
    navier_stokes_2d,
    solve_ks,
    solve_burgers,
    write_ks_file,
    write_pdebench_file,
    write_ns_file,
)
from resolution_pde_tpu.datagen.ks import random_ks_initial_conditions


def test_grf_matches_torch_legacy_ifft(rng):
    """Given identical spectral coefficients, the sampler must equal the
    legacy unnormalized inverse DFT (random_fields.py:52-61)."""
    size, alpha, tau = 32, 2.5, 7.0
    grf = GaussianRF(2, size, alpha=alpha, tau=tau)
    coeff_r = rng.standard_normal((1, size, size)).astype(np.float32)
    coeff_i = rng.standard_normal((1, size, size)).astype(np.float32)
    sq = np.asarray(grf.sqrt_eig)
    c = (sq * coeff_r) + 1j * (sq * coeff_i)
    # legacy torch.ifft(normalized=False) == numpy default ifft
    expected = np.real(np.fft.ifft2(c, axes=(1, 2)))
    got = np.real(np.asarray(jnp.fft.ifftn(jnp.asarray(c), axes=(1, 2))))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_grf_sample_statistics():
    grf = GaussianRF(2, 64, alpha=2.5, tau=7.0)
    u = np.asarray(grf.sample(jax.random.key(0), 16))
    assert u.shape == (16, 64, 64)
    assert abs(u.mean()) < 0.2  # zero-mean field (DC mode zeroed)
    assert 0.1 < u.std() < 10.0


def _torch_ns_steps(w0, f, visc, delta_t, n_steps):
    """Independent torch reimplementation of the reference's CN stepping
    (ns_2d.py:69-112) using modern complex FFT."""
    import torch

    w = torch.from_numpy(w0)
    fr = torch.from_numpy(f)
    n = w0.shape[-1]
    k_max = n // 2
    k = torch.cat([torch.arange(0, k_max), torch.arange(-k_max, 0)])
    k_y = k[None, :].repeat(n, 1).float()
    k_x = k_y.T
    lap = 4 * np.pi ** 2 * (k_x ** 2 + k_y ** 2)
    lap[0, 0] = 1.0
    dealias = ((k_y.abs() <= 2 / 3 * k_max)
               & (k_x.abs() <= 2 / 3 * k_max)).float()
    w_h = torch.fft.fft2(w)
    f_h = torch.fft.fft2(fr)[None]
    for _ in range(n_steps):
        psi_h = w_h / lap
        q = torch.fft.ifft2(2j * np.pi * k_y * psi_h).real
        v = torch.fft.ifft2(-2j * np.pi * k_x * psi_h).real
        w_x = torch.fft.ifft2(2j * np.pi * k_x * w_h).real
        w_y = torch.fft.ifft2(2j * np.pi * k_y * w_h).real
        F_h = torch.fft.fft2(q * w_x + v * w_y) * dealias
        w_h = ((-delta_t * F_h + delta_t * f_h
                + (1 - 0.5 * delta_t * visc * lap) * w_h)
               / (1 + 0.5 * delta_t * visc * lap))
    return torch.fft.ifft2(w_h).real.numpy()


def test_ns_solver_parity_with_reference_stepping(rng):
    n, steps, visc, dt = 32, 10, 1e-3, 1e-3
    grf = GaussianRF(2, n, alpha=2.5, tau=7.0)
    w0 = np.asarray(grf.sample(jax.random.key(1), 2), np.float32)
    t = np.linspace(0, 1, n + 1)[:-1]
    X, Y = np.meshgrid(t, t, indexing="ij")
    f = (0.1 * (np.sin(2 * np.pi * (X + Y))
                + np.cos(2 * np.pi * (X + Y)))).astype(np.float32)
    expected = _torch_ns_steps(w0, f, visc, dt, steps)
    sol, sol_t = navier_stokes_2d(jnp.asarray(w0), jnp.asarray(f), visc,
                                  T=steps * dt, delta_t=dt, record_steps=1)
    got = np.asarray(sol[..., 0])
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-4)
    assert sol_t.shape == (1,)


def test_ns_solver_viscous_decay():
    """Unforced flow must lose enstrophy under viscosity."""
    n = 32
    grf = GaussianRF(2, n, alpha=2.5, tau=7.0)
    w0 = grf.sample(jax.random.key(2), 1)
    f = jnp.zeros((n, n))
    sol, _ = navier_stokes_2d(w0, f, visc=1e-2, T=0.5, delta_t=1e-3,
                              record_steps=4)
    energy = [float(jnp.sum(sol[..., i] ** 2)) for i in range(4)]
    assert energy[-1] < energy[0]


def test_ks_solver_runs_and_is_chaotic_but_bounded():
    key = jax.random.key(0)
    u0 = random_ks_initial_conditions(key, 2, 128, L=64.0, lmax=8)
    traj = solve_ks(u0, L=64.0, dt=0.05, n_snapshots=21,
                    steps_per_snapshot=20)
    t = np.asarray(traj)
    assert t.shape == (2, 21, 128)
    assert np.isfinite(t).all()
    # KS is bounded: amplitudes remain O(1..10)
    assert np.abs(t).max() < 50
    # and non-trivial: the field evolves
    assert np.abs(t[:, -1] - t[:, 0]).max() > 0.1


def test_burgers_solver_dissipates_and_matches_heat_limit():
    """With zero initial amplitude in the nonlinear regime (small u0) the
    solution approaches the heat equation: mode decay ~ exp(-nu k^2 t)."""
    n, nu = 64, 0.05
    x = np.arange(n) / n
    u0 = (0.01 * np.sin(2 * np.pi * x)).astype(np.float32)[None]
    dt, spn, snaps = 1e-4, 1000, 3
    traj = np.asarray(solve_burgers(jnp.asarray(u0), nu=nu, dt=dt,
                                    n_snapshots=snaps,
                                    steps_per_snapshot=spn))
    t_final = dt * spn * (snaps - 1)
    k1 = 2 * np.pi
    expected = 0.01 * np.exp(-nu * k1 ** 2 * t_final) * np.sin(2 * np.pi * x)
    # atol covers the (small-amplitude) nonlinear correction excluded from
    # the linear heat-decay reference
    np.testing.assert_allclose(traj[0, -1], expected, atol=5e-5)


def test_writers_roundtrip(tmp_path, rng):
    from resolution_pde_tpu.data.io import (
        read_ks_h5, read_pdebench_h5, read_ns)

    u1 = rng.standard_normal((4, 6, 32)).astype(np.float32)
    write_ks_file(str(tmp_path / "KS_train_4.h5"), u1)
    back = read_ks_h5(str(tmp_path / "KS_train_4.h5"))
    np.testing.assert_allclose(back["u"], u1)

    write_pdebench_file(str(tmp_path / "burgers.h5"), u1)
    np.testing.assert_allclose(
        read_pdebench_h5(str(tmp_path / "burgers.h5"))["u"], u1)

    u2 = rng.standard_normal((3, 16, 16, 5)).astype(np.float32)  # (n,h,w,t)
    write_ns_file(str(tmp_path / "ns.h5"), u2)
    back2 = read_ns(str(tmp_path / "ns.h5"))
    np.testing.assert_allclose(back2, np.transpose(u2, (0, 3, 1, 2)))


def test_generated_ks_feeds_data_pipeline(tmp_path):
    """End-to-end self-sufficiency: generate KS data, write files, load
    through the standard factory."""
    from resolution_pde_tpu.data import ks_markov_dataset

    key = jax.random.key(3)
    for name, seed in (("KS_train_8.h5", 0), ("KS_valid.h5", 1),
                       ("KS_test.h5", 2)):
        u0 = random_ks_initial_conditions(jax.random.key(seed), 4, 64)
        traj = solve_ks(u0, n_snapshots=6, steps_per_snapshot=10)
        write_ks_file(str(tmp_path / name), np.asarray(traj))
    out = ks_markov_dataset("KS_train_8.h5", str(tmp_path),
                            val_filename="KS_valid.h5",
                            test_filename="KS_test.h5")
    train = out[0]
    assert len(train) == 4 * 5
    assert np.isfinite(train.x).all()


def test_generate_data_cli_ks_feeds_factories(tmp_path):
    """cli.generate_data writes BOTH the naive KS files and the
    true-multires tree in exactly the layouts the factories read
    (the run1.sh:146-192 data-generation surface)."""
    from resolution_pde_tpu.cli.generate_data import main as gen_main
    from resolution_pde_tpu.data.factories import (
        ks_markov_dataset, ks_true_multires_markov_dataset)

    out = str(tmp_path / "ks")
    gen_main([f"out={out}", "pde=ks", "n=10", "resolutions=[32,16]",
              "n_snapshots=4", "viscosity=0.05"])

    train, val, test, rollout, xn, yn = ks_markov_dataset(
        "KS_train_2048.h5", out)
    assert len(train) > 0 and train.x.shape[-1] == 32
    assert np.isfinite(train.x).all()

    # the tree dir name records the TRUE generation params (nte/nt from
    # n_snapshots) — the factory must be pointed at the same values
    out2 = ks_true_multires_markov_dataset(
        out, viscosity=0.05, nte=4, nt=4,
        data_mres_size={32: -1, 16: -1},
        downsample_from_res=32)
    mres_train = out2[0]
    assert sorted(mres_train.resolutions) == [16, 32]
    assert out2[3] is not None  # per-res rollout buckets
    assert sorted(out2[3].resolutions()) == [16, 32]

    # The EVAL-swap layout: ks_naive_true_mres1.yaml points
    # eval_saved_folder at a res dir, and ks_markov_dataset then needs
    # KS_valid.h5/KS_test.h5 THERE, not just the train file (caught live:
    # the eval sweep 404'd on KS_valid.h5 before the tree wrote splits).
    res_dir = os.path.join(out, "res_32",
                           "visc_0.05_L64.0_lmax8_et5.0_nte4_nt4")
    ev_train, _, ev_test, ev_roll, _, _ = ks_markov_dataset(
        "KS_train_2048.h5", res_dir)
    assert len(ev_test) > 0 and len(ev_roll) > 0
    # held-out split: eval test trajectories appear in NO train file
    assert len(ev_train) + len(ev_test) < 10 * 3  # strict subset per split


def test_generate_data_cli_ns_feeds_factory(tmp_path):
    from resolution_pde_tpu.cli.generate_data import main as gen_main
    from resolution_pde_tpu.data.factories import ns_markov_dataset

    out = str(tmp_path / "ns")
    gen_main([f"out={out}", "pde=ns", "n=6", "resolutions=[16]",
              "n_snapshots=3", "viscosity=1e-3"])
    train = ns_markov_dataset("ns_16_1e-3.h5", out)[0]
    assert len(train) > 0 and train.x.shape[-1] == 16
    assert np.isfinite(train.x).all()


def test_generate_data_cli_active_feeds_factory(tmp_path):
    """pde=active writes The-Well multi-file layout consumed by the
    ns_active_t* ladder's factory (minmax 8-tuple, time stride)."""
    from resolution_pde_tpu.cli.generate_data import main as gen_main
    from resolution_pde_tpu.data.factories import (
        multi_file_active_matter_markov_dataset)

    out = str(tmp_path / "well" / "active_matter" / "train")
    gen_main([f"out={out}", "pde=active", "n=6", "resolutions=[16]",
              "n_snapshots=5", "seed=3"])
    res = multi_file_active_matter_markov_dataset(
        "active_matter_*.hdf5", out, reduced_resolution_t=2)
    train, rollout = res[0], res[3]
    assert len(train) > 0 and train.x.shape[1:] == (1, 16, 16)
    assert np.isfinite(train.x).all()
    assert rollout is not None
    mn_d, mx_d = res[4], res[5]
    assert mn_d < mx_d


def test_generate_data_cli_burgers_feeds_factory(tmp_path):
    from resolution_pde_tpu.cli.generate_data import main as gen_main
    from resolution_pde_tpu.data.factories import burger_markov_dataset

    out = str(tmp_path / "burgers")
    gen_main([f"out={out}", "pde=burgers", "n=8", "resolutions=[32]",
              "n_snapshots=4", "viscosity=0.001"])
    res = burger_markov_dataset("1D_Burgers_Sols_Nu0.001.hdf5", out,
                                normalization_type="simple")
    assert len(res[0]) > 0 and res[0].x.shape[-1] == 32


def test_generate_data_ks_marginal_resolution_stays_on_attractor(tmp_path):
    """visc=0.075 @128 passes the weak 'a damped mode exists' criterion yet
    blows up when solved natively (measured max|u| 488 -> NaN in the first
    baseline-data generation); the generator must solve resolved and
    truncate, and the written data must be finite and attractor-sized."""
    import h5py
    from resolution_pde_tpu.cli.generate_data import main as gen_main

    out = str(tmp_path / "ks")
    gen_main([f"out={out}", "pde=ks", "n=4", "resolutions=[128]",
              "n_snapshots=4", "viscosity=0.075", "seed=3"])
    path = os.path.join(out, "KS_train_2048.h5")
    with h5py.File(path) as f:
        key = next(k for k in f["train"] if k.startswith("pde"))
        u = np.asarray(f["train"][key])
    assert np.isfinite(u).all()
    # resolved KS at visc v has max|u| ~ 3/sqrt(v) (~11 here); 488 was the
    # runaway signature
    assert np.abs(u).max() < 10.0 / np.sqrt(0.075)


def test_generate_data_ks_viscosity_and_splits(tmp_path):
    """The viscosity knob reaches the solver (different physics per value)
    and splits=... controls the naive train/valid/test file sizes."""
    import h5py
    from resolution_pde_tpu.cli.generate_data import main as gen_main

    def train_arr(out):
        with h5py.File(os.path.join(out, "KS_train_2048.h5"), "r") as f:
            g = f["train"]
            key = next(k for k in g.keys() if k.startswith("pde"))
            return np.asarray(g[key])

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    common = ["pde=ks", "n=8", "resolutions=[32]", "n_snapshots=3",
              "seed=0", "splits=[0.5,0.25,0.25]"]
    gen_main([f"out={out_a}", "viscosity=1.0"] + common)
    gen_main([f"out={out_b}", "viscosity=2.0"] + common)

    a, b = train_arr(out_a), train_arr(out_b)
    assert a.shape == b.shape
    assert not np.allclose(a, b), "viscosity did not reach the solver"

    # splits=[0.5,0.25,0.25] at n=8 -> 4/2/2 trajectories
    def n_traj(out, name, split):
        with h5py.File(os.path.join(out, name), "r") as f:
            g = f[split]
            key = next(k for k in g.keys() if k.startswith("pde"))
            return g[key].shape[0]

    assert n_traj(out_a, "KS_train_2048.h5", "train") == 4
    assert n_traj(out_a, "KS_valid.h5", "valid") == 2
    assert n_traj(out_a, "KS_test.h5", "test") == 2


def test_generate_data_rejects_ks_only_options_for_other_pdes():
    """splits/et/lmax only reach the KS generator; passing them with
    pde=burgers must refuse rather than silently generate with defaults."""
    import pytest

    from resolution_pde_tpu.cli.generate_data import _parse

    with pytest.raises(SystemExit, match="only apply"):
        _parse(["pde=burgers", "et=5.0"])
    with pytest.raises(SystemExit, match="only apply"):
        _parse(["pde=ns", "splits=[0.5,0.25,0.25]"])
    # ks keeps accepting them
    opts = _parse(["pde=ks", "et=7.0", "lmax=4"])
    assert opts["et"] == 7.0 and opts["lmax"] == 4


def test_generate_data_ks_markov_pairs_are_learnable(tmp_path):
    """Regression for the decorrelated-snapshot bug: generate_data must
    follow the reference's LPSDA convention (run1.sh:146-163 — smooth
    sum-of-sines ICs from t=0, NO burn-in, snapshots every et/(nt-1) time
    units). The old attractor-sampled 2.0-unit spacing produced
    consecutive frames with corr ~0.01 at visc=0.075, an unlearnable
    Markov task (observed: FFNO plateaued at rel-L2 ~0.7 on TPU)."""
    import h5py
    from resolution_pde_tpu.cli.generate_data import main as gen_main

    out = str(tmp_path / "ks")
    gen_main(["pde=ks", f"out={out}", "n=6", "resolutions=[64]",
              "n_snapshots=11", "et=1.0", "seed=3"])
    with h5py.File(os.path.join(out, "KS_train_2048.h5"), "r") as f:
        g = f["train"]
        key = next(k for k in g.keys() if k.startswith("pde"))
        u = np.asarray(g[key])
        dt = float(np.asarray(g["dt"]))
    assert abs(dt - 0.1) < 1e-6  # et/(nt-1) snapshot spacing recorded
    a, b = u[:, :-1], u[:, 1:]
    corr = ((a * b).sum(-1)
            / np.sqrt((a * a).sum(-1) * (b * b).sum(-1) + 1e-12))
    assert corr.mean() > 0.8, f"consecutive snapshots decorrelated: " \
                              f"{corr.mean():.3f}"
    ident = (np.linalg.norm(b - a, axis=-1)
             / (np.linalg.norm(b, axis=-1) + 1e-12))
    assert ident.mean() < 0.7, f"identity-map rel-L2 {ident.mean():.3f}"


def test_ks_long_run_stays_on_attractor():
    """Regression for the kursiv.m conjugate-symmetry runaway: full-spectrum
    stepping with real(ifft(.)) nonlinearity diverges at t ~ 150 (the
    conjugate-asymmetric roundoff component grows at the bare linear rate
    1/(4 visc)); the rfft half-spectrum formulation must stay on the
    bounded KS attractor for arbitrarily long runs."""
    L = 32 * np.pi
    x = np.linspace(0, L, 128, endpoint=False)
    u0 = jnp.asarray(np.cos(x / 16) * (1 + np.sin(x / 16)),
                     jnp.float32)[None]
    t = np.asarray(solve_ks(u0, L=L, visc=1.0, dt=0.25, n_snapshots=13,
                            steps_per_snapshot=200))  # T = 600
    assert np.isfinite(t).all()
    assert np.abs(t).max() < 10.0  # attractor amplitude ~3
    # still chaotic, not decayed
    assert np.abs(t[0, -1]).max() > 0.5


def test_darcy_solver_satisfies_pde():
    """The CG solution satisfies the discrete operator equation: applying
    -div(a grad .) to u recovers the constant forcing beta on every cell
    (the same stencil; residual bounds the linear-solve error), and a
    constant-coefficient solve matches the classic Poisson reference
    value at the domain center."""
    from resolution_pde_tpu.datagen.darcy import (_apply_operator,
                                                  generate_darcy_dataset,
                                                  solve_darcy)

    key = jax.random.key(0)
    a, u = generate_darcy_dataset(key, 2, s=48, beta=1.0)
    assert a.shape == (2, 48, 48) and u.shape == (2, 48, 48)
    assert set(np.unique(a)) == {3.0, 12.0}
    for i in range(2):
        res = np.asarray(_apply_operator(jnp.asarray(a[i]),
                                         jnp.asarray(u[i]))) - 1.0
        # relative residual of the linear solve
        assert np.abs(res).max() < 1e-2, np.abs(res).max()

    # constant a=1: -lap u = 1 on the unit square with u=0 boundary has
    # u(center) = 0.07367... (standard series value)
    ones = np.ones((1, 64, 64), np.float32)
    up = np.asarray(solve_darcy(ones, beta=1.0))[0]
    assert abs(up[32, 32] - 0.073671) < 2e-3, up[32, 32]
    # symmetric and positive
    np.testing.assert_allclose(up, up.T, atol=1e-4)
    assert up.min() >= 0


def test_generate_data_cli_darcy_feeds_factory(tmp_path):
    """pde=darcy materializes the PDEBench layout the darcy factory
    reads; FNO2d trains on it through the standard pipeline config."""
    from resolution_pde_tpu.cli.generate_data import main as gen
    from resolution_pde_tpu.configs import instantiate_dataset, load_config

    out = str(tmp_path / "darcy")
    gen([f"out={out}", "pde=darcy", "n=6", "resolutions=[32]"])
    assert os.path.isfile(os.path.join(out, "darcy_flow_beta_0.01.hdf5"))
    assert os.path.isfile(os.path.join(out, "darcy_flow.h5"))

    cfg = load_config(model="fno_2d", dataset="darcy")
    data = instantiate_dataset(cfg.dataset.dataset_params,
                               saved_folder=out)
    train = data[0]
    assert train.x.shape[1:] == (1, 32, 32)
    assert np.isfinite(train.x).all() and np.isfinite(train.y).all()
    # coefficients are the thresholded pair, solutions are not constant
    assert train.y.std() > 0
