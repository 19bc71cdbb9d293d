"""Serving engine (deploy/serving.py): AOT-compiled bucketed inference must
match direct model.apply + the eval-path normalizer semantics exactly, and
bucket padding must never perturb real rows."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resolution_pde_tpu.deploy import ServingEngine
from resolution_pde_tpu.models import FFNO1D
from resolution_pde_tpu.ops.normalizers import SimpleNormalizer


@pytest.fixture(scope="module")
def served():
    model = FFNO1D(in_channels=1, out_channels=1, width=8, n_layers=2,
                   n_modes=6)
    x0 = jnp.zeros((2, 1, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x0)
    return model, variables


def test_predict_matches_direct_apply(served, rng):
    model, variables = served
    xn = SimpleNormalizer(np.float32(0.3), np.float32(1.7))
    yn = SimpleNormalizer(np.float32(-0.2), np.float32(2.1))
    eng = ServingEngine(model, variables, x_normalizer=xn, y_normalizer=yn)
    eng.warmup(spatial_shapes=[32], batch_sizes=[4])
    assert ("predict", (32,), 1, 4) in eng.buckets()

    x = rng.standard_normal((4, 1, 32)).astype(np.float32)
    got = eng.predict(x)
    expected = yn.decode(model.apply(
        variables, xn.encode(jnp.asarray(x)), deterministic=True))
    np.testing.assert_allclose(got, np.asarray(expected),
                               rtol=1e-6, atol=1e-6)


def test_bucket_padding_is_exact(served, rng):
    """B=3 request runs on the B=8 bucket; rows must match the unpadded
    run to f32 roundoff (padding is mathematically inert — per-sample
    independence in eval mode — but the two batch shapes compile to
    different XLA programs, so bit-identity is not guaranteed)."""
    model, variables = served
    eng = ServingEngine(model, variables)
    eng.warmup(spatial_shapes=[32], batch_sizes=[8])

    x = rng.standard_normal((3, 1, 32)).astype(np.float32)
    got = eng.predict(x)
    assert got.shape == (3, 1, 32)
    expected = np.asarray(model.apply(
        variables, jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, expected.astype(np.float32),
                               rtol=1e-6, atol=1e-7)
    # only the pre-compiled bucket exists — no on-demand compile happened
    assert eng.buckets() == [("predict", (32,), 1, 8)]


def test_multi_resolution_buckets(served, rng):
    """One engine serves several resolutions with one weight set (the
    effective-mode slicing contract)."""
    model, variables = served
    eng = ServingEngine(model, variables)
    eng.warmup(spatial_shapes=[16, 32, 64], batch_sizes=[2])
    for res in (16, 32, 64):
        x = rng.standard_normal((2, 1, res)).astype(np.float32)
        out = eng.predict(x)
        assert out.shape == (2, 1, res)
        assert np.isfinite(out).all()


def test_forecast_matches_rollout_eval(served, rng):
    """forecast() == evaluation.rollout.perform_rollout decoded, including
    the x/y-normalizer round-trip between steps."""
    from resolution_pde_tpu.evaluation.rollout import perform_rollout

    model, variables = served
    xn = SimpleNormalizer(np.float32(0.1), np.float32(1.3))
    yn = SimpleNormalizer(np.float32(0.4), np.float32(0.9))
    eng = ServingEngine(model, variables, x_normalizer=xn, y_normalizer=yn)
    steps = 5
    eng.warmup(spatial_shapes=[32], batch_sizes=[2], rollout_steps=[steps])

    x0 = rng.standard_normal((2, 1, 32)).astype(np.float32)
    got = eng.forecast(x0, steps)
    assert got.shape == (2, steps, 1, 32)

    ref_norm = perform_rollout(model, variables, xn.encode(jnp.asarray(x0)),
                               steps, x_normalizer=xn, y_normalizer=yn)
    expected = np.asarray(yn.decode(ref_norm))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_on_demand_compile_for_unseen_shape(served, rng):
    model, variables = served
    eng = ServingEngine(model, variables)
    x = rng.standard_normal((2, 1, 48)).astype(np.float32)
    out = eng.predict(x)  # no warmup: compiles an exact-size bucket
    assert out.shape == (2, 1, 48)
    assert ("predict", (48,), 1, 2) in eng.buckets()


def test_mesh_sharded_serving(served, rng):
    """Inputs shard over the data axis; output matches single-device."""
    from resolution_pde_tpu.parallel import make_mesh

    model, variables = served
    mesh = make_mesh({"data": 8})
    eng = ServingEngine(model, variables, mesh=mesh)
    eng.warmup(spatial_shapes=[32], batch_sizes=[8])
    ref = ServingEngine(model, variables)
    ref.warmup(spatial_shapes=[32], batch_sizes=[8])

    x = rng.standard_normal((8, 1, 32)).astype(np.float32)
    np.testing.assert_allclose(eng.predict(x), ref.predict(x),
                               rtol=1e-6, atol=1e-6)


def test_from_checkpoint_round_trip(served, rng, tmp_path):
    """Train-side checkpoint -> serving engine; predictions match the
    trained params."""
    from resolution_pde_tpu.train import Trainer
    from resolution_pde_tpu.train.checkpoint import save_checkpoint

    model, _ = served
    trainer = Trainer(model)
    x0 = jnp.asarray(rng.standard_normal((2, 1, 32)), jnp.float32)
    state = trainer.init(x0)
    save_checkpoint(str(tmp_path / "ckpt"), state)

    eng = ServingEngine.from_checkpoint(model, str(tmp_path / "ckpt"),
                                        np.zeros((1, 1, 32), np.float32))
    x = rng.standard_normal((2, 1, 32)).astype(np.float32)
    expected = np.asarray(model.apply(
        {"params": state.params}, x0, deterministic=True))
    got = eng.predict(np.asarray(x0))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)
    assert np.isfinite(eng.predict(x)).all()


def test_cost_summary_reports_buckets(served):
    model, variables = served
    eng = ServingEngine(model, variables)
    eng.warmup(spatial_shapes=[32], batch_sizes=[2])
    summary = eng.cost_summary()
    assert str(("predict", (32,), 1, 2)) in summary


def test_channel_mismatch_gets_own_bucket(rng):
    """A request whose channel count differs from the warmed bucket must
    NOT be routed to the incompatible program — it compiles its own."""
    model = FFNO1D(in_channels=2, out_channels=2, width=8, n_layers=1,
                   n_modes=6)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 2, 32), jnp.float32))
    eng = ServingEngine(model, variables)
    # warm a 1-channel bucket on purpose (wrong for this model's inputs)
    eng._programs[("predict", (32,), 1, 8)] = None
    x = rng.standard_normal((4, 2, 32)).astype(np.float32)
    out = eng.predict(x)  # must compile a (C=2, B=4) program, not hit C=1
    assert out.shape == (4, 2, 32)
    assert ("predict", (32,), 2, 4) in eng.buckets()


def test_predict_device_pipelined_matches_sync(served, rng):
    """predict_device returns the padded device array asynchronously;
    fetched + sliced it equals the synchronous predict()."""
    model, variables = served
    eng = ServingEngine(model, variables)
    eng.warmup(spatial_shapes=[32], batch_sizes=[8])
    x = rng.standard_normal((5, 1, 32)).astype(np.float32)
    pending = [eng.predict_device(x) for _ in range(3)]
    fetched = [np.asarray(p)[:5] for p in pending]
    ref = eng.predict(x)
    for f in fetched:
        np.testing.assert_array_equal(f, ref)
