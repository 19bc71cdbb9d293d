"""Pipeline parallelism (parallel/pipeline.py): the GPipe schedule over a
"stage" mesh axis must be numerically identical to applying the stages
sequentially — pipelining is a schedule, not an algorithm change."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resolution_pde_tpu.models.ffno import FSpectralConv2d
from resolution_pde_tpu.parallel import (
    make_mesh,
    pipeline_apply,
    stack_stage_params,
)


def test_pipeline_matches_sequential_mlp(rng):
    """4-stage MLP pipeline on a pure 'stage' mesh."""
    mesh = make_mesh({"stage": 4, "data": 2})
    d = 16
    per_stage = [
        {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32),
         "b": jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)}
        for _ in range(4)
    ]

    def stage_fn(p, x):
        return x + jnp.tanh(x @ p["w"] + p["b"])

    x = jnp.asarray(rng.standard_normal((8, d)), jnp.float32)
    ref = x
    for p in per_stage:
        ref = stage_fn(p, ref)

    out = pipeline_apply(stage_fn, stack_stage_params(per_stage), x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n_microbatches", [2, 4, 8])
def test_pipeline_microbatch_counts(rng, n_microbatches):
    mesh = make_mesh({"stage": 2, "data": 4})
    d = 8
    per_stage = [
        {"w": jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)}
        for _ in range(2)
    ]

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"])

    x = jnp.asarray(rng.standard_normal((8, d)), jnp.float32)
    ref = stage_fn(per_stage[1], stage_fn(per_stage[0], x))
    out = pipeline_apply(stage_fn, stack_stage_params(per_stage), x, mesh,
                         n_microbatches=n_microbatches)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_ffno_layers(rng):
    """Real operator stages: 4 FFNO spectral layers (spectral conv + FF +
    residual), one per pipeline stage."""
    mesh = make_mesh({"stage": 4, "data": 2})
    width, modes = 8, 6
    layer = FSpectralConv2d(width, modes, factor=2, n_ff_layers=2)
    x = jnp.asarray(rng.standard_normal((4, 12, 12, width)), jnp.float32)

    per_stage = [
        layer.init(jax.random.key(i), x)["params"] for i in range(4)
    ]

    def stage_fn(p, h):
        return h + layer.apply({"params": p}, h)

    ref = x
    for p in per_stage:
        ref = stage_fn(p, ref)

    out = pipeline_apply(stage_fn, stack_stage_params(per_stage), x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_validates_shapes(rng):
    mesh = make_mesh({"stage": 4, "data": 2})
    p3 = [{"w": jnp.zeros((4, 4))} for _ in range(3)]
    x = jnp.zeros((8, 4))
    with pytest.raises(ValueError, match="leading dims"):
        pipeline_apply(lambda p, h: h, stack_stage_params(p3), x, mesh)
    p4 = [{"w": jnp.zeros((4, 4))} for _ in range(4)]
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(lambda p, h: h, stack_stage_params(p4),
                       jnp.zeros((6, 4)), mesh)
