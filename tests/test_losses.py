import numpy as np
import jax.numpy as jnp

from resolution_pde_tpu.ops import relative_l2


def test_relative_l2_matches_manual(rng):
    x = rng.standard_normal((4, 3, 32)).astype(np.float32)
    y = rng.standard_normal((4, 3, 32)).astype(np.float32)
    xr = x.reshape(4, -1)
    yr = y.reshape(4, -1)
    expected = np.linalg.norm(xr - yr, axis=1) / (np.linalg.norm(yr, axis=1) + 1e-8)

    got = relative_l2(jnp.asarray(x), jnp.asarray(y), reduction=None)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)

    got_mean = relative_l2(jnp.asarray(x), jnp.asarray(y), reduction="mean")
    np.testing.assert_allclose(float(got_mean), expected.mean(), rtol=1e-5)

    got_sum = relative_l2(jnp.asarray(x), jnp.asarray(y), reduction="sum")
    np.testing.assert_allclose(float(got_sum), expected.sum(), rtol=1e-5)


def test_relative_l2_zero_target_is_finite():
    x = jnp.ones((2, 8))
    y = jnp.zeros((2, 8))
    val = relative_l2(x, y)
    assert np.isfinite(float(val))


def test_relative_l2_bf16_inputs_accumulate_in_f32(rng):
    x = rng.standard_normal((4, 64)).astype(np.float32)
    y = rng.standard_normal((4, 64)).astype(np.float32)
    f32 = float(relative_l2(jnp.asarray(x), jnp.asarray(y)))
    bf16 = float(
        relative_l2(jnp.asarray(x, jnp.bfloat16), jnp.asarray(y, jnp.bfloat16))
    )
    assert abs(f32 - bf16) < 2e-2
