"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
TPU by bench/TPU runs)."""

import numpy as np
import jax
import jax.numpy as jnp

from resolution_pde_tpu.ops.pallas import (
    truncated_spectral_mix_1d,
    s4d_kernel_pallas,
)
from resolution_pde_tpu.ops.spectral import factorized_spectral_conv_1d
from resolution_pde_tpu.ops import ssm as ssm_ops


def test_spectral_mix_matches_reference_path(rng):
    r, w, c, n_modes = 96, 64, 8, 16
    x = jnp.asarray(rng.standard_normal((r, w, c)), jnp.float32)
    weight = jnp.asarray(0.1 * rng.standard_normal((c, c, n_modes, 2)),
                         jnp.float32)
    # reference: the jnp FFT path applied with rows as batch
    expected = factorized_spectral_conv_1d(x, weight, n_modes)
    got = truncated_spectral_mix_1d(x, weight, n_modes, row_tile=32,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_spectral_mix_row_padding(rng):
    """Rows not divisible by the tile are padded and cropped."""
    r, w, c, n_modes = 50, 32, 4, 8
    x = jnp.asarray(rng.standard_normal((r, w, c)), jnp.float32)
    weight = jnp.asarray(0.1 * rng.standard_normal((c, c, n_modes, 2)),
                         jnp.float32)
    expected = factorized_spectral_conv_1d(x, weight, n_modes)
    got = truncated_spectral_mix_1d(x, weight, n_modes, row_tile=16,
                                    interpret=True)
    assert got.shape == (r, w, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_vandermonde_kernel_matches_ssm_op(rng):
    h, n, L = 12, 16, 96
    log_dt = jnp.asarray(rng.standard_normal(h) * 0.5 - 5, jnp.float32)
    la, ai = ssm_ops.s4d_lin_init(h, n)
    A = -jnp.exp(jnp.asarray(la)) + 1j * jnp.asarray(ai)
    cre = rng.standard_normal((h, n)).astype(np.float32)
    cim = rng.standard_normal((h, n)).astype(np.float32)
    C = jax.lax.complex(jnp.asarray(cre), jnp.asarray(cim))

    expected = ssm_ops.s4d_kernel_zoh(C, A, log_dt, L)
    got = s4d_kernel_pallas(C, A, log_dt, L, h_tile=8, l_tile=32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-3, atol=1e-4)
