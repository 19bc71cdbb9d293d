import numpy as np
import jax
import jax.numpy as jnp

from resolution_pde_tpu.ops import SimpleNormalizer, UnitGaussianNormalizer


def test_simple_normalizer_roundtrip(rng):
    x = rng.standard_normal((10, 1, 64)).astype(np.float32) * 3 + 1
    norm = SimpleNormalizer.fit(x)
    enc = norm.encode(jnp.asarray(x))
    assert abs(float(jnp.mean(enc))) < 1e-5
    dec = norm.decode(enc)
    np.testing.assert_allclose(np.asarray(dec), x, rtol=1e-4, atol=1e-5)


def test_unit_gaussian_normalizer_matches_torch_semantics(rng):
    import torch

    x = rng.standard_normal((50, 8, 8, 2)).astype(np.float32)
    norm = UnitGaussianNormalizer.fit(x)
    # torch.std uses Bessel correction (ddof=1), reference custom_layer.py:24
    t_mean = torch.mean(torch.from_numpy(x), 0).numpy()
    t_std = torch.std(torch.from_numpy(x), 0).numpy()
    np.testing.assert_allclose(np.asarray(norm.mean), t_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(norm.std), t_std, rtol=1e-4, atol=1e-6)

    enc = norm.encode(jnp.asarray(x))
    dec = norm.decode(enc)
    np.testing.assert_allclose(np.asarray(dec), x, rtol=1e-4, atol=1e-5)


def test_normalizers_are_pytrees():
    norm = SimpleNormalizer(1.0, 2.0)
    leaves = jax.tree_util.tree_leaves(norm)
    assert len(leaves) == 2

    @jax.jit
    def encode(n, x):
        return n.encode(x)

    out = encode(norm, jnp.full((2, 2), 3.0))
    np.testing.assert_allclose(np.asarray(out), (3.0 - 1.0) / (2.0 + 1e-8))
