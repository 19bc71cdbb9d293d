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


def test_unit_gaussian_at_resolution(rng):
    """Per-location stats adapt to a different eval grid: integer-factor
    downsampling strides (matching naive eval data reduction), identity
    returns self, non-divisible shapes resize."""
    from resolution_pde_tpu.ops.normalizers import UnitGaussianNormalizer

    x = rng.standard_normal((16, 1, 8, 8)).astype(np.float32)
    n = UnitGaussianNormalizer.fit(x)
    assert n.at_resolution((8, 8)) is n
    n4 = n.at_resolution((4, 4))
    assert n4.mean.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(n4.mean),
                               np.asarray(n.mean)[:, ::2, ::2])
    # round-trip still exact at the adapted resolution
    sub = x[:, :, ::2, ::2]
    np.testing.assert_allclose(
        np.asarray(n4.decode(n4.encode(sub))), sub, rtol=1e-5, atol=1e-5)
    n6 = n.at_resolution((6, 6))  # non-divisible -> resize
    assert n6.mean.shape == (1, 6, 6)
    assert np.isfinite(np.asarray(n6.std)).all()
