"""Filtered ("original") CNO tests: filter design quality, alias-free
resampling, model shapes and training."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resolution_pde_tpu.ops.filters import (
    design_lowpass_filter,
    upsample_1d,
    downsample_1d,
    filtered_lrelu_2d,
)
from resolution_pde_tpu.models.cno_original import CNO2dOriginal
from resolution_pde_tpu.train import Trainer


def test_filter_is_lowpass():
    """DC gain 1; strong stopband attenuation above cutoff."""
    taps = design_lowpass_filter(factor=2, filter_size=6)
    assert abs(taps.sum() - 1.0) < 1e-6
    H = np.abs(np.fft.rfft(taps, n=512))
    freqs = np.fft.rfftfreq(512)
    # short (12-tap) kernel by design: flat passband well below the
    # cutoff (0.125 at the high rate), strong stopband attenuation
    passband = H[freqs < 0.06]
    stopband = H[freqs > 0.25]
    assert passband.min() > 0.95
    assert stopband.max() < 0.12


def test_up_down_roundtrip_on_bandlimited():
    """Upsample then downsample of a band-limited signal ~ identity."""
    n = 64
    t = np.arange(n) / n
    # keep modes deep inside the short filter's flat passband
    sig = (np.sin(2 * np.pi * 1 * t)
           + 0.5 * np.cos(2 * np.pi * 2 * t)).astype(np.float32)[None]
    up = upsample_1d(jnp.asarray(sig), 2)
    assert up.shape == (1, 128)
    down = downsample_1d(up, 2)
    np.testing.assert_allclose(np.asarray(down)[0], sig[0], atol=0.03)


def test_filtered_lrelu_positive_signal_is_near_identity():
    """For strictly positive band-limited input, LReLU is identity, so the
    filtered activation reduces to resampling round-trip."""
    n = 32
    t = np.arange(n) / n
    sig = (2.0 + np.sin(2 * np.pi * 1 * t)).astype(np.float32)
    x = jnp.asarray(np.outer(sig, sig))[None, None]
    out = filtered_lrelu_2d(x, up_factor=2)
    # ~1% relative droop from four filter passes is by design
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0.15)


def test_cno_original_shapes_and_training(rng):
    model = CNO2dOriginal(in_dim=1, out_dim=1, size=32, N_layers=2, N_res=1,
                          N_res_neck=1, channel_multiplier=8)
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    y = np.roll(x, 2, axis=-1)
    trainer = Trainer(model, learning_rate=1e-3)
    state = trainer.init(x)
    out = model.apply({"params": state.params, **state.model_state},
                      jnp.asarray(x), deterministic=True)
    assert out.shape == (2, 1, 32, 32)
    state, loss = trainer.train_epoch(state, [(x, y)])
    assert np.isfinite(loss)


def test_cno_original_radial_not_implemented(rng):
    model = CNO2dOriginal(in_dim=1, out_dim=1, size=32, N_layers=2,
                          radial=True)
    with pytest.raises(NotImplementedError):
        model.init(jax.random.key(0), jnp.ones((1, 1, 32, 32)))


def test_cno_original_registry():
    from resolution_pde_tpu.models import get_model

    assert (get_model("CNO.CNO2d_original_version.CNOModule.CNO")
            is CNO2dOriginal)
