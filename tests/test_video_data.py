"""Video transforms + Mochi latent normalization."""

import numpy as np
import pytest

from mixgrpo_tpu.data.video import (
    center_crop_resize, normalize_video, temporal_sample,
)
from mixgrpo_tpu.models.mochi.latents import (
    denormalize_dit_output, normalize_dit_input,
)


def test_temporal_sample():
    idx = temporal_sample(100, 16, stride=2, rng=np.random.default_rng(0))
    assert idx.shape == (16,)
    assert (np.diff(idx) == 2).all()
    assert idx[-1] < 100
    with pytest.raises(ValueError):
        temporal_sample(10, 16, stride=2)


def test_center_crop_resize():
    rng = np.random.default_rng(0)
    v = rng.uniform(size=(3, 100, 60, 3)).astype(np.float32)
    out = center_crop_resize(v, 48, 48)
    assert out.shape == (3, 48, 48, 3)
    out2 = center_crop_resize(v, 32, 64)
    assert out2.shape == (3, 32, 64, 3)


def test_normalize_video():
    v = np.asarray([0.0, 0.5, 1.0], np.float32)
    np.testing.assert_allclose(normalize_video(v), [-1.0, 0.0, 1.0])


def test_mochi_latent_roundtrip():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.normal(size=(1, 2, 4, 4, 12)).astype(np.float32))
    n = normalize_dit_input(lat)
    back = denormalize_dit_output(n)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat), rtol=1e-5)
    # standardization direction: channel 7 has the largest std
    assert float(jnp.abs(n[..., 7]).mean()) < float(jnp.abs(lat[..., 7]).mean()) + 1
