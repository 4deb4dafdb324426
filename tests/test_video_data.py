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


def test_pad_to_multiple():
    from mixgrpo_tpu.data.video import pad_to_multiple

    assert pad_to_multiple(16, 16) == 16
    assert pad_to_multiple(17, 16) == 32
    assert pad_to_multiple(1, 4) == 4


def test_video_collate_padding_and_mask():
    from mixgrpo_tpu.data.video import VideoCollate

    col = VideoCollate(ae_stride=8, ae_stride_t=4, patch_size=2, patch_size_t=1)
    batch = [
        {"pixel_values": np.ones((5, 32, 48, 3), np.float32), "text": "a",
         "input_ids": np.arange(4), "cond_mask": np.ones(4)},
        {"pixel_values": np.ones((9, 30, 30, 3), np.float32), "text": "b",
         "input_ids": np.arange(4), "cond_mask": np.ones(4)},
    ]
    out = col(batch)
    # T: max 9 -> pad (9-1+4) to mult of 4 = 12 -> 12+1-4 = 9; H/W to 16s
    assert out["pixel_values"].shape == (2, 9, 32, 48, 3)
    # latent grid: lt=(9-1)/4+1=3, lh=4, lw=6
    assert out["attention_mask"].shape == (2, 3, 4, 6)
    # clip 0: 5 frames -> vt=ceil(4/4)+1=2, vh=4, vw=6 (full)
    m0 = out["attention_mask"][0]
    assert m0[:2].all() and not m0[2:].any()
    # clip 1: 9 frames -> vt=3; 30px -> vh=vw=ceil(30/8)=4
    m1 = out["attention_mask"][1]
    assert m1[:, :4, :4].all() and not m1[:, :, 4:].any()
    # padded pixels are zero outside each clip's extent
    assert out["pixel_values"][0, 5:].sum() == 0
    assert out["pixel_values"][1, :, 30:, :].sum() == 0
    assert out["input_ids"].shape == (2, 4)
