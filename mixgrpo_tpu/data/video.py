"""Video preprocessing transforms (legacy video-dataset path).

Compact counterparts of zqqqqz2000/MixGRPO fastvideo/dataset/transform.py
(647 lines of torch video transforms; only the pieces actually used by the
T2V datasets): temporal frame sampling, aspect-preserving resize +
center-crop, and [-1, 1] normalization.  Arrays are (T, H, W, C) float in
[0, 1] (channel-last for TPU convs).
"""

from __future__ import annotations

import numpy as np


def temporal_sample(num_frames_total: int, num_frames: int, stride: int = 1,
                    rng: np.random.Generator | None = None):
    """Random clip of ``num_frames`` at ``stride`` (TemporalRandomCrop)."""
    span = (num_frames - 1) * stride + 1
    if num_frames_total < span:
        raise ValueError(f"video too short: {num_frames_total} < {span}")
    start = 0
    if rng is not None and num_frames_total > span:
        start = int(rng.integers(0, num_frames_total - span + 1))
    return np.arange(start, start + span, stride)


def center_crop_resize(video: np.ndarray, height: int, width: int) -> np.ndarray:
    """Resize so the target fits, then center crop (CenterCropResizeVideo)."""
    import jax
    import jax.numpy as jnp

    t, h, w, c = video.shape
    scale = max(height / h, width / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    x = jax.image.resize(jnp.asarray(video), (t, nh, nw, c), "cubic")
    top, left = (nh - height) // 2, (nw - width) // 2
    return np.asarray(x[:, top : top + height, left : left + width, :])


def normalize_video(video: np.ndarray) -> np.ndarray:
    """[0, 1] -> [-1, 1] (transform.py NormalizeVideo)."""
    return video * 2.0 - 1.0
