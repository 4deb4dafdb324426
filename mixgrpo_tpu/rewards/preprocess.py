"""On-device CLIP image preprocessing (batched).

Replaces the reference's per-image PIL transform pipelines (open_clip val
transforms / HF processors, invoked one image at a time in Python loops —
hps_score.py:66-78, pick_score.py:56-76): resize shortest side with bicubic
interpolation, center crop, normalize with the OpenAI CLIP statistics.
Decoded rollout images stay on the TPU the whole way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(images: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B, H, W, 3) float in [0,1] -> (B, size, size, 3) normalized.

    Resize so the shorter side equals ``size`` (bicubic), center crop.
    """
    b, h, w, c = images.shape
    if h <= w:
        nh, nw = size, max(int(round(w * size / h)), size)
    else:
        nh, nw = max(int(round(h * size / w)), size), size
    x = jax.image.resize(images, (b, nh, nw, c), method="cubic")
    top = (nh - size) // 2
    left = (nw - size) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, c))
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (jnp.clip(x, 0.0, 1.0) - mean) / std
