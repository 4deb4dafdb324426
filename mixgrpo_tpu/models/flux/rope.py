"""Multi-axis rotary position embeddings for FLUX-style MMDiT.

FLUX rotates attention heads with per-axis RoPE over (id, h, w) position ids
with axis dims (16, 56, 56) summing to head_dim=128 — the same layout as the
reference's in-tree MMDiT exemplar (zqqqqz2000/MixGRPO
fastvideo/models/hunyuan/modules/posemb_layers.py, rope_dim_list [16,56,56];
SURVEY.md §2.6).  Position-id construction parity:
``prepare_latent_image_ids`` fastvideo/train_grpo_flux.py:80-91 (image ids:
zeros in axis 0, row index in axis 1, col index in axis 2); text ids are all
zeros.

TPU-first design: the cos/sin tables are computed **once per resolution**
outside the sampling scan (ids are static given h/w) and passed in as scan
constants — the reference recomputes rotary embeddings inside every DiT
forward.

Pairing convention: adjacent (even, odd) feature pairs are rotated
(x_even', x_odd') = (x_even cos - x_odd sin, x_odd cos + x_even sin),
with per-axis frequencies theta^(-2j/d).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_image_ids(latent_h: int, latent_w: int) -> np.ndarray:
    """Packed-latent position ids, (h/2 * w/2, 3): [0, row, col].

    ``latent_h``/``latent_w`` are *pre-packing* latent dims; ids are on the
    2x2-packed grid (train_grpo_flux.py:245 passes latent_h//2, latent_w//2).
    """
    h, w = latent_h // 2, latent_w // 2
    ids = np.zeros((h, w, 3), dtype=np.float32)
    ids[..., 1] += np.arange(h, dtype=np.float32)[:, None]
    ids[..., 2] += np.arange(w, dtype=np.float32)[None, :]
    return ids.reshape(h * w, 3)


def make_text_ids(seq_len: int) -> np.ndarray:
    """Text token ids are all-zero triples (FLUX convention)."""
    return np.zeros((seq_len, 3), dtype=np.float32)


def rope_tables(
    ids: jnp.ndarray,
    axes_dim: Sequence[int] = (16, 56, 56),
    theta: float = 10000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build cos/sin tables of shape (S, sum(axes_dim)) from (S, 3) ids.

    Per axis a with dim d: angle[s, j] = ids[s, a] * theta^(-2j/d) for
    j < d/2, then each cos/sin entry is repeated twice (interleaved) so the
    table aligns with adjacent-pair rotation.
    """
    ids = jnp.asarray(ids, jnp.float32)
    cos_parts, sin_parts = [], []
    for a, d in enumerate(axes_dim):
        j = jnp.arange(0, d, 2, dtype=jnp.float32) / d
        inv_freq = 1.0 / (theta**j)  # (d/2,)
        angle = ids[:, a : a + 1] * inv_freq[None, :]  # (S, d/2)
        cos_parts.append(jnp.repeat(jnp.cos(angle), 2, axis=-1))
        sin_parts.append(jnp.repeat(jnp.sin(angle), 2, axis=-1))
    return jnp.concatenate(cos_parts, axis=-1), jnp.concatenate(sin_parts, axis=-1)


@functools.lru_cache(maxsize=8)
def _pair_rotation_matrix(d: int):
    """(D, D) matrix R with x @ R = interleave(-x_odd, x_even).

    Each column has exactly one ±1 entry, so the matmul is numerically
    EXACT (a signed permutation) — and it runs on the MXU in the same
    D-minor layout the attention kernel consumes.  The elementwise
    formulation (reshape to (..., D/2, 2) + stack) forces Mosaic lane
    re-interleaving: profiled at ~7 ms of f32 relayout copies per
    full-depth 720px forward (scripts/analyze_profile.py, round 3)."""
    eye = np.eye(d // 2, dtype=np.float32)
    R = np.zeros((d, d), np.float32)
    R[1::2, 0::2] = -eye  # out[2i]   = -x[2i+1]
    R[0::2, 1::2] = eye   # out[2i+1] =  x[2i]
    R.setflags(write=False)
    return R  # numpy, NOT jnp: a cached device array would leak tracers
              # across jit/scan scopes (asarray at the use site is free)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate adjacent feature pairs. x: (..., S, D); cos/sin: (S, D)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    rotated = jnp.matmul(
        xf, jnp.asarray(_pair_rotation_matrix(x.shape[-1])),
        preferred_element_type=jnp.float32)
    out = xf * cos + rotated * sin
    return out.astype(dtype)
