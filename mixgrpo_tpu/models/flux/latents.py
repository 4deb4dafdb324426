"""FLUX latent packing helpers.

Parity: zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:94-115
(``pack_latents`` / ``unpack_latents``): the 16-channel VAE latent grid is
packed into 2x2 patches giving 64-channel tokens, and unpacked back for VAE
decoding.  Layout here is channel-last ((B, H, W, C), TPU-friendly for the
convolutional VAE) instead of the reference's NCHW.
"""

from __future__ import annotations

import jax.numpy as jnp

VAE_SCALE_FACTOR = 8  # spatial downsample of the FLUX AutoencoderKL
# FLUX VAE scaling constants (hardcoded in the reference at
# train_grpo_flux.py:287: latents / 0.3611 + 0.1159)
VAE_SCALING = 0.3611
VAE_SHIFT = 0.1159


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) latent grid -> (B, H/2*W/2, 4C) packed tokens."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, h/2, w/2, C, 2, 2)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """(B, L, 4C) packed tokens -> (B, H, W, C) latent grid.

    ``height``/``width`` are *image* pixel dims; latent dims are
    pixel / VAE_SCALE_FACTOR, rounded to even (train_grpo_flux.py:102-115).
    """
    b, n, ch = tokens.shape
    h = 2 * (height // (VAE_SCALE_FACTOR * 2))
    w = 2 * (width // (VAE_SCALE_FACTOR * 2))
    c = ch // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, h/2, 2, w/2, 2, C)
    return x.reshape(b, h, w, c)


def denormalize_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """Undo the FLUX VAE latent normalization before decoding."""
    return latents / VAE_SCALING + VAE_SHIFT
