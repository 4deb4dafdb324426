"""Mochi T2V sampling pipeline (CFG + linear-quadratic schedule).

Counterpart of zqqqqz2000/MixGRPO fastvideo/models/mochi_hf/pipeline_mochi.py:
unlike guidance-distilled FLUX/HunyuanVideo, Mochi applies real
classifier-free guidance (conditional/unconditional batch,
pred = uncond + scale * (cond - uncond)) over the linear-quadratic sigma
schedule, then Euler flow-match steps; latents are de-standardized with the
published per-channel stats before VAE decoding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.mochi.model import MochiConfig, mochi_forward
from mixgrpo_tpu.solvers.distill import linear_quadratic_schedule


class MochiPipeline:
    def __init__(
        self,
        cfg: MochiConfig,
        params,
        *,
        num_steps: int = 64,
        guidance_scale: float = 4.5,
        lq_threshold: float = 0.025,
        dtype=jnp.bfloat16,
        attn_impl: str = "xla",
        vae_cfg=None,  # models.mochi.vae.MochiVAEConfig
        vae_params=None,
        vae_tiling: str = "auto",  # auto | on | off
    ):
        if vae_tiling not in ("auto", "on", "off"):
            raise ValueError(f"unknown vae_tiling {vae_tiling!r}")
        self.vae_tiling = vae_tiling
        self.cfg = cfg
        self.params = params
        self.vae_cfg, self.vae_params = vae_cfg, vae_params
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        self.dtype = dtype
        self.attn_impl = attn_impl
        sig = linear_quadratic_schedule(num_steps, lq_threshold, num_steps // 2)
        self.sigmas = np.concatenate([sig, [0.0]]).astype(np.float32)
        self._sample = jax.jit(self._sample_impl)

    def _sample_impl(self, params, z0, txt, txt_mask, neg_txt, neg_mask):
        B = z0.shape[0]
        use_cfg = self.guidance_scale > 1.0

        def body(i, z):
            sigma = jnp.take(jnp.asarray(self.sigmas), i)
            t = jnp.broadcast_to(sigma, (B,))
            cond = mochi_forward(
                params, self.cfg, z.astype(self.dtype), txt, t, txt_mask,
                dtype=self.dtype, attn_impl=self.attn_impl, remat=False,
            )
            if use_cfg:
                uncond = mochi_forward(
                    params, self.cfg, z.astype(self.dtype), neg_txt, t,
                    neg_mask, dtype=self.dtype, attn_impl=self.attn_impl,
                    remat=False,
                )
                pred = uncond + self.guidance_scale * (cond - uncond)
            else:
                pred = cond
            dt = jnp.take(jnp.asarray(self.sigmas), i + 1) - sigma
            return z + dt * pred.astype(z.dtype)

        return jax.lax.fori_loop(0, self.num_steps, body, z0)

    def __call__(
        self,
        txt: jnp.ndarray,  # (B, L, text_embed_dim) T5 features
        *,
        num_frames: int,
        height: int,
        width: int,
        text_mask: Optional[jnp.ndarray] = None,
        neg_txt: Optional[jnp.ndarray] = None,
        neg_mask: Optional[jnp.ndarray] = None,
        rng=None,
    ) -> jnp.ndarray:
        """Returns decoded video in [0, 1] when constructed with a VAE
        (pipeline_mochi.py decode path: de-standardize per channel, decode,
        map [-1, 1] -> [0, 1]); raw DiT-space latents otherwise."""
        rng = rng if rng is not None else jax.random.key(0)
        B = txt.shape[0]
        lt = (num_frames - 1) // 6 + 1  # Mochi VAE: 6x temporal compression
        lh, lw = height // 8, width // 8
        z0 = jax.random.normal(rng, (B, lt, lh, lw, self.cfg.in_channels),
                               jnp.float32)
        if text_mask is None:
            text_mask = jnp.ones(txt.shape[:2], jnp.int32)
        if neg_txt is None:
            neg_txt = jnp.zeros_like(txt)
            neg_mask = jnp.ones(txt.shape[:2], jnp.int32)
        lat = self._sample(self.params, z0, txt, text_mask, neg_txt, neg_mask)
        if self.vae_params is None:
            return lat
        from mixgrpo_tpu.models.mochi.latents import denormalize_dit_output
        from mixgrpo_tpu.models.mochi.vae import (
            mochi_vae_decode, mochi_vae_decode_tiled)

        if lat.shape[-1] == 12:  # published per-channel stats are 12-ch
            lat = denormalize_dit_output(lat)
        # tiling policy mirrors the reference pipeline's enable_vae_tiling
        # (pipeline_mochi.py:444-457): tile when the latent exceeds one
        # 256px / 16-frame tile in any axis
        tile = self.vae_tiling == "on" or (
            self.vae_tiling == "auto"
            and (lat.shape[1] > 17 or max(lat.shape[2], lat.shape[3]) > 32)
        )
        decode = mochi_vae_decode_tiled if tile else mochi_vae_decode
        video = decode(self.vae_params, self.vae_cfg, lat, dtype=self.dtype)
        return jnp.clip(video * 0.5 + 0.5, 0.0, 1.0)
