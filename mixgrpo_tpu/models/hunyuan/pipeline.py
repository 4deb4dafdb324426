"""HunyuanVideo text-to-video sampling pipeline.

Counterpart of the reference's legacy video inference stack
(zqqqqz2000/MixGRPO fastvideo/models/hunyuan/inference.py
``HunyuanVideoSampler`` + hunyuan/diffusion/pipelines/
pipeline_hunyuan_video.py): flow-match Euler sampling with the
time-shifted discrete schedule, embedded (distilled) guidance, and causal
3D VAE decoding.  Text conditioning enters as precomputed LLM hidden
states + CLIP pooled embeddings (the reference's TextEncoder wrapper runs
an external LLM; our data path treats encoders as upstream assets).

TPU-first: the T-step denoising loop is one jitted ``lax.scan`` via
solvers/rollout.py with an all-deterministic mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.hunyuan.model import (
    HunyuanVideoConfig, hunyuan_video_forward,
)
from mixgrpo_tpu.models.hunyuan.scheduler import FlowMatchDiscreteScheduler
from mixgrpo_tpu.models.hunyuan.vae3d import (
    CausalVAEConfig, causal_vae_decode,
)
from mixgrpo_tpu.solvers.rollout import SamplerConfig, run_rollout


class HunyuanVideoPipeline:
    def __init__(
        self,
        cfg: HunyuanVideoConfig,
        params,
        *,
        vae_cfg: Optional[CausalVAEConfig] = None,
        vae_params=None,
        num_steps: int = 50,
        shift: float = 7.0,
        guidance_scale: float = 6.0,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        text_encoder=None,  # models.hunyuan.text_encoder.LLMTextEncoder
        clip_pooler=None,  # models.hunyuan.text_encoder.CLIPTextPooler
        vae_tiling: str = "auto",  # auto | on | off
    ):
        self.cfg = cfg
        self.params = params
        self.text_encoder = text_encoder
        self.clip_pooler = clip_pooler
        self.vae_cfg, self.vae_params = vae_cfg, vae_params
        self.num_steps = num_steps
        self.guidance_scale = guidance_scale
        self.dtype = dtype
        self.attn_impl = attn_impl
        if vae_tiling not in ("auto", "on", "off"):
            raise ValueError(f"unknown vae_tiling {vae_tiling!r}")
        self.vae_tiling = vae_tiling
        sched = FlowMatchDiscreteScheduler(shift=shift)
        sched.set_timesteps(num_steps)
        self.sigmas = sched.sigmas
        self._sample = jax.jit(self._sample_impl)

    @classmethod
    def from_checkpoint(
        cls,
        dit_path: str,
        vae_path: Optional[str] = None,
        cfg: Optional[HunyuanVideoConfig] = None,
        vae_cfg: Optional[CausalVAEConfig] = None,
        **kw,
    ) -> "HunyuanVideoPipeline":
        """Build from released checkpoints: the official transformer .pt
        (fastvideo/models/hunyuan/inference.py:100-102 Inference.load_state_dict)
        and optionally the 3D-causal VAE dir."""
        from mixgrpo_tpu.models.hunyuan.load import load_hunyuan_video

        params, cfg = load_hunyuan_video(dit_path, cfg)
        vae_params = None
        if vae_path is not None:
            from mixgrpo_tpu.models.hunyuan.vae3d import load_causal_vae_decoder

            vae_cfg = vae_cfg or CausalVAEConfig.hunyuan_video()
            vae_params = load_causal_vae_decoder(vae_path, vae_cfg)
        return cls(cfg, params, vae_cfg=vae_cfg, vae_params=vae_params, **kw)

    def _sample_impl(self, params, z0, txt, pooled, text_mask, rng):
        B, T, H, W, C = z0.shape

        def model_fn(z, sigma):
            zz = z.reshape(B, T, H, W, C)
            t = jnp.broadcast_to(sigma, (B,))
            g = jnp.full((B,), self.guidance_scale, jnp.float32)
            out = hunyuan_video_forward(
                params, self.cfg, zz.astype(self.dtype), txt, pooled, t, g,
                text_mask, dtype=self.dtype, attn_impl=self.attn_impl,
                remat=False,
            )
            return out.reshape(B, -1)

        scfg = SamplerConfig(num_steps_max=self.num_steps, eta=0.0)
        out = run_rollout(
            scfg, model_fn, z0.reshape(B, -1).astype(jnp.float32),
            sigmas=jnp.asarray(self.sigmas),
            deterministic=jnp.ones(self.num_steps, bool),
            num_steps=self.num_steps, rng=rng,
        )
        return out.final_latents.reshape(B, T, H, W, C)

    def encode_prompt(self, prompts, data_type: str = "video"):
        """Raw strings -> (LLM hidden states, text mask, CLIP pooled),
        replacing the reference's TextEncoder pair in the pipeline
        (pipeline_hunyuan_video.py prompt encoding via
        text_encoder/__init__.py:338-353).  Requires the pipeline to be
        constructed with ``text_encoder`` (and optionally ``clip_pooler``)."""
        assert self.text_encoder is not None, (
            "pipeline built without a text_encoder; pass precomputed hidden "
            "states instead"
        )
        prompts = [prompts] if isinstance(prompts, str) else list(prompts)
        txt, mask = self.text_encoder(prompts, data_type=data_type)
        if self.clip_pooler is not None:
            pooled = self.clip_pooler(prompts)
        else:
            pooled = jnp.zeros(
                (len(prompts), self.cfg.text_states_dim_2), jnp.float32
            )
        return txt.astype(jnp.float32), mask, pooled.astype(jnp.float32)

    def __call__(
        self,
        txt: jnp.ndarray,  # (B, L, text_states_dim) LLM hidden states
        pooled: jnp.ndarray,  # (B, text_states_dim_2)
        *,
        video_length: int,
        height: int,
        width: int,
        text_mask: Optional[jnp.ndarray] = None,
        rng=None,
    ) -> jnp.ndarray:
        """Returns decoded video in [0, 1] (or raw latents without a VAE)."""
        rng = rng if rng is not None else jax.random.key(0)
        B = txt.shape[0]
        lt = (video_length - 1) // (
            self.vae_cfg.time_compression_ratio if self.vae_cfg else 4
        ) + 1
        lh, lw = height // 8, width // 8
        z0 = jax.random.normal(
            rng, (B, lt, lh, lw, self.cfg.in_channels), jnp.float32
        )
        if text_mask is None:
            text_mask = jnp.ones(txt.shape[:2], jnp.int32)
        lat = self._sample(self.params, z0, txt, pooled, text_mask, rng)
        if self.vae_params is None:
            return lat
        lat = lat / self.vae_cfg.scaling_factor
        # tiling policy mirrors the reference, which enables spatial +
        # temporal VAE tiling for every real video decode
        # (autoencoder_kl_causal_3d.py enable_tiling; sample sizes 256px /
        # 64 frames): tile when the latent exceeds one tile in any axis
        tile = self.vae_tiling == "on" or (
            self.vae_tiling == "auto"
            and (lat.shape[1] > 17 or max(lat.shape[2], lat.shape[3]) > 32)
        )
        if tile:
            from mixgrpo_tpu.models.hunyuan.vae3d import causal_vae_decode_tiled

            video = causal_vae_decode_tiled(self.vae_params, self.vae_cfg,
                                            lat, dtype=self.dtype)
        else:
            video = causal_vae_decode(self.vae_params, self.vae_cfg, lat,
                                      dtype=self.dtype)
        return jnp.clip(video * 0.5 + 0.5, 0.0, 1.0)
