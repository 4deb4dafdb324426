"""HunyuanVideo MMDiT (video model zoo) in pure-functional JAX.

Rebuild of the reference's in-tree video DiT
(zqqqqz2000/MixGRPO fastvideo/models/hunyuan/modules/models.py:373-680
``HYVideoDiffusionTransformer``): the same FLUX-style MMDiT double/single
blocks (we literally reuse the FLUX block functions — the reference
docstring cites Flux.1; SURVEY.md §2.6 pins the structural identity), plus
the video-specific pieces:

  - 3D patchify (patch (1, 2, 2)) over (T, H, W, C) latents and the
    3-axis (t, h, w) RoPE ids with rope_theta=256 (models.py:437,
    load.py:25-33);
  - the **token refiner** text projection (single_refiner): LLM hidden
    states (4096) are refined by self-attention blocks gated on
    (timestep + masked-mean context) conditioning
    (hunyuan/modules/token_refiner.py:15-230);
  - conditioning vec = time + pooled-CLIP (+ guidance) as in FLUX;
  - FinalLayer with shift-first adaLN (models.py:650-680) and unpatchify.

Ulysses SP applies through the shared attention dispatcher
(attn_impl="ulysses") instead of the reference's hand-rolled all_to_all
inside ``parallel_attention`` (hunyuan/modules/attenion.py:35-90).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux import layers as L
from mixgrpo_tpu.models.flux import model as _flux_model
from mixgrpo_tpu.models.flux.model import (
    FluxConfig, _double_block, _single_block, _split_heads, _merge_heads,
)
from mixgrpo_tpu.models.flux.rope import rope_tables
from mixgrpo_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class HunyuanVideoConfig:
    patch_size: tuple = (1, 2, 2)
    in_channels: int = 16
    hidden_size: int = 3072
    num_heads: int = 24
    mlp_ratio: float = 4.0
    depth_double: int = 20
    depth_single: int = 40
    rope_dim_list: tuple = (16, 56, 56)
    rope_theta: float = 256.0
    text_states_dim: int = 4096  # LLM hidden states
    text_states_dim_2: int = 768  # CLIP pooled
    refiner_depth: int = 2
    guidance_embed: bool = True
    time_freq_dim: int = 256
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def patch_elems(self) -> int:
        pt, ph, pw = self.patch_size
        return pt * ph * pw * self.in_channels

    def block_cfg(self) -> FluxConfig:
        """FLUX-block-compatible view (blocks are structurally identical)."""
        return FluxConfig(
            in_channels=self.patch_elems, hidden_size=self.hidden_size,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            depth_double=self.depth_double, depth_single=self.depth_single,
            axes_dims=self.rope_dim_list, pooled_dim=self.text_states_dim_2,
            context_dim=self.text_states_dim,
            guidance_embeds=self.guidance_embed,
            time_freq_dim=self.time_freq_dim, theta=self.rope_theta,
            eps=self.eps,
        )

    @classmethod
    def hunyuan_video(cls) -> "HunyuanVideoConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "HunyuanVideoConfig":
        return cls(
            in_channels=4, hidden_size=96, num_heads=4, depth_double=1,
            depth_single=2, rope_dim_list=(8, 8, 8), text_states_dim=32,
            text_states_dim_2=16, refiner_depth=1, time_freq_dim=32,
        )


def make_video_ids(t: int, latent_h: int, latent_w: int, sp_size: int = 1):
    """(t * h/2 * w/2, 3) position ids on the packed grid.

    RoPE grids account for sp_size (temporal dim x sp_size when the
    sequence is temporally sharded; models.py:617)."""
    h, w = latent_h // 2, latent_w // 2
    tt = t * sp_size
    ids = np.zeros((tt, h, w, 3), np.float32)
    ids[..., 0] += np.arange(tt, dtype=np.float32)[:, None, None]
    ids[..., 1] += np.arange(h, dtype=np.float32)[None, :, None]
    ids[..., 2] += np.arange(w, dtype=np.float32)[None, None, :]
    return ids.reshape(tt * h * w, 3)


# ---------------------------------------------------------------------------
# token refiner
# ---------------------------------------------------------------------------


def _refiner_block_init(key, cfg: HunyuanVideoConfig):
    h = cfg.hidden_size
    ks = jax.random.split(key, 4)
    return {
        "norm1": {"scale": jnp.ones((h,), jnp.float32),
                  "bias": jnp.zeros((h,), jnp.float32)},
        "qkv": L.linear_init(ks[0], h, 3 * h),
        "proj": L.linear_init(ks[1], h, h),
        "norm2": {"scale": jnp.ones((h,), jnp.float32),
                  "bias": jnp.zeros((h,), jnp.float32)},
        "mlp_in": L.linear_init(ks[2], h, cfg.mlp_hidden),
        "mlp_out": L.linear_init(ks[3], cfg.mlp_hidden, h),
        # zero-init gates (token_refiner.py:75-77)
        "mod": {"lin": {"w": jnp.zeros((h, 2 * h), jnp.float32),
                        "b": jnp.zeros((2 * h,), jnp.float32)}},
    }


def _ln_affine(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _refiner_block(p, cfg, x, c, mask, dtype):
    gate_msa, gate_mlp = L.modulation(p["mod"], c, 2, dtype)
    h = _ln_affine(p["norm1"], x, cfg.eps)
    q, k, v = jnp.split(L.linear(p["qkv"], h, dtype), 3, axis=-1)
    q, k, v = (_split_heads(t, cfg.num_heads) for t in (q, k, v))
    attn_mask = None
    if mask is not None:
        m = mask.astype(bool).at[:, 0].set(True)  # token_refiner.py:148-150
        attn_mask = m[:, None, None, :]
    # _split_heads follows the flux module's active attention layout
    o = _merge_heads(
        attention(q, k, v, mask=attn_mask, impl="xla",
                  layout=_flux_model._ATTN_LAYOUT)
    )
    x = x + gate_msa[:, None, :] * L.linear(p["proj"], o, dtype)
    h = _ln_affine(p["norm2"], x, cfg.eps)
    mlp = L.linear(p["mlp_out"], jax.nn.silu(L.linear(p["mlp_in"], h, dtype)), dtype)
    return x + gate_mlp[:, None, :] * mlp


def _refiner_init(key, cfg: HunyuanVideoConfig):
    ks = jax.random.split(key, 4 + cfg.refiner_depth)
    h = cfg.hidden_size
    return {
        "input_embedder": L.linear_init(ks[0], cfg.text_states_dim, h),
        "t_embedder": L.mlp_embedder_init(ks[1], cfg.time_freq_dim, h),
        "c_embedder": L.mlp_embedder_init(ks[2], cfg.text_states_dim, h),
        "blocks": [
            _refiner_block_init(k, cfg) for k in ks[4 : 4 + cfg.refiner_depth]
        ],
    }


def _refine_text(p, cfg, txt, t, mask, dtype):
    """SingleTokenRefiner (token_refiner.py:156-230)."""
    t_repr = L.mlp_embedder(
        p["t_embedder"], L.timestep_embedding(t, cfg.time_freq_dim), dtype
    )
    if mask is None:
        ctx = jnp.mean(txt.astype(jnp.float32), axis=1)
    else:
        mf = mask.astype(jnp.float32)[..., None]
        ctx = jnp.sum(txt.astype(jnp.float32) * mf, axis=1) / jnp.maximum(
            jnp.sum(mf, axis=1), 1e-6
        )
    c = t_repr + L.mlp_embedder(p["c_embedder"], ctx.astype(dtype), dtype)
    x = L.linear(p["input_embedder"], txt.astype(dtype), dtype)
    for bp in p["blocks"]:
        x = _refiner_block(bp, cfg, x, c, mask, dtype)
    return x


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def init_hunyuan_video(key, cfg: HunyuanVideoConfig) -> Dict[str, Any]:
    from mixgrpo_tpu.models.flux.model import _double_block_init, _single_block_init

    bcfg = cfg.block_cfg()
    ks = jax.random.split(key, 9)
    h = cfg.hidden_size
    params = {
        "img_in": L.linear_init(ks[0], cfg.patch_elems, h),
        "txt_in": _refiner_init(ks[1], cfg),
        "time_in": L.mlp_embedder_init(ks[2], cfg.time_freq_dim, h),
        "vector_in": L.mlp_embedder_init(ks[3], cfg.text_states_dim_2, h),
        "final_mod": L.modulation_init(ks[5], h, 2),
        "final_proj": L.linear_init(ks[6], h, cfg.patch_elems),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = L.mlp_embedder_init(ks[4], cfg.time_freq_dim, h)
    params["double"] = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_double_block_init(k, bcfg)
          for k in jax.random.split(ks[7], cfg.depth_double)],
    )
    params["single"] = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_single_block_init(k, bcfg)
          for k in jax.random.split(ks[8], cfg.depth_single)],
    )
    return params


def hunyuan_video_forward(
    params,
    cfg: HunyuanVideoConfig,
    video_latents: jnp.ndarray,  # (B, T, H, W, C)
    txt: jnp.ndarray,  # (B, L, text_states_dim) LLM hidden states
    pooled: jnp.ndarray,  # (B, text_states_dim_2) CLIP pooled
    timestep: jnp.ndarray,  # (B,) in [0, 1]
    guidance: Optional[jnp.ndarray] = None,
    text_mask: Optional[jnp.ndarray] = None,
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    remat: bool = True,
) -> jnp.ndarray:
    """Predict velocity for video latents; returns (B, T, H, W, C)."""
    bcfg = cfg.block_cfg()
    B, T, H, W, C = video_latents.shape
    pt, ph, pw = cfg.patch_size
    assert pt == 1, "temporal patching > 1 not needed for HunyuanVideo"

    # 3D patchify (equivalent to the reference's stride=kernel Conv3d)
    x = video_latents.reshape(B, T, H // ph, ph, W // pw, pw, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        B, T * (H // ph) * (W // pw), ph * pw * C
    )
    x = L.linear(params["img_in"], x.astype(dtype), dtype)

    t_scaled = timestep * 1000.0
    txt_refined = _refine_text(params["txt_in"], cfg, txt, t_scaled, text_mask, dtype)

    vec = L.mlp_embedder(
        params["time_in"], L.timestep_embedding(t_scaled, cfg.time_freq_dim), dtype
    )
    vec = vec + L.mlp_embedder(params["vector_in"], pooled.astype(dtype), dtype)
    if cfg.guidance_embed:
        assert guidance is not None
        vec = vec + L.mlp_embedder(
            params["guidance_in"],
            L.timestep_embedding(guidance * 1000.0, cfg.time_freq_dim), dtype,
        )

    # NOTE: HunyuanVideo applies RoPE to *image tokens only* in single
    # blocks (models.py:346-356); joint order here is [txt | img] like FLUX
    # with zero text ids, which realizes the same rotation.
    ids = np.concatenate([np.zeros((txt.shape[1], 3), np.float32),
                          make_video_ids(T, H, W)])
    rope_cos, rope_sin = rope_tables(ids, cfg.rope_dim_list, cfg.rope_theta)

    # joint key-side mask over [txt | img]: padded text tokens are excluded
    # from attention (use_attention_mask=True path; the reference routes
    # this through flash-attn varlen unpadding, flash_attn_no_pad.py:6-37)
    attn_mask = None
    if text_mask is not None:
        n_img = x.shape[1]
        valid = jnp.concatenate(
            [text_mask.astype(bool),
             jnp.ones((B, n_img), bool)], axis=1,
        )
        attn_mask = valid[:, None, None, :]  # (B, 1, 1, S) key-side

    def double_body(carry, p):
        img_h, txt_h = carry
        img_h, txt_h = _double_block(
            p, bcfg, img_h, txt_h, vec, rope_cos, rope_sin, attn_impl, dtype,
            attn_mask=attn_mask,
        )
        return (img_h, txt_h), None

    def single_body(x_h, p):
        return _single_block(
            p, bcfg, x_h, vec, rope_cos, rope_sin, attn_impl, dtype,
            attn_mask=attn_mask,
        ), None

    if remat:
        double_body = jax.checkpoint(double_body, prevent_cse=False)
        single_body = jax.checkpoint(single_body, prevent_cse=False)

    (x, c), _ = jax.lax.scan(double_body, (x, txt_refined), params["double"])
    joint = jnp.concatenate([c, x], axis=1)
    joint, _ = jax.lax.scan(single_body, joint, params["single"])
    x = joint[:, c.shape[1] :]

    # FinalLayer: shift-first modulation (models.py:650-680)
    shift, scale = L.modulation(params["final_mod"], vec, 2, dtype)
    x = L.modulate(L.layer_norm(x, cfg.eps), shift, scale)
    x = L.linear(params["final_proj"], x, dtype).astype(jnp.float32)

    # unpatchify
    x = x.reshape(B, T, H // ph, W // pw, ph, pw, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, H, W, C)
    return x
