"""Mochi-1 causal 3D VAE decoder in JAX (NDHWC).

The reference decodes Mochi latents through diffusers' AutoencoderKLMochi
(zqqqqz2000/MixGRPO fastvideo/models/mochi_hf/pipeline_mochi.py decode
path); its full parameter inventory is enumerated by the in-repo converter
(convert_diffusers_to_mochi.py:175-449), which this rebuild follows:

  decoder.conv_in (12 -> 768) ->
  decoder.block_in: 3 resnets @768 ->
  decoder.up_blocks.{0,1,2}: [6, 4, 3] resnets + channel-expanding proj,
    depth-to-space-time upsampling 768->512->256->128 with
    (temporal, spatial) expansion (3,2)/(2,2)/(1,2) — total 6x time, 8x
    space; causal alignment drops the first (te-1) expanded frames so
    T_out = 1 + (T_in - 1) * 6 ->
  decoder.block_out: 3 resnets @128 ->
  decoder.proj_out (128 -> 3).

Each resnet is norm -> SiLU -> causal conv3x3x3 -> norm -> SiLU -> causal
conv3x3x3 + residual (channels constant; the converter maps stack indices
0/2/3/5 and never a shortcut).  Norms are per-frame GroupNorm(32)
(MochiChunkedGroupNorm3D: stats over (C, H, W) of each frame).  The
decoder has no attention and no final norm.  Latent (de)normalization is
per-channel (latents.py, mochi_latents_utils.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MochiVAEConfig:
    latent_channels: int = 12
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 768)
    # resnets per stage, innermost block_in first: block_in, up0, up1, up2,
    # block_out
    layers: tuple = (3, 6, 4, 3, 3)
    # (temporal, spatial) expansion per up block (innermost first)
    expansions: tuple = ((3, 2), (2, 2), (1, 2))
    norm_num_groups: int = 32
    temporal_compression: int = 6
    spatial_compression: int = 8

    @classmethod
    def mochi_preview(cls) -> "MochiVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "MochiVAEConfig":
        return cls(latent_channels=4, block_out_channels=(8, 8, 16, 16),
                   layers=(1, 1, 1, 1, 1), norm_num_groups=4)


def _conv_init(key, k, cin, cout):
    scale = (k * k * k * cin) ** -0.5
    return {
        "w": jax.random.uniform(key, (k, k, k, cin, cout), jnp.float32,
                                -scale, scale),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _causal_conv(p, x, dtype=None):
    """Temporal left-pad replicate (k-1, 0); spatial zero SAME padding."""
    dtype = dtype or x.dtype
    kt, kh, kw = p["w"].shape[:3]
    if kt > 1:
        x = jnp.concatenate([jnp.repeat(x[:, :1], kt - 1, axis=1), x], axis=1)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype), window_strides=(1, 1, 1),
        padding=((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(dtype)


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def _frame_group_norm(p, x, groups, eps=1e-5):
    """Per-frame GroupNorm (MochiChunkedGroupNorm3D: (B*T, C, H, W) 2D
    group norm — statistics never cross frames)."""
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    mu = jnp.mean(xf, axis=(2, 3, 5), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 5), keepdims=True)
    xf = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _resnet_init(key, c):
    k1, k2 = jax.random.split(key)
    return {"norm1": _gn_init(c), "conv1": _conv_init(k1, 3, c, c),
            "norm2": _gn_init(c), "conv2": _conv_init(k2, 3, c, c)}


def _resnet(p, x, groups, dtype):
    h = _causal_conv(p["conv1"],
                     jax.nn.silu(_frame_group_norm(p["norm1"], x, groups)),
                     dtype)
    h = _causal_conv(p["conv2"],
                     jax.nn.silu(_frame_group_norm(p["norm2"], h, groups)),
                     dtype)
    return x + h


def _depth_to_spacetime(x, te: int, se: int, cout: int):
    """(B, T, H, W, te*se*se*C) -> (B, T*te - (te-1), H*se, W*se, C).

    Channel split order (te, se_h, se_w, C); the first te-1 expanded frames
    are dropped for causal alignment (the first latent frame decodes to a
    single output frame)."""
    b, t, h, w, _ = x.shape
    x = x.reshape(b, t, h, w, te, se, se, cout)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    x = x.reshape(b, t * te, h * se, w * se, cout)
    return x[:, te - 1 :] if te > 1 else x


def init_mochi_vae_decoder(key, cfg: MochiVAEConfig) -> Dict[str, Any]:
    chans = cfg.block_out_channels
    top = chans[-1]
    ks = jax.random.split(key, 5 + len(cfg.expansions))
    params: Dict[str, Any] = {
        "conv_in": _conv_init(ks[0], 1, cfg.latent_channels, top),
        "block_in": [
            _resnet_init(k, top)
            for k in jax.random.split(ks[1], cfg.layers[0])
        ],
        "block_out": [
            _resnet_init(k, chans[0])
            for k in jax.random.split(ks[2], cfg.layers[-1])
        ],
        "proj_out": _conv_init(ks[3], 1, chans[0], cfg.out_channels),
    }
    ups = []
    cin = top
    for bi, (te, se) in enumerate(cfg.expansions):
        cout = chans[-2 - bi]
        bkeys = jax.random.split(ks[4 + bi], cfg.layers[1 + bi] + 1)
        ups.append({
            "resnets": [
                _resnet_init(bkeys[li], cin) for li in range(cfg.layers[1 + bi])
            ],
            "proj": {
                "w": jax.random.normal(
                    bkeys[-1], (cin, cout * te * se * se), jnp.float32
                ) * (cin**-0.5),
                "b": jnp.zeros((cout * te * se * se,), jnp.float32),
            },
        })
        cin = cout
    params["up_blocks"] = ups
    return params


def mochi_vae_decode(
    params, cfg: MochiVAEConfig, latents: jnp.ndarray, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """(B, T, h, w, 12) DEnormalized latents -> (B, 1+(T-1)*6, 8h, 8w, 3)."""
    g = cfg.norm_num_groups
    x = _causal_conv(params["conv_in"], latents.astype(dtype))
    for rp in params["block_in"]:
        x = _resnet(rp, x, g, dtype)
    for bi, blk in enumerate(params["up_blocks"]):
        for rp in blk["resnets"]:
            x = _resnet(rp, x, g, dtype)
        te, se = cfg.expansions[bi]
        cout = cfg.block_out_channels[-2 - bi]
        x = x @ blk["proj"]["w"].astype(dtype) + blk["proj"]["b"].astype(dtype)
        x = _depth_to_spacetime(x, te, se, cout)
    for rp in params["block_out"]:
        x = _resnet(rp, x, g, dtype)
    return _causal_conv(params["proj_out"], x).astype(jnp.float32)


def mochi_vae_decode_tiled(
    params,
    cfg: MochiVAEConfig,
    latents: jnp.ndarray,  # (B, T, h, w, 12) DEnormalized
    dtype=jnp.bfloat16,
    tile_latent: int = 32,     # 256px sample tiles (diffusers
                               # AutoencoderKLMochi tile_sample_min_* = 256)
    tile_latent_t: int = 16,
    overlap_factor: float = 0.25,
) -> jnp.ndarray:
    """HBM-bounded Mochi decode — parity with the reference pipeline's
    enable_vae_tiling (fastvideo/models/mochi_hf/pipeline_mochi.py:444-457).
    Same frame mapping as the Hunyuan causal VAE (first latent frame -> 1
    output frame), so the shared tiler applies; see
    ``models/video_tiling.py``."""
    from mixgrpo_tpu.models.video_tiling import tiled_causal_decode

    return tiled_causal_decode(
        lambda z: mochi_vae_decode(params, cfg, z, dtype), latents,
        rt=cfg.temporal_compression, rs=cfg.spatial_compression,
        tile_latent=tile_latent, tile_latent_t=tile_latent_t,
        overlap_factor=overlap_factor)


def load_mochi_vae_decoder(path: str, cfg: MochiVAEConfig):
    """Diffusers AutoencoderKLMochi decoder names (enumerated by
    convert_diffusers_to_mochi.py:342-449) -> our pytree."""
    from mixgrpo_tpu.models.flux.load import load_safetensors_dir

    st = load_safetensors_dir(path)

    def conv(n):
        w = np.asarray(st[f"{n}.weight"], np.float32)
        if w.ndim == 2:  # Linear -> 1x1x1 conv
            w = w.T[None, None, None]
        else:  # (out, in, kt, kh, kw)
            w = w.transpose(2, 3, 4, 1, 0)
        return {"w": np.ascontiguousarray(w),
                "b": np.asarray(st[f"{n}.bias"], np.float32)}

    def gn(n):
        return {"scale": np.asarray(st[f"{n}.weight"], np.float32),
                "bias": np.asarray(st[f"{n}.bias"], np.float32)}

    def resnet(n):
        return {"norm1": gn(f"{n}.norm1.norm_layer"),
                "conv1": conv(f"{n}.conv1.conv"),
                "norm2": gn(f"{n}.norm2.norm_layer"),
                "conv2": conv(f"{n}.conv2.conv")}

    def proj(n):
        w = np.asarray(st[f"{n}.weight"], np.float32)
        if w.ndim > 2:
            w = w.reshape(w.shape[0], -1)
        return {"w": np.ascontiguousarray(w.T),
                "b": np.asarray(st[f"{n}.bias"], np.float32)}

    d = "decoder"
    params = {
        "conv_in": conv(f"{d}.conv_in"),
        "block_in": [
            resnet(f"{d}.block_in.resnets.{i}") for i in range(cfg.layers[0])
        ],
        "block_out": [
            resnet(f"{d}.block_out.resnets.{i}")
            for i in range(cfg.layers[-1])
        ],
        "proj_out": conv(f"{d}.proj_out"),
        "up_blocks": [
            {
                "resnets": [
                    resnet(f"{d}.up_blocks.{bi}.resnets.{li}")
                    for li in range(cfg.layers[1 + bi])
                ],
                "proj": proj(f"{d}.up_blocks.{bi}.proj"),
            }
            for bi in range(len(cfg.expansions))
        ],
    }
    return jax.tree.map(jnp.asarray, params)
