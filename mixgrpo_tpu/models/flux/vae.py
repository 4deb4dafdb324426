"""FLUX AutoencoderKL decoder in pure-functional JAX (NHWC).

Rebuild target (SURVEY.md §2.2): the reference decodes rollout latents with
diffusers ``AutoencoderKL`` (zqqqqz2000/MixGRPO
fastvideo/train_grpo_flux.py:697-701, decode at :284-289 — 8x spatial
upsample, 16-ch latents, scale/shift 0.3611/0.1159 applied by the caller).

Architecture (FLUX.1-dev VAE config): decoder-only here (the RL pipeline
never encodes — prompts come from the embedding cache and rollouts start
from noise).  conv_in 16->512, mid block (resnet, single-head spatial
attention, resnet), four up blocks of 3 resnets each at channels
(512, 512, 256, 128) with nearest-2x upsampling between, GroupNorm(32) +
SiLU head, conv_out -> RGB.  No post-quant conv (FLUX uses shift/scale
latent normalization instead).

TPU-first: channel-last layout, fp32 GroupNorm statistics, bf16 convs; the
whole decode jits to one fused program — the reference needs VAE tiling on
GPU (train_grpo_flux.py:279), unnecessary here at 512-1024px.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159

    @classmethod
    def flux_dev(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def tiny(cls, **kw) -> "VAEConfig":
        d = dict(block_out_channels=(8, 16, 16, 32), norm_num_groups=4)
        d.update(kw)
        return cls(**d)


def _conv_init(key, kh, kw, cin, cout):
    scale = 1.0 / (kh * kw * cin) ** 0.5
    return {
        "w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -scale, scale),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _conv(p, x, stride=1, dtype=None):
    dtype = dtype or x.dtype
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(dtype)


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _group_norm(p, x, groups, eps=1e-6):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _resnet_init(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin),
        "conv1": _conv_init(k1, 3, 3, cin, cout),
        "norm2": _gn_init(cout),
        "conv2": _conv_init(k2, 3, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _conv_init(k3, 1, 1, cin, cout)
    return p


def _resnet(p, x, groups, dtype):
    h = _group_norm(p["norm1"], x, groups)
    h = _conv(p["conv1"], jax.nn.silu(h), dtype=dtype)
    h = _group_norm(p["norm2"], h, groups)
    h = _conv(p["conv2"], jax.nn.silu(h), dtype=dtype)
    skip = _conv(p["shortcut"], x, dtype=dtype) if "shortcut" in p else x
    return skip + h


def _attn_init(key, c):
    ks = jax.random.split(key, 4)
    lin = lambda k: {
        "w": jax.random.normal(k, (c, c), jnp.float32) * (c**-0.5),
        "b": jnp.zeros((c,), jnp.float32),
    }
    return {"norm": _gn_init(c), "q": lin(ks[0]), "k": lin(ks[1]),
            "v": lin(ks[2]), "out": lin(ks[3])}


def _spatial_attn(p, x, groups, dtype):
    """Single-head attention over the H*W token grid (VAE mid block)."""
    b, h, w, c = x.shape
    y = _group_norm(p["norm"], x, groups).reshape(b, h * w, c)
    q = y @ p["q"]["w"].astype(y.dtype) + p["q"]["b"].astype(y.dtype)
    k = y @ p["k"]["w"].astype(y.dtype) + p["k"]["b"].astype(y.dtype)
    v = y @ p["v"]["w"].astype(y.dtype) + p["v"]["b"].astype(y.dtype)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v, preferred_element_type=jnp.float32)
    o = o.astype(y.dtype) @ p["out"]["w"].astype(y.dtype) + p["out"]["b"].astype(y.dtype)
    return x + o.reshape(b, h, w, c)


def init_vae_decoder(key, cfg: VAEConfig) -> Dict[str, Any]:
    chans = cfg.block_out_channels
    top = chans[-1]
    ks = jax.random.split(key, 8 + len(chans))
    params: Dict[str, Any] = {
        "conv_in": _conv_init(ks[0], 3, 3, cfg.latent_channels, top),
        "mid_res1": _resnet_init(ks[1], top, top),
        "mid_attn": _attn_init(ks[2], top),
        "mid_res2": _resnet_init(ks[3], top, top),
        "norm_out": _gn_init(chans[0]),
        "conv_out": _conv_init(ks[4], 3, 3, chans[0], cfg.out_channels),
    }
    # up blocks run top-down: reversed channels (512, 512, 256, 128)
    rev = list(reversed(chans))
    blocks = []
    cin = top
    for bi, cout in enumerate(rev):
        bkeys = jax.random.split(ks[5 + bi], cfg.layers_per_block + 2)
        resnets = []
        for li in range(cfg.layers_per_block + 1):
            resnets.append(_resnet_init(bkeys[li], cin, cout))
            cin = cout
        blk = {"resnets": resnets}
        if bi < len(rev) - 1:
            blk["upsample"] = _conv_init(bkeys[-1], 3, 3, cout, cout)
        blocks.append(blk)
    params["up_blocks"] = blocks
    return params


def vae_decode(
    params: Dict[str, Any],
    cfg: VAEConfig,
    latents: jnp.ndarray,  # (B, h, w, latent_channels), *normalized*
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Decode normalized latents to images in [-1, 1], (B, 8h, 8w, 3).

    The caller un-normalizes first (latents / 0.3611 + 0.1159,
    ``denormalize_latents`` — parity with train_grpo_flux.py:287).
    """
    g = cfg.norm_num_groups
    x = _conv(params["conv_in"], latents.astype(dtype))
    x = _resnet(params["mid_res1"], x, g, dtype)
    x = _spatial_attn(params["mid_attn"], x, g, dtype)
    x = _resnet(params["mid_res2"], x, g, dtype)
    n_blocks = len(params["up_blocks"])
    for bi, blk in enumerate(params["up_blocks"]):
        for rp in blk["resnets"]:
            x = _resnet(rp, x, g, dtype)
        if bi < n_blocks - 1:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
            x = _conv(blk["upsample"], x)
    x = _group_norm(params["norm_out"], x, g)
    x = _conv(params["conv_out"], jax.nn.silu(x))
    return x.astype(jnp.float32)


def postprocess_images(images: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1], clipped (diffusers VaeImageProcessor.postprocess)."""
    return jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)


# ---------------------------------------------------------------------------
# tiled decode (HBM-bounded decode for 1024px+ / large batches)
# ---------------------------------------------------------------------------


def _tile_starts(size: int, tile: int, stride: int) -> list:
    """Evenly spaced tile starts covering [0, size), all full-sized.

    Unlike diffusers' fixed-stride grid with a short final tile
    (AutoencoderKL.tiled_decode, referenced by
    fastvideo/train_grpo_flux.py:279-289 via vae.enable_tiling()), every
    tile here is the same shape so one compiled decode serves the whole
    grid — the TPU way (static shapes, single trace under lax.map).
    """
    if size <= tile:
        return [0]
    n = -(-(size - tile) // stride) + 1  # ceil div
    # spread the n starts evenly over [0, size - tile]
    return [round(i * (size - tile) / (n - 1)) for i in range(n)]


def _ramp_weight(tile_px: int, blend: int, first: bool, last: bool):
    """1D blend profile: linear 0->1 ramp over the overlap, flat inside.

    Canvas-border sides stay at weight 1 (nothing to blend against)."""
    w = jnp.ones((tile_px,), jnp.float32)
    ramp = (jnp.arange(blend, dtype=jnp.float32) + 1.0) / float(blend + 1)
    if not first:
        w = w.at[:blend].set(ramp)
    if not last:
        w = w.at[-blend:].set(ramp[::-1])
    return w


def vae_decode_tiled(
    params: Dict[str, Any],
    cfg: VAEConfig,
    latents: jnp.ndarray,  # (B, h, w, latent_channels), *normalized*
    dtype=jnp.bfloat16,
    tile_latent: int = 64,
    overlap_factor: float = 0.25,
) -> jnp.ndarray:
    """Memory-bounded decode: overlapping latent tiles, ramp-blended seams.

    Parity target: diffusers ``AutoencoderKL.tiled_decode`` (the reference
    enables it on GPU — fastvideo/train_grpo_flux.py:279-289 — to survive
    1024px decodes).  Same tile size (64 latent / 512 px) and overlap
    (25%); the blend is a symmetric weighted average over linear ramps
    rather than diffusers' asymmetric pairwise blend_v/blend_h — seam-free
    by the same argument, but order-independent.

    TPU-first: the tile grid is static, every tile is full-sized (the
    grid is evenly spaced instead of diffusers' short final tile), and
    the per-tile decode runs under ``lax.map`` — one trace, one compiled
    decoder, peak activation memory of a single 512px tile instead of the
    full image.  Output is accumulated on an fp32 canvas and normalized
    by the accumulated weight.
    """
    b, h, w, c = latents.shape
    if h <= tile_latent and w <= tile_latent:
        return vae_decode(params, cfg, latents, dtype)
    stride = max(1, int(tile_latent * (1.0 - overlap_factor)))
    ys = _tile_starts(h, tile_latent, stride)
    xs = _tile_starts(w, tile_latent, stride)
    th = min(tile_latent, h)
    tw = min(tile_latent, w)
    tiles = jnp.stack(
        [latents[:, y : y + th, x : x + tw, :] for y in ys for x in xs]
    )  # (T, B, th, tw, C)

    dec = jax.lax.map(lambda t: vae_decode(params, cfg, t, dtype), tiles)

    px_h, px_w = 8 * th, 8 * tw
    blend_h_px = max(1, int(px_h * overlap_factor))
    blend_w_px = max(1, int(px_w * overlap_factor))
    canvas = jnp.zeros((b, 8 * h, 8 * w, 3), jnp.float32)
    weight = jnp.zeros((1, 8 * h, 8 * w, 1), jnp.float32)
    t = 0
    for yi, y in enumerate(ys):
        wy = _ramp_weight(px_h, blend_h_px, yi == 0, yi == len(ys) - 1)
        for xi, x in enumerate(xs):
            wx = _ramp_weight(px_w, blend_w_px, xi == 0, xi == len(xs) - 1)
            wt = (wy[:, None] * wx[None, :])[None, :, :, None]
            canvas = canvas.at[:, 8 * y : 8 * y + px_h,
                               8 * x : 8 * x + px_w, :].add(dec[t] * wt)
            weight = weight.at[:, 8 * y : 8 * y + px_h,
                               8 * x : 8 * x + px_w, :].add(wt)
            t += 1
    return canvas / weight


# ---------------------------------------------------------------------------
# encoder (completes the AutoencoderKL; the RL pipeline itself only decodes)
# ---------------------------------------------------------------------------


def init_vae_encoder(key, cfg: VAEConfig) -> Dict[str, Any]:
    chans = cfg.block_out_channels
    top = chans[-1]
    ks = jax.random.split(key, 8 + len(chans))
    params: Dict[str, Any] = {
        "conv_in": _conv_init(ks[0], 3, 3, 3, chans[0]),
        "mid_res1": _resnet_init(ks[1], top, top),
        "mid_attn": _attn_init(ks[2], top),
        "mid_res2": _resnet_init(ks[3], top, top),
        "norm_out": _gn_init(top),
        # 2x latent channels: (mean | logvar)
        "conv_out": _conv_init(ks[4], 3, 3, top, 2 * cfg.latent_channels),
    }
    blocks = []
    cin = chans[0]
    for bi, cout in enumerate(chans):
        bkeys = jax.random.split(ks[5 + bi], cfg.layers_per_block + 2)
        resnets = []
        for li in range(cfg.layers_per_block):
            resnets.append(_resnet_init(bkeys[li], cin, cout))
            cin = cout
        blk = {"resnets": resnets}
        if bi < len(chans) - 1:
            blk["downsample"] = _conv_init(bkeys[-1], 3, 3, cout, cout)
        blocks.append(blk)
    params["down_blocks"] = blocks
    return params


def _downsample(p, x, dtype):
    """Stride-2 conv with diffusers' asymmetric (0,1,0,1) padding."""
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), p["w"].astype(dtype),
        window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(dtype)


def vae_encode(
    params: Dict[str, Any],
    cfg: VAEConfig,
    images: jnp.ndarray,  # (B, H, W, 3) in [-1, 1]
    rng=None,
    dtype=jnp.bfloat16,
    sample: bool = True,
) -> jnp.ndarray:
    """Encode images -> *normalized* latents (B, H/8, W/8, latent_channels).

    Applies the FLUX posterior sampling plus the (z - shift) * scaling
    normalization (inverse of ``denormalize_latents``)."""
    g = cfg.norm_num_groups
    x = _conv(params["conv_in"], images.astype(dtype))
    n_blocks = len(params["down_blocks"])
    for bi, blk in enumerate(params["down_blocks"]):
        for rp in blk["resnets"]:
            x = _resnet(rp, x, g, dtype)
        if bi < n_blocks - 1:
            x = _downsample(blk["downsample"], x, dtype)
    x = _resnet(params["mid_res1"], x, g, dtype)
    x = _spatial_attn(params["mid_attn"], x, g, dtype)
    x = _resnet(params["mid_res2"], x, g, dtype)
    x = _group_norm(params["norm_out"], x, g)
    x = _conv(params["conv_out"], jax.nn.silu(x)).astype(jnp.float32)
    mean, logvar = jnp.split(x, 2, axis=-1)
    if sample:
        assert rng is not None, "posterior sampling needs an rng"
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jax.random.normal(rng, mean.shape, jnp.float32)
    else:
        z = mean
    from mixgrpo_tpu.models.flux.latents import VAE_SCALING, VAE_SHIFT

    return (z - VAE_SHIFT) * VAE_SCALING
