"""Causal 3D VAE (HunyuanVideo) in JAX (NDHWC): encoder + decoder.

Rebuild of zqqqqz2000/MixGRPO fastvideo/models/hunyuan/vae/
{autoencoder_kl_causal_3d.py, unet_causal_3d_blocks.py, vae.py}.
Structure:

  - CausalConv3d: temporal padding (k-1, 0) replicate — frame t sees only
    frames <= t (unet_causal_3d_blocks.py:52-90); spatial SAME padding;
  - decoder: conv_in -> mid (resnet, per-frame spatial attention, resnet)
    -> 4 up blocks (3 resnets each) -> GroupNorm + SiLU -> conv_out;
  - upsampling (vae.py:196-226): spatial 2x in blocks 0-2, temporal 2x in
    blocks 1-2 (4x time / 8x space compression); the *first frame* is
    never temporally duplicated (split (1, T-1) upsample,
    unet_causal_3d_blocks.py:173-186) so T_out = 1 + (T_in - 1) * ratio;
  - encoder (vae.py:28-133): conv_in -> 4 down blocks (2 resnets + strided
    causal-conv downsample; spatial stride 2 in blocks 0-2, temporal
    stride 2 in blocks 1-2) -> mid -> conv_out to 2*latent channels ->
    quant_conv -> DiagonalGaussian posterior
    (autoencoder_kl_causal_3d.py:285-320);
  - decode applies post_quant_conv before the decoder (:344);
  - latent scaling 0.476986 applied by the caller.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CausalVAEConfig:
    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    time_compression_ratio: int = 4
    spatial_compression_ratio: int = 8
    scaling_factor: float = 0.476986

    @classmethod
    def hunyuan_video(cls) -> "CausalVAEConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "CausalVAEConfig":
        return cls(latent_channels=4, block_out_channels=(8, 8, 16, 16),
                   norm_num_groups=4)


def _conv3d_init(key, k, cin, cout):
    scale = (k * k * k * cin) ** -0.5
    return {
        "w": jax.random.uniform(key, (k, k, k, cin, cout), jnp.float32, -scale, scale),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _causal_conv3d(p, x, dtype=None, strides=(1, 1, 1)):
    """x: (B, T, H, W, C); temporal left-pad replicate, spatial SAME.

    ``strides=(t, h, w) > 1`` realizes DownsampleCausal3D
    (unet_causal_3d_blocks.py:208-277): the same causal padding followed by
    a strided conv.  All padding (temporal AND spatial) is replicate —
    F.pad(mode='replicate') over the full (W, H, T) pad tuple
    (unet_causal_3d_blocks.py:70-90)."""
    dtype = dtype or x.dtype
    kt, kh, kw = p["w"].shape[:3]
    xt = jnp.pad(
        x,
        ((0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
        mode="edge",
    ) if (kt > 1 or kh > 1 or kw > 1) else x
    y = jax.lax.conv_general_dilated(
        xt.astype(dtype), p["w"].astype(dtype),
        window_strides=tuple(strides),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return y + p["b"].astype(dtype)


def _gn_init(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _group_norm(p, x, groups, eps=1e-6):
    b, t, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, w, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 3, 5), keepdims=True)
    xf = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _resnet_init(key, cin, cout, groups):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": _gn_init(cin), "conv1": _conv3d_init(k1, 3, cin, cout),
        "norm2": _gn_init(cout), "conv2": _conv3d_init(k2, 3, cout, cout),
    }
    if cin != cout:
        p["shortcut"] = _conv3d_init(k3, 1, cin, cout)
    return p


def _resnet(p, x, groups, dtype):
    h = _causal_conv3d(p["conv1"], jax.nn.silu(_group_norm(p["norm1"], x, groups)), dtype)
    h = _causal_conv3d(p["conv2"], jax.nn.silu(_group_norm(p["norm2"], h, groups)), dtype)
    skip = _causal_conv3d(p["shortcut"], x, dtype) if "shortcut" in p else x
    return skip + h


def _attn_init(key, c):
    ks = jax.random.split(key, 4)
    lin = lambda k: {"w": jax.random.normal(k, (c, c), jnp.float32) * (c**-0.5),
                     "b": jnp.zeros((c,), jnp.float32)}
    return {"norm": _gn_init(c), "q": lin(ks[0]), "k": lin(ks[1]),
            "v": lin(ks[2]), "out": lin(ks[3])}


def _frame_attn(p, x, groups, dtype):
    """Per-frame single-head spatial attention (mid block)."""
    b, t, h, w, c = x.shape
    y = _group_norm(p["norm"], x, groups).reshape(b * t, h * w, c)
    lin = lambda pp, z: z @ pp["w"].astype(z.dtype) + pp["b"].astype(z.dtype)
    q, k, v = lin(p["q"], y), lin(p["k"], y), lin(p["v"], y)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * (c**-0.5), axis=-1).astype(v.dtype)
    o = jnp.einsum("bqk,bkc->bqc", probs, v, preferred_element_type=jnp.float32)
    o = lin(p["out"], o.astype(y.dtype))
    return x + o.reshape(b, t, h, w, c)


def _upsample(x, factor_t: int, factor_s: int):
    """Nearest upsample; the first frame is never temporally duplicated."""
    b, t, h, w, c = x.shape
    if factor_t > 1 and t > 1:
        first, rest = x[:, :1], x[:, 1:]
        first = jax.image.resize(first, (b, 1, h * factor_s, w * factor_s, c), "nearest")
        rest = jax.image.resize(
            rest, (b, (t - 1) * factor_t, h * factor_s, w * factor_s, c), "nearest"
        )
        return jnp.concatenate([first, rest], axis=1)
    return jax.image.resize(x, (b, t, h * factor_s, w * factor_s, c), "nearest")


def _block_upsample_factors(cfg: CausalVAEConfig, bi: int):
    """(spatial, temporal) upsample factors for up-block bi (vae.py:196-226):
    spatial 2x while bi < log2(spatial_ratio); temporal 2x in the last
    log2(time_ratio) non-final blocks."""
    import math

    n = len(cfg.block_out_channels)
    n_spatial = int(math.log2(cfg.spatial_compression_ratio))
    n_time = int(math.log2(cfg.time_compression_ratio))
    is_final = bi == n - 1
    up_s = 2 if bi < n_spatial else 1
    up_t = 2 if (bi >= n - 1 - n_time and not is_final) else 1
    return up_s, up_t


def init_causal_vae_decoder(key, cfg: CausalVAEConfig) -> Dict[str, Any]:
    chans = cfg.block_out_channels
    top = chans[-1]
    g = cfg.norm_num_groups
    ks = jax.random.split(key, 8 + len(chans))
    params: Dict[str, Any] = {
        "conv_in": _conv3d_init(ks[0], 3, cfg.latent_channels, top),
        "mid_res1": _resnet_init(ks[1], top, top, g),
        "mid_attn": _attn_init(ks[2], top),
        "mid_res2": _resnet_init(ks[3], top, top, g),
        "norm_out": _gn_init(chans[0]),
        "conv_out": _conv3d_init(ks[4], 3, chans[0], cfg.out_channels),
    }
    rev = list(reversed(chans))
    blocks = []
    cin = top
    for bi, cout in enumerate(rev):
        bkeys = jax.random.split(ks[5 + bi], cfg.layers_per_block + 2)
        resnets = []
        for li in range(cfg.layers_per_block + 1):
            resnets.append(_resnet_init(bkeys[li], cin, cout, g))
            cin = cout
        up_s, up_t = _block_upsample_factors(cfg, bi)
        blk = {"resnets": resnets}
        if up_s > 1 or up_t > 1:
            blk["upsample"] = _conv3d_init(bkeys[-1], 3, cout, cout)
        blocks.append(blk)
    params["up_blocks"] = blocks
    return params


def load_causal_vae_decoder(path: str, cfg: CausalVAEConfig):
    """Load the reference-format causal-3D VAE decoder checkpoint.

    Naming (autoencoder_kl_causal_3d.py): CausalConv3d wraps nn.Conv3d as a
    ``.conv`` submodule, so conv params live at ``<name>.conv.weight``;
    torch Conv3d weights are (out, in, kt, kh, kw) -> ours (kt, kh, kw, in,
    out)."""
    from mixgrpo_tpu.models.flux.load import load_safetensors_dir

    st = load_safetensors_dir(path)
    conv, gn, resnet, lin = _vae_loader_helpers(st)

    d = "decoder"
    a = f"{d}.mid_block.attentions.0"
    params = {
        "conv_in": conv(f"{d}.conv_in"),
        "mid_res1": resnet(f"{d}.mid_block.resnets.0"),
        "mid_attn": {
            "norm": gn(f"{a}.group_norm"),
            "q": lin(f"{a}.to_q"), "k": lin(f"{a}.to_k"),
            "v": lin(f"{a}.to_v"), "out": lin(f"{a}.to_out.0"),
        },
        "mid_res2": resnet(f"{d}.mid_block.resnets.1"),
        "norm_out": gn(f"{d}.conv_norm_out"),
        "conv_out": conv(f"{d}.conv_out"),
    }
    blocks = []
    for bi in range(len(cfg.block_out_channels)):
        n = f"{d}.up_blocks.{bi}"
        blk = {"resnets": [
            resnet(f"{n}.resnets.{li}")
            for li in range(cfg.layers_per_block + 1)
        ]}
        if f"{n}.upsamplers.0.conv.conv.weight" in st:
            blk["upsample"] = conv(f"{n}.upsamplers.0.conv")
        blocks.append(blk)
    params["up_blocks"] = blocks
    if "post_quant_conv.weight" in st:
        # applied before the decoder (autoencoder_kl_causal_3d.py:344)
        params["post_quant_conv"] = _plain_conv_from(st, "post_quant_conv")
    return jax.tree.map(jnp.asarray, params)


def causal_vae_decode(
    params, cfg: CausalVAEConfig, latents: jnp.ndarray, dtype=jnp.bfloat16
) -> jnp.ndarray:
    """(B, T, h, w, latent_ch) -> (B, 1+(T-1)*4, 8h, 8w, 3) in [-1, 1]."""
    g = cfg.norm_num_groups
    if "post_quant_conv" in params:
        # autoencoder_kl_causal_3d.py:344 (plain 1x1x1 Conv3d)
        latents = _causal_conv3d(params["post_quant_conv"], latents, dtype)
    x = _causal_conv3d(params["conv_in"], latents.astype(dtype))
    x = _resnet(params["mid_res1"], x, g, dtype)
    x = _frame_attn(params["mid_attn"], x, g, dtype)
    x = _resnet(params["mid_res2"], x, g, dtype)
    for bi, blk in enumerate(params["up_blocks"]):
        for rp in blk["resnets"]:
            x = _resnet(rp, x, g, dtype)
        if "upsample" in blk:
            up_s, up_t = _block_upsample_factors(cfg, bi)
            x = _upsample(x, up_t, up_s)
            x = _causal_conv3d(blk["upsample"], x, dtype)
    x = jax.nn.silu(_group_norm(params["norm_out"], x, g))
    return _causal_conv3d(params["conv_out"], x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# tiled decode (autoencoder_kl_causal_3d.py:124-171 enable_tiling +
# spatial_tiled_decode / temporal_tiled_decode)
# ---------------------------------------------------------------------------


def causal_vae_decode_tiled(
    params,
    cfg: CausalVAEConfig,
    latents: jnp.ndarray,  # (B, T, h, w, latent_ch)
    dtype=jnp.bfloat16,
    tile_latent: int = 32,       # 256px sample tiles (tile_latent_min_size)
    tile_latent_t: int = 16,     # 64-frame sample chunks (tile_latent_min_tsize)
    overlap_factor: float = 0.25,
    _decode_fn=None,             # test hook: fake per-chunk decoder
) -> jnp.ndarray:
    """HBM-bounded 3D decode: overlapping spatio-temporal tiles, ramp-blended.

    Parity target: the reference's spatial_tiled_decode +
    temporal_tiled_decode (autoencoder_kl_causal_3d.py, enabled for every
    real video decode via vae.enable_tiling()) with the same tile sizes
    and 25% overlap.  Algorithm shared with the Mochi VAE — see
    ``models/video_tiling.py`` for the TPU-first design notes (static
    full-sized tile grids, one ``lax.map`` decode, ramp-canvas seams,
    causal chunk back-extension)."""
    from mixgrpo_tpu.models.video_tiling import tiled_causal_decode

    decode = _decode_fn or (
        lambda z: causal_vae_decode(params, cfg, z, dtype))
    return tiled_causal_decode(
        decode, latents,
        rt=cfg.time_compression_ratio, rs=cfg.spatial_compression_ratio,
        tile_latent=tile_latent, tile_latent_t=tile_latent_t,
        overlap_factor=overlap_factor)


# ---------------------------------------------------------------------------
# encoder (vae.py:28-133 EncoderCausal3D + autoencoder_kl_causal_3d.py encode)
# ---------------------------------------------------------------------------


def _block_downsample_strides(cfg: CausalVAEConfig, bi: int):
    """(t, h, w) downsample strides for down-block bi (vae.py:62-90):
    spatial stride 2 while bi < log2(spatial_ratio); temporal stride 2 in
    the last log2(time_ratio) non-final blocks."""
    import math

    n = len(cfg.block_out_channels)
    n_spatial = int(math.log2(cfg.spatial_compression_ratio))
    n_time = int(math.log2(cfg.time_compression_ratio))
    is_final = bi == n - 1
    s = 2 if bi < n_spatial else 1
    t = 2 if (bi >= n - 1 - n_time and not is_final) else 1
    return t, s, s


def init_causal_vae_encoder(key, cfg: CausalVAEConfig) -> Dict[str, Any]:
    chans = cfg.block_out_channels
    top = chans[-1]
    g = cfg.norm_num_groups
    ks = jax.random.split(key, 8 + len(chans))
    params: Dict[str, Any] = {
        "conv_in": _conv3d_init(ks[0], 3, cfg.out_channels, chans[0]),
        "mid_res1": _resnet_init(ks[1], top, top, g),
        "mid_attn": _attn_init(ks[2], top),
        "mid_res2": _resnet_init(ks[3], top, top, g),
        "norm_out": _gn_init(top),
        "conv_out": _conv3d_init(ks[4], 3, top, 2 * cfg.latent_channels),
        "quant_conv": _conv3d_init(
            ks[5], 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels
        ),
    }
    blocks = []
    cin = chans[0]
    for bi, cout in enumerate(chans):
        bkeys = jax.random.split(ks[6 + bi], cfg.layers_per_block + 1)
        resnets = []
        for li in range(cfg.layers_per_block):
            resnets.append(_resnet_init(bkeys[li], cin, cout, g))
            cin = cout
        st, ss, _ = _block_downsample_strides(cfg, bi)
        blk = {"resnets": resnets}
        if st > 1 or ss > 1:
            blk["downsample"] = _conv3d_init(bkeys[-1], 3, cout, cout)
        blocks.append(blk)
    params["down_blocks"] = blocks
    return params


def causal_vae_encode(
    params,
    cfg: CausalVAEConfig,
    video: jnp.ndarray,  # (B, T, H, W, 3) in [-1, 1], T = 1 + k*time_ratio
    rng=None,
    *,
    sample: bool = True,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """-> latents (B, 1+(T-1)/4, H/8, W/8, latent_ch), UNscaled.

    DiagonalGaussian posterior: ``sample=True`` draws mean + std*eps
    (needs ``rng``); ``sample=False`` returns the mode (mean) — the
    reference's ``sample_posterior`` switch
    (autoencoder_kl_causal_3d.py:285-320,608-620)."""
    g = cfg.norm_num_groups
    x = _causal_conv3d(params["conv_in"], video.astype(dtype))
    for bi, blk in enumerate(params["down_blocks"]):
        for rp in blk["resnets"]:
            x = _resnet(rp, x, g, dtype)
        if "downsample" in blk:
            x = _causal_conv3d(
                blk["downsample"], x, dtype,
                strides=_block_downsample_strides(cfg, bi),
            )
    x = _resnet(params["mid_res1"], x, g, dtype)
    x = _frame_attn(params["mid_attn"], x, g, dtype)
    x = _resnet(params["mid_res2"], x, g, dtype)
    x = jax.nn.silu(_group_norm(params["norm_out"], x, g))
    moments = _causal_conv3d(params["conv_out"], x).astype(jnp.float32)
    moments = _causal_conv3d(params["quant_conv"], moments)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if not sample:
        return mean
    assert rng is not None, "sampling the posterior needs an rng key"
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def load_causal_vae_encoder(path: str, cfg: CausalVAEConfig):
    """Load the reference-format causal-3D VAE encoder checkpoint
    (``encoder.*`` + ``quant_conv`` names, autoencoder_kl_causal_3d.py)."""
    import numpy as np

    from mixgrpo_tpu.models.flux.load import load_safetensors_dir

    st = load_safetensors_dir(path)
    conv, gn, resnet, lin = _vae_loader_helpers(st)

    e = "encoder"
    a = f"{e}.mid_block.attentions.0"
    params = {
        "conv_in": conv(f"{e}.conv_in"),
        "mid_res1": resnet(f"{e}.mid_block.resnets.0"),
        "mid_attn": {
            "norm": gn(f"{a}.group_norm"),
            "q": lin(f"{a}.to_q"), "k": lin(f"{a}.to_k"),
            "v": lin(f"{a}.to_v"), "out": lin(f"{a}.to_out.0"),
        },
        "mid_res2": resnet(f"{e}.mid_block.resnets.1"),
        "norm_out": gn(f"{e}.conv_norm_out"),
        "conv_out": conv(f"{e}.conv_out"),
        "quant_conv": _plain_conv_from(st, "quant_conv"),
    }
    blocks = []
    for bi in range(len(cfg.block_out_channels)):
        n = f"{e}.down_blocks.{bi}"
        blk = {"resnets": [
            resnet(f"{n}.resnets.{li}") for li in range(cfg.layers_per_block)
        ]}
        if f"{n}.downsamplers.0.conv.conv.weight" in st:
            blk["downsample"] = conv(f"{n}.downsamplers.0.conv")
        blocks.append(blk)
    params["down_blocks"] = blocks
    return jax.tree.map(jnp.asarray, params)


def _plain_conv_from(st, name):
    """Plain nn.Conv3d (quant/post_quant) -> our conv params."""
    import numpy as np

    w = np.asarray(st[f"{name}.weight"], np.float32)
    return {
        "w": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
        "b": np.asarray(st[f"{name}.bias"], np.float32),
    }


def _vae_loader_helpers(st):
    """Shared name-mapping helpers for the causal-VAE loaders."""
    import numpy as np

    def conv(n):
        w = np.asarray(st[f"{n}.conv.weight"], np.float32)
        return {
            "w": np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)),
            "b": np.asarray(st[f"{n}.conv.bias"], np.float32),
        }

    def gn(n):
        return {"scale": np.asarray(st[f"{n}.weight"], np.float32),
                "bias": np.asarray(st[f"{n}.bias"], np.float32)}

    def resnet(n):
        p = {"norm1": gn(f"{n}.norm1"), "conv1": conv(f"{n}.conv1"),
             "norm2": gn(f"{n}.norm2"), "conv2": conv(f"{n}.conv2")}
        if f"{n}.conv_shortcut.conv.weight" in st:
            p["shortcut"] = conv(f"{n}.conv_shortcut")
        return p

    def lin(n):
        return {
            "w": np.ascontiguousarray(np.asarray(st[f"{n}.weight"], np.float32).T),
            "b": np.asarray(st[f"{n}.bias"], np.float32),
        }

    return conv, gn, resnet, lin
