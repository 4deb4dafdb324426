"""Generic CLIP (vision + text towers) in pure-functional JAX.

One implementation serves all three CLIP-family reward models of the
reference (SURVEY.md §2.1 / fastvideo/models/reward_model/):
  - HPSv2.1  — OpenCLIP ViT-H-14 + HPS checkpoint (hps_score.py:9-78)
  - PickScore — HF CLIP ViT-H (yuvalkirstain/PickScore_v1, pick_score.py)
  - CLIP-score — DFN5B ViT-H-14-384 (clip_score.py)
plus the CLIP-L text encoder used for FLUX pooled embeddings.

Architecture: standard CLIP — ViT with class token + learned positional
embeddings, pre/post LN, GELU (or quick-GELU) MLPs; text transformer with
causal mask, features taken at the argmax token id (EOT) position; both
projected to a shared embedding space.

TPU-first: batched towers (the reference scores one image at a time in a
Python loop, hps_score.py:66-78 etc.); fp32 LN statistics, bf16 matmuls;
attention through ops.attention (Pallas on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from mixgrpo_tpu.models.flux import layers as L
from mixgrpo_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class CLIPTowerConfig:
    width: int
    layers: int
    heads: int
    # vision-only
    patch: int = 14
    image_size: int = 224
    # text-only
    vocab: int = 49408
    context: int = 77

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    vision: CLIPTowerConfig
    text: CLIPTowerConfig
    quick_gelu: bool = False
    eps: float = 1e-5

    @classmethod
    def vit_h_14(cls, image_size: int = 224) -> "CLIPConfig":
        """laion/DFN/HPS ViT-H-14 geometry."""
        return cls(
            embed_dim=1024,
            vision=CLIPTowerConfig(width=1280, layers=32, heads=16, patch=14,
                                   image_size=image_size),
            text=CLIPTowerConfig(width=1024, layers=24, heads=16),
        )

    @classmethod
    def vit_l_14(cls) -> "CLIPConfig":
        """OpenAI CLIP-L (the FLUX pooled-text encoder geometry)."""
        return cls(
            embed_dim=768,
            vision=CLIPTowerConfig(width=1024, layers=24, heads=16, patch=14),
            text=CLIPTowerConfig(width=768, layers=12, heads=12),
            quick_gelu=True,
        )

    @classmethod
    def tiny(cls) -> "CLIPConfig":
        return cls(
            embed_dim=16,
            vision=CLIPTowerConfig(width=32, layers=2, heads=2, patch=8,
                                   image_size=32),
            text=CLIPTowerConfig(width=32, layers=2, heads=2, vocab=64,
                                 context=16),
        )


# ---------------------------------------------------------------------------


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _block_init(key, width):
    ks = jax.random.split(key, 4)
    return {
        "ln1": _ln_init(width),
        "qkv": L.linear_init(ks[0], width, 3 * width),
        "out": L.linear_init(ks[1], width, width),
        "ln2": _ln_init(width),
        "fc1": L.linear_init(ks[2], width, 4 * width),
        "fc2": L.linear_init(ks[3], 4 * width, width),
    }


def _act(x, quick: bool):
    if quick:
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _block(p, x, heads, causal, cfg: CLIPConfig, dtype):
    b, s, w = x.shape
    h = _ln(p["ln1"], x, cfg.eps)
    qkv = L.linear(p["qkv"], h, dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda t: t.reshape(b, s, heads, -1).transpose(0, 2, 1, 3)
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
    o = attention(sh(q), sh(k), sh(v), mask=mask, impl="xla")
    o = o.transpose(0, 2, 1, 3).reshape(b, s, w)
    x = x + L.linear(p["out"], o, dtype)
    h = _ln(p["ln2"], x, cfg.eps)
    x = x + L.linear(p["fc2"], _act(L.linear(p["fc1"], h, dtype), cfg.quick_gelu), dtype)
    return x


def init_clip(key, cfg: CLIPConfig) -> Dict[str, Any]:
    kv, kt, k1, k2, k3, k4 = jax.random.split(key, 6)
    v, t = cfg.vision, cfg.text
    n_patches = (v.image_size // v.patch) ** 2
    vision = {
        "patch_embed": {
            "w": jax.random.normal(k1, (v.patch, v.patch, 3, v.width), jnp.float32)
            * 0.02
        },
        "class_emb": jax.random.normal(k2, (v.width,), jnp.float32) * 0.02,
        "pos_emb": jax.random.normal(k3, (n_patches + 1, v.width), jnp.float32) * 0.02,
        "ln_pre": _ln_init(v.width),
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_block_init(k, v.width) for k in jax.random.split(kv, v.layers)],
        ),
        "ln_post": _ln_init(v.width),
        "proj": jax.random.normal(k4, (v.width, cfg.embed_dim), jnp.float32)
        * v.width**-0.5,
    }
    ks = jax.random.split(kt, 4)
    text = {
        "token_emb": jax.random.normal(ks[0], (t.vocab, t.width), jnp.float32) * 0.02,
        "pos_emb": jax.random.normal(ks[1], (t.context, t.width), jnp.float32) * 0.01,
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_block_init(k, t.width) for k in jax.random.split(ks[2], t.layers)],
        ),
        "ln_final": _ln_init(t.width),
        "proj": jax.random.normal(ks[3], (t.width, cfg.embed_dim), jnp.float32)
        * t.width**-0.5,
    }
    return {
        "vision": vision,
        "text": text,
        "logit_scale": jnp.asarray(2.6592, jnp.float32),  # ln(1/0.07)
    }


def clip_image_features(
    params, cfg: CLIPConfig, images, *, dtype=jnp.float32, normalize=True
):
    """images: (B, H, W, 3) already resized + CLIP-normalized."""
    v = cfg.vision
    p = params["vision"]
    x = jax.lax.conv_general_dilated(
        images.astype(dtype), p["patch_embed"]["w"].astype(dtype),
        window_strides=(v.patch, v.patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = x.shape[0]
    x = x.reshape(b, -1, v.width)
    cls = jnp.broadcast_to(p["class_emb"].astype(dtype), (b, 1, v.width))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_emb"].astype(dtype)
    x = _ln(p["ln_pre"], x, cfg.eps)

    def body(x, bp):
        return _block(bp, x, v.heads, False, cfg, dtype), None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    pooled = _ln(p["ln_post"], x[:, 0], cfg.eps)
    feats = pooled @ p["proj"].astype(dtype)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats.astype(jnp.float32)


def clip_text_features(
    params, cfg: CLIPConfig, token_ids, *, dtype=jnp.float32, normalize=True,
    project=True,
):
    """token_ids: (B, context) int32; EOT position = argmax token id.

    ``project=False`` returns the final-LN EOT hidden state (the HF
    ``pooler_output`` that FLUX uses as its pooled conditioning) instead of
    the projected embedding.
    """
    t = cfg.text
    p = params["text"]
    x = p["token_emb"].astype(dtype)[token_ids] + p["pos_emb"].astype(dtype)

    def body(x, bp):
        return _block(bp, x, t.heads, True, cfg, dtype), None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    x = _ln(p["ln_final"], x, cfg.eps)
    eot = jnp.argmax(token_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot]
    if not project:
        return pooled.astype(jnp.float32)
    feats = pooled @ p["proj"].astype(dtype)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats.astype(jnp.float32)
