"""BLIP (ViT + BERT-with-cross-attention) for the ImageReward model.

The reference wraps the external ``image-reward`` package
(zqqqqz2000/MixGRPO fastvideo/models/reward_model/image_reward.py:13-41,
``RM.load -> inference_rank``); its backbone is BLIP: a timm-style ViT
image encoder and a BERT text encoder whose every layer cross-attends to
the image tokens (Salesforce BLIP "med" BertModel).  This is a batched JAX
implementation with the original BLIP checkpoint naming.

Structure:
  - ViT: patch conv (16), cls token, learned pos embed, pre-LN blocks
    (fused qkv with bias), final LN; all tokens returned (cross-attn KV).
  - BERT: word+position embeddings with post-LN; each layer =
    self-attention -> cross-attention (KV projected from the 1024-wide
    image tokens) -> gelu MLP, all post-LN residual blocks; CLS pooling.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BlipVisionConfig:
    width: int = 1024
    layers: int = 24
    heads: int = 16
    patch: int = 16
    image_size: int = 224
    mlp_ratio: float = 4.0
    eps: float = 1e-6

    @classmethod
    def vit_large(cls) -> "BlipVisionConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "BlipVisionConfig":
        return cls(width=32, layers=2, heads=2, patch=8, image_size=32)


@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    vocab: int = 30524
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_position: int = 512
    encoder_width: int = 1024  # cross-attention KV input dim
    eps: float = 1e-12

    @classmethod
    def base(cls) -> "BlipTextConfig":
        return cls()

    @classmethod
    def tiny(cls, encoder_width=32) -> "BlipTextConfig":
        return cls(vocab=64, hidden=32, layers=2, heads=2, intermediate=64,
                   max_position=32, encoder_width=encoder_width)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _lin(p, x, dtype):
    y = x.astype(dtype) @ p["w"].astype(dtype)
    return y + p["b"].astype(dtype) if "b" in p else y


def _attn(q, k, v, heads, mask=None):
    b, sq, w = q.shape
    sk = k.shape[1]
    hd = q.shape[-1] // heads
    qh = q.reshape(b, sq, heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, sk, heads, -1).transpose(0, 2, 1, 3)
    vh = v.reshape(b, sk, heads, -1).transpose(0, 2, 1, 3)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    return o.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, sq, -1)


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------


def init_blip_vision(key, cfg: BlipVisionConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 4 + cfg.layers)
    n = (cfg.image_size // cfg.patch) ** 2
    w, mh = cfg.width, int(cfg.width * cfg.mlp_ratio)

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o), jnp.float32) * (i**-0.5),
                "b": jnp.zeros((o,), jnp.float32)}

    def lnp():
        return {"scale": jnp.ones((w,), jnp.float32), "bias": jnp.zeros((w,), jnp.float32)}

    blocks = []
    for i in range(cfg.layers):
        bk = jax.random.split(ks[4 + i], 4)
        blocks.append({
            "norm1": lnp(), "qkv": lin(bk[0], w, 3 * w), "proj": lin(bk[1], w, w),
            "norm2": lnp(), "fc1": lin(bk[2], w, mh), "fc2": lin(bk[3], mh, w),
        })
    return {
        "patch_embed": lin(ks[0], cfg.patch * cfg.patch * 3, w),
        "cls_token": jax.random.normal(ks[1], (w,), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(ks[2], (n + 1, w), jnp.float32) * 0.02,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": lnp(),
    }


def blip_vision_encode(params, cfg: BlipVisionConfig, images, *, dtype=jnp.float32):
    """images: (B, H, W, 3) normalized -> (B, 1+n, width) all tokens."""
    b, H, W, _ = images.shape
    p = cfg.patch
    x = images.reshape(b, H // p, p, W // p, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, (H // p) * (W // p), p * p * 3)
    x = _lin(params["patch_embed"], x, dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(dtype)

    def body(x, bp):
        h = _ln(bp["norm1"], x, cfg.eps)
        qkv = _lin(bp["qkv"], h, dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        x = x + _lin(bp["proj"], _attn(q, k, v, cfg.heads), dtype)
        h = _ln(bp["norm2"], x, cfg.eps)
        x = x + _lin(bp["fc2"], jax.nn.gelu(_lin(bp["fc1"], h, dtype), approximate=False), dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _ln(params["norm"], x, cfg.eps).astype(jnp.float32)


# ---------------------------------------------------------------------------
# BERT with cross-attention (BLIP "med")
# ---------------------------------------------------------------------------


def init_blip_text(key, cfg: BlipTextConfig) -> Dict[str, Any]:
    h, inter, ew = cfg.hidden, cfg.intermediate, cfg.encoder_width
    ks = jax.random.split(key, 3 + cfg.layers)

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o), jnp.float32) * 0.02,
                "b": jnp.zeros((o,), jnp.float32)}

    def lnp(d=h):
        return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}

    blocks = []
    for i in range(cfg.layers):
        bk = jax.random.split(ks[3 + i], 10)
        blocks.append({
            "sa_q": lin(bk[0], h, h), "sa_k": lin(bk[1], h, h), "sa_v": lin(bk[2], h, h),
            "sa_out": lin(bk[3], h, h), "sa_ln": lnp(),
            "ca_q": lin(bk[4], h, h), "ca_k": lin(bk[5], ew, h), "ca_v": lin(bk[6], ew, h),
            "ca_out": lin(bk[7], h, h), "ca_ln": lnp(),
            "ff_in": lin(bk[8], h, inter), "ff_out": lin(bk[9], inter, h),
            "ff_ln": lnp(),
        })
    return {
        "word_emb": jax.random.normal(ks[0], (cfg.vocab, h), jnp.float32) * 0.02,
        "pos_emb": jax.random.normal(ks[1], (cfg.max_position, h), jnp.float32) * 0.02,
        "emb_ln": lnp(),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def blip_text_encode(
    params, cfg: BlipTextConfig, token_ids, attention_mask, image_embeds,
    *, dtype=jnp.float32,
):
    """Multimodal forward -> (B, S, hidden); pool CLS ([:, 0]) downstream."""
    B, S = token_ids.shape
    x = params["word_emb"].astype(dtype)[token_ids]
    x = x + params["pos_emb"].astype(dtype)[:S]
    x = _ln(params["emb_ln"], x, cfg.eps)
    img = image_embeds.astype(dtype)
    mask = attention_mask.astype(bool)

    def body(x, bp):
        # self-attention (post-LN residual)
        q = _lin(bp["sa_q"], x, dtype)
        k = _lin(bp["sa_k"], x, dtype)
        v = _lin(bp["sa_v"], x, dtype)
        a = _lin(bp["sa_out"], _attn(q, k, v, cfg.heads, mask), dtype)
        x = _ln(bp["sa_ln"], x + a, cfg.eps)
        # cross-attention to image tokens
        q = _lin(bp["ca_q"], x, dtype)
        k = _lin(bp["ca_k"], img, dtype)
        v = _lin(bp["ca_v"], img, dtype)
        a = _lin(bp["ca_out"], _attn(q, k, v, cfg.heads), dtype)
        x = _ln(bp["ca_ln"], x + a, cfg.eps)
        # feed-forward
        f = _lin(bp["ff_out"],
                 jax.nn.gelu(_lin(bp["ff_in"], x, dtype), approximate=False), dtype)
        x = _ln(bp["ff_ln"], x + f, cfg.eps)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# weight loading (original BLIP / ImageReward checkpoint naming)
# ---------------------------------------------------------------------------


def load_blip_vision(st: Dict[str, np.ndarray], cfg: BlipVisionConfig, prefix=""):
    g = lambda n: st[prefix + n].astype(np.float32)

    def lin(n):
        return {"w": np.ascontiguousarray(g(f"{n}.weight").T), "b": g(f"{n}.bias")}

    def lnp(n):
        return {"scale": g(f"{n}.weight"), "bias": g(f"{n}.bias")}

    conv = g("patch_embed.proj.weight")  # (w, 3, p, p)
    # our patch embed is a linear over (p, p, 3) patches flattened as
    # x.reshape(..., p*p*3) with (dy, dx, c) order
    w = conv.transpose(2, 3, 1, 0).reshape(-1, conv.shape[0])
    blocks = []
    for i in range(cfg.layers):
        b = f"blocks.{i}"
        blocks.append({
            "norm1": lnp(f"{b}.norm1"), "qkv": lin(f"{b}.attn.qkv"),
            "proj": lin(f"{b}.attn.proj"), "norm2": lnp(f"{b}.norm2"),
            "fc1": lin(f"{b}.mlp.fc1"), "fc2": lin(f"{b}.mlp.fc2"),
        })
    params = {
        "patch_embed": {"w": np.ascontiguousarray(w),
                        "b": g("patch_embed.proj.bias")},
        "cls_token": g("cls_token").reshape(-1),
        "pos_embed": g("pos_embed").reshape(-1, cfg.width),
        "blocks": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks),
        "norm": lnp("norm"),
    }
    return jax.tree.map(jnp.asarray, params)


def load_blip_text(st: Dict[str, np.ndarray], cfg: BlipTextConfig, prefix=""):
    g = lambda n: st[prefix + n].astype(np.float32)

    def lin(n):
        return {"w": np.ascontiguousarray(g(f"{n}.weight").T), "b": g(f"{n}.bias")}

    def lnp(n):
        return {"scale": g(f"{n}.weight"), "bias": g(f"{n}.bias")}

    blocks = []
    for i in range(cfg.layers):
        b = f"encoder.layer.{i}"
        blocks.append({
            "sa_q": lin(f"{b}.attention.self.query"),
            "sa_k": lin(f"{b}.attention.self.key"),
            "sa_v": lin(f"{b}.attention.self.value"),
            "sa_out": lin(f"{b}.attention.output.dense"),
            "sa_ln": lnp(f"{b}.attention.output.LayerNorm"),
            "ca_q": lin(f"{b}.crossattention.self.query"),
            "ca_k": lin(f"{b}.crossattention.self.key"),
            "ca_v": lin(f"{b}.crossattention.self.value"),
            "ca_out": lin(f"{b}.crossattention.output.dense"),
            "ca_ln": lnp(f"{b}.crossattention.output.LayerNorm"),
            "ff_in": lin(f"{b}.intermediate.dense"),
            "ff_out": lin(f"{b}.output.dense"),
            "ff_ln": lnp(f"{b}.output.LayerNorm"),
        })
    params = {
        "word_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "emb_ln": lnp("embeddings.LayerNorm"),
        "blocks": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks),
    }
    return jax.tree.map(jnp.asarray, params)
