"""T5 v1.1 encoder in pure-functional JAX (the FLUX T5-XXL text encoder).

Counterpart of the reference's offline prompt encoding through diffusers
``FluxPipeline.encode_prompt`` (zqqqqz2000/MixGRPO
fastvideo/data_preprocess/preprocess_flux_embedding.py:83-91): T5-XXL
produces the (512, 4096) sequence embeddings consumed by the trainer's
embedding cache.

Architecture (google/t5-v1_1-xxl encoder): RMSNorm pre-norm blocks,
relative-position-bucket attention bias (learned per head, shared from
block 0), no q-scaling, gated-GELU feed-forward, no biases anywhere.

TPU-first: blocks stacked + ``lax.scan``; the (S, S) relative-position
bias is computed once per sequence length outside the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab: int = 32128
    d_model: int = 4096
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    head_dim: int = 64
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab=128, d_model=32, d_ff=64, num_layers=2, num_heads=2,
                   head_dim=16, rel_buckets=8, rel_max_distance=16)


def _rms_init(d):
    return jnp.ones((d,), jnp.float32)


def _rms(scale, x, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * scale.astype(x.dtype)


def _dense_init(key, i, o):
    return jax.random.normal(key, (i, o), jnp.float32) * (i**-0.5)


def _block_init(key, cfg: T5Config):
    inner = cfg.num_heads * cfg.head_dim
    ks = jax.random.split(key, 7)
    return {
        "ln_attn": _rms_init(cfg.d_model),
        "q": _dense_init(ks[0], cfg.d_model, inner),
        "k": _dense_init(ks[1], cfg.d_model, inner),
        "v": _dense_init(ks[2], cfg.d_model, inner),
        "o": _dense_init(ks[3], inner, cfg.d_model),
        "ln_ff": _rms_init(cfg.d_model),
        "wi_0": _dense_init(ks[4], cfg.d_model, cfg.d_ff),
        "wi_1": _dense_init(ks[5], cfg.d_model, cfg.d_ff),
        "wo": _dense_init(ks[6], cfg.d_ff, cfg.d_model),
    }


def init_t5(key, cfg: T5Config) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    return {
        "token_emb": jax.random.normal(ks[0], (cfg.vocab, cfg.d_model), jnp.float32),
        "rel_bias": jax.random.normal(
            ks[1], (cfg.rel_buckets, cfg.num_heads), jnp.float32
        ) * 0.02,
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_block_init(k, cfg) for k in jax.random.split(ks[2], cfg.num_layers)],
        ),
        "final_ln": _rms_init(cfg.d_model),
    }


def _relative_buckets(relative_position, num_buckets, max_distance):
    """T5 bidirectional relative-position bucketing (HF parity)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


def relative_position_bias(params, cfg: T5Config, seq_len: int) -> jnp.ndarray:
    """(1, heads, S, S) additive attention bias."""
    ctx = jnp.arange(seq_len)[:, None]
    mem = jnp.arange(seq_len)[None, :]
    buckets = _relative_buckets(mem - ctx, cfg.rel_buckets, cfg.rel_max_distance)
    bias = params["rel_bias"][buckets]  # (S, S, H)
    return bias.transpose(2, 0, 1)[None]


def t5_encode(
    params,
    cfg: T5Config,
    token_ids: jnp.ndarray,  # (B, S) int32
    attention_mask: jnp.ndarray | None = None,  # (B, S) 1 = keep
    *,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Encoder forward -> (B, S, d_model) float32."""
    B, S = token_ids.shape
    H, hd = cfg.num_heads, cfg.head_dim
    x = params["token_emb"].astype(dtype)[token_ids]
    bias = relative_position_bias(params, cfg, S).astype(jnp.float32)
    if attention_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        bias = bias + jnp.where(attention_mask, 0.0, neg)[:, None, None, :]

    def body(x, p):
        h = _rms(p["ln_attn"], x, cfg.eps)
        q = (h @ p["q"].astype(dtype)).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        k = (h @ p["k"].astype(dtype)).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        v = (h @ p["v"].astype(dtype)).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        # T5: no 1/sqrt(d) scaling; additive relative bias
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(dtype)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, H * hd)
        x = x + o @ p["o"].astype(dtype)

        h = _rms(p["ln_ff"], x, cfg.eps)
        # T5 v1.1 "gated-gelu" uses the tanh approximation (HF gelu_new)
        gate = jax.nn.gelu(h @ p["wi_0"].astype(dtype), approximate=True)
        x = x + (gate * (h @ p["wi_1"].astype(dtype))) @ p["wo"].astype(dtype)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _rms(params["final_ln"], x, cfg.eps).astype(jnp.float32)


def load_t5_hf(state: Dict[str, np.ndarray], cfg: T5Config):
    """Map HF ``T5EncoderModel`` names onto our pytree."""
    st = {k.removeprefix("encoder."): v for k, v in state.items()}
    get = lambda n: np.ascontiguousarray(st[n].astype(np.float32))

    blocks = []
    for i in range(cfg.num_layers):
        b = f"block.{i}.layer"
        blocks.append({
            "ln_attn": get(f"{b}.0.layer_norm.weight"),
            "q": get(f"{b}.0.SelfAttention.q.weight").T,
            "k": get(f"{b}.0.SelfAttention.k.weight").T,
            "v": get(f"{b}.0.SelfAttention.v.weight").T,
            "o": get(f"{b}.0.SelfAttention.o.weight").T,
            "ln_ff": get(f"{b}.1.layer_norm.weight"),
            "wi_0": get(f"{b}.1.DenseReluDense.wi_0.weight").T,
            "wi_1": get(f"{b}.1.DenseReluDense.wi_1.weight").T,
            "wo": get(f"{b}.1.DenseReluDense.wo.weight").T,
        })
    emb_key = "shared.weight" if "shared.weight" in st else "embed_tokens.weight"
    params = {
        "token_emb": get(emb_key),
        "rel_bias": get(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "blocks": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks),
        "final_ln": get("final_layer_norm.weight"),
    }
    return jax.tree.map(jnp.asarray, params)
