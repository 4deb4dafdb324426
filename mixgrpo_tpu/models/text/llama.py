"""Llama-3-style decoder LLM as a hidden-state text encoder, in pure JAX.

TPU-native rebuild of the HunyuanVideo "llm" text encoder
(zqqqqz2000/MixGRPO fastvideo/models/hunyuan/text_encoder/__init__.py:30-37,
265-315): a decoder-only LLM (llava-llama-3-8b's text tower) run with
``output_hidden_states`` and read at ``hidden_states[-(skip+1)]``
(HunyuanVideo uses hidden_state_skip_layer=2), the instruction-template
prefix then cropped off (crop_start).

Architecture (HF ``LlamaModel``): RMSNorm pre-norm, rotary embeddings,
grouped-query attention (n_kv_heads < n_heads), SwiGLU MLP, final RMSNorm.

TPU-first: blocks stacked + ``lax.scan``; the skip-layer read slices the
stacked params (static depth) instead of materializing every layer's
hidden states.  Causal + key-padding masking is a single additive bias
computed once outside the scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab: int = 128320
    d_model: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    d_ff: int = 14336
    rope_theta: float = 500000.0
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @classmethod
    def llava_llama3_8b(cls) -> "LlamaConfig":
        """Text tower of xtuner/llava-llama-3-8b-v1_1 (HunyuanVideo LLM)."""
        return cls()

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        return cls(vocab=128, d_model=32, n_layers=4, n_heads=4, n_kv_heads=2,
                   d_ff=64, rope_theta=10000.0)


def _rms(scale, x, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * scale.astype(x.dtype)


def _dense_init(key, i, o):
    return jax.random.normal(key, (i, o), jnp.float32) * (i**-0.5)


def _block_init(key, cfg: LlamaConfig):
    hd = cfg.head_dim
    ks = jax.random.split(key, 7)
    return {
        "ln_attn": jnp.ones((cfg.d_model,), jnp.float32),
        "q": _dense_init(ks[0], cfg.d_model, cfg.n_heads * hd),
        "k": _dense_init(ks[1], cfg.d_model, cfg.n_kv_heads * hd),
        "v": _dense_init(ks[2], cfg.d_model, cfg.n_kv_heads * hd),
        "o": _dense_init(ks[3], cfg.n_heads * hd, cfg.d_model),
        "ln_mlp": jnp.ones((cfg.d_model,), jnp.float32),
        "gate": _dense_init(ks[4], cfg.d_model, cfg.d_ff),
        "up": _dense_init(ks[5], cfg.d_model, cfg.d_ff),
        "down": _dense_init(ks[6], cfg.d_ff, cfg.d_model),
    }


def init_llama(key, cfg: LlamaConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 2)
    return {
        "token_emb": jax.random.normal(
            ks[0], (cfg.vocab, cfg.d_model), jnp.float32
        ) * 0.02,
        "blocks": jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_block_init(k, cfg) for k in jax.random.split(ks[1], cfg.n_layers)],
        ),
        "final_ln": jnp.ones((cfg.d_model,), jnp.float32),
    }


def _rope_tables(cfg: LlamaConfig, seq_len: int):
    """(S, hd/2) cos/sin tables, HF Llama convention (half-split rotate)."""
    hd = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv)  # (S, hd/2)
    return (
        jnp.asarray(np.cos(freqs), jnp.float32),
        jnp.asarray(np.sin(freqs), jnp.float32),
    )


def _apply_rope(x, cos, sin):
    """x: (B, H, S, hd); HF rotate_half: [x1|x2] -> [x1*c - x2*s | x2*c + x1*s]."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    c = cos[None, None, :, :].astype(x.dtype)
    s = sin[None, None, :, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def llama_hidden_states(
    params,
    cfg: LlamaConfig,
    token_ids: jnp.ndarray,  # (B, S) int32
    attention_mask: Optional[jnp.ndarray] = None,  # (B, S) 1 = keep
    *,
    hidden_state_skip_layer: int = 0,
    apply_final_norm: bool = False,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Decoder forward -> (B, S, d_model) float32 hidden states.

    ``hidden_state_skip_layer=k`` returns HF ``hidden_states[-(k+1)]``:
    k=0 is the final-norm output (``last_hidden_state``); k>0 is the raw
    output of layer ``n_layers - k`` (normed only if ``apply_final_norm``,
    matching text_encoder/__init__.py:303-311).
    """
    B, S = token_ids.shape
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    x = params["token_emb"].astype(dtype)[token_ids]
    cos, sin = _rope_tables(cfg, S)

    neg = jnp.finfo(jnp.float32).min
    causal = jnp.tril(jnp.ones((S, S), bool))
    bias = jnp.where(causal, 0.0, neg)[None, None]  # (1, 1, S, S)
    if attention_mask is not None:
        bias = bias + jnp.where(attention_mask, 0.0, neg)[:, None, None, :]

    def body(x, p):
        h = _rms(p["ln_attn"], x, cfg.eps)
        q = (h @ p["q"].astype(dtype)).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
        k = (h @ p["k"].astype(dtype)).reshape(B, S, KV, hd).transpose(0, 2, 1, 3)
        v = (h @ p["v"].astype(dtype)).reshape(B, S, KV, hd).transpose(0, 2, 1, 3)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        # GQA: repeat kv heads to full head count
        rep = H // KV
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5) + bias
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(dtype)
        o = o.transpose(0, 2, 1, 3).reshape(B, S, H * hd)
        x = x + o @ p["o"].astype(dtype)

        h = _rms(p["ln_mlp"], x, cfg.eps)
        gate = jax.nn.silu(h @ p["gate"].astype(dtype))
        x = x + (gate * (h @ p["up"].astype(dtype))) @ p["down"].astype(dtype)
        return x, None

    skip = int(hidden_state_skip_layer)
    assert 0 <= skip <= cfg.n_layers, skip
    n_run = cfg.n_layers - skip
    blocks = (
        params["blocks"] if skip == 0
        else jax.tree.map(lambda b: b[:n_run], params["blocks"])
    )
    x, _ = jax.lax.scan(body, x, blocks)
    if skip == 0 or apply_final_norm:
        x = _rms(params["final_ln"], x, cfg.eps)
    return x.astype(jnp.float32)


def load_llama_hf(state: Dict[str, np.ndarray], cfg: LlamaConfig):
    """Map HF ``LlamaModel`` names onto our pytree.

    Accepts both bare (``layers.N...``) and prefixed
    (``model.layers.N...`` / ``language_model.model.layers.N...``) names —
    the HunyuanVideo checkpoint ships the llava text tower.
    """
    st = {}
    for k, v in state.items():
        k = k.removeprefix("language_model.")
        k = k.removeprefix("model.")
        st[k] = v
    get = lambda n: np.ascontiguousarray(np.asarray(st[n], np.float32))

    blocks = []
    for i in range(cfg.n_layers):
        b = f"layers.{i}"
        blocks.append({
            "ln_attn": get(f"{b}.input_layernorm.weight"),
            "q": get(f"{b}.self_attn.q_proj.weight").T,
            "k": get(f"{b}.self_attn.k_proj.weight").T,
            "v": get(f"{b}.self_attn.v_proj.weight").T,
            "o": get(f"{b}.self_attn.o_proj.weight").T,
            "ln_mlp": get(f"{b}.post_attention_layernorm.weight"),
            "gate": get(f"{b}.mlp.gate_proj.weight").T,
            "up": get(f"{b}.mlp.up_proj.weight").T,
            "down": get(f"{b}.mlp.down_proj.weight").T,
        })
    params = {
        "token_emb": get("embed_tokens.weight"),
        "blocks": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *blocks),
        "final_ln": get("norm.weight"),
    }
    return jax.tree.map(jnp.asarray, params)
