"""Mochi-1 asymmetric video DiT in pure-functional JAX.

Rebuild of zqqqqz2000/MixGRPO fastvideo/models/mochi_hf/modeling_mochi.py
(``MochiTransformer3DModel``): 48 asymmetric joint blocks over a 3072-wide
visual stream and a 1536-wide text stream.

Structural parity notes (file:line cite the reference):
  - MochiRMSNormZero modulation: temb -> SiLU -> Linear(dim -> 4*width)
    giving (scale_msa, gate_msa, scale_mlp, gate_mlp); the normed input is
    rmsnorm(x) * (1 + scale) (modeling_mochi.py:327-336,384-402).
  - Joint attention: q/k/v from the visual stream, added k/v projections
    from the 1536-wide text stream up to 3072, per-head RMS qk-norm, RoPE
    on visual tokens only; separate output projections back to each
    stream's width (:344-356, MochiAttnProcessor2_0 at :192-264).
  - Gated residuals through *modulated RMSNorm*: x + rmsnorm(attn_out) *
    tanh(gate) (:414-435).
  - SwiGLU feed-forwards with inner dims (4*dim*2)//3 (:324-325) — the
    reference needs the liger Triton SwiGLU kernel here; on TPU the gate
    multiply fuses into the surrounding matmuls under XLA (measured; a
    Pallas kernel adds nothing for this shape).
  - Continuous RoPE with *learned* per-head frequencies over
    area-normalized (t, h, w) center coordinates (:443-512).
  - Conditioning: timestep embedding + attention-pooled T5 caption
    features; caption tokens projected 4096 -> 1536 for the text stream
    (MochiCombinedTimestepCaptionEmbedding).  The caption pooler is the
    checkpoint-compatible multi-head MochiAttentionPool (masked-mean query
    token over [mean|tokens] keys; weights at time_embed.pooler.to_kv/
    to_q/to_out — see convert_diffusers_to_mochi.py:58-69).
  - final_layer context_pre_only on the last block (text stream gets only
    a modulated norm, no update) (:304-342).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux import layers as L
from mixgrpo_tpu.ops.attention import attention


@dataclasses.dataclass(frozen=True)
class MochiConfig:
    patch_size: int = 2
    num_heads: int = 24
    head_dim: int = 128
    num_layers: int = 48
    in_channels: int = 12
    text_dim: int = 1536  # pooled_projection_dim (text stream width)
    text_embed_dim: int = 4096  # T5 features in
    time_freq_dim: int = 256
    pool_heads: int = 8  # MochiAttentionPool num_attention_heads
    max_text_len: int = 256
    base_height: int = 192
    base_width: int = 192
    eps: float = 1e-6

    @property
    def dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def ff_inner(self) -> int:
        return (4 * self.dim * 2) // 3

    @property
    def ff_context_inner(self) -> int:
        return (4 * self.text_dim * 2) // 3

    @classmethod
    def mochi_preview(cls) -> "MochiConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "MochiConfig":
        return cls(num_heads=2, head_dim=16, num_layers=2, in_channels=4,
                   text_dim=24, text_embed_dim=48, time_freq_dim=32,
                   max_text_len=8)


def _rms(x, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype)


def _swiglu(p_in, p_out, x, dtype):
    """SwiGLU FF: (silu(x W_g) * (x W_u)) W_o — fused proj [gate|up]."""
    h = L.linear(p_in, x, dtype)
    gate, up = jnp.split(h, 2, axis=-1)
    return L.linear(p_out, jax.nn.silu(gate) * up, dtype)


def mochi_positions(t: int, h: int, w: int, base_area: int) -> np.ndarray:
    """Area-normalized (t, h, w) center coordinates (modeling_mochi.py:457-482)."""
    scale = (base_area / (h * w)) ** 0.5

    def centers(start, stop, num):
        e = np.linspace(start, stop, num + 1, dtype=np.float32)
        return (e[:-1] + e[1:]) / 2

    tt = np.arange(t, dtype=np.float32)
    hh = centers(-h * scale / 2, h * scale / 2, h)
    ww = centers(-w * scale / 2, w * scale / 2, w)
    gt, gh, gw = np.meshgrid(tt, hh, ww, indexing="ij")
    return np.stack([gt, gh, gw], axis=-1).reshape(-1, 3)


def mochi_rope(pos_frequencies: jnp.ndarray, pos: jnp.ndarray):
    """Learned continuous RoPE: freqs[n,h,f] = pos[n,:] . W[:,h,f]."""
    freqs = jnp.einsum(
        "nd,dhf->nhf", jnp.asarray(pos, jnp.float32),
        pos_frequencies.astype(jnp.float32),
    )
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_mochi_rope(x, cos, sin):
    """x: (B, H, S, D); cos/sin: (S, H, D/2); adjacent-pair rotation."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xp = xf.reshape(*xf.shape[:-1], -1, 2)
    x_even, x_odd = xp[..., 0], xp[..., 1]
    c = cos.transpose(1, 0, 2)[None]  # (1, H, S, D/2)
    s = sin.transpose(1, 0, 2)[None]
    out_even = x_even * c - x_odd * s
    out_odd = x_odd * c + x_even * s
    return jnp.stack([out_even, out_odd], axis=-1).reshape(xf.shape).astype(dtype)


# ---------------------------------------------------------------------------


def _block_init(key, cfg: MochiConfig, context_pre_only: bool):
    d, td = cfg.dim, cfg.text_dim
    ks = jax.random.split(key, 12)
    nb = lambda k, i, o: {"w": jax.random.normal(k, (i, o), jnp.float32) * (i**-0.5)}
    p = {
        "mod_x": {"lin": L.linear_init(ks[0], d, 4 * d)},
        "qkv": nb(ks[1], d, 3 * d),
        "add_kv": nb(ks[2], td, 2 * d),
        "qnorm": jnp.ones((cfg.head_dim,), jnp.float32),
        "knorm": jnp.ones((cfg.head_dim,), jnp.float32),
        "add_knorm": jnp.ones((cfg.head_dim,), jnp.float32),
        "attn_out": nb(ks[3], d, d),
        "ff_in": nb(ks[4], d, 2 * cfg.ff_inner),
        "ff_out": nb(ks[5], cfg.ff_inner, d),
    }
    if context_pre_only:
        # LayerNormContinuous: scale + shift only (modeling_mochi.py:338-342)
        p["mod_c"] = {"lin": L.linear_init(ks[6], d, 2 * td)}
    else:
        p["mod_c"] = {"lin": L.linear_init(ks[6], d, 4 * td)}
        p["add_q"] = nb(ks[7], td, d)
        p["add_qnorm"] = jnp.ones((cfg.head_dim,), jnp.float32)
        p["attn_out_c"] = nb(ks[8], d, td)
        p["ff_c_in"] = nb(ks[9], td, 2 * cfg.ff_context_inner)
        p["ff_c_out"] = nb(ks[10], cfg.ff_context_inner, td)
    return p


def _mochi_block(p, cfg: MochiConfig, x, c, temb, rope_cos, rope_sin,
                 context_pre_only, attn_impl, dtype):
    H, eps = cfg.num_heads, cfg.eps
    sx_msa, gx_msa, sx_mlp, gx_mlp = L.modulation(p["mod_x"], temb, 4, dtype)
    xn = _rms(x, eps) * (1.0 + sx_msa[:, None, :])

    if context_pre_only:
        # LayerNormContinuous-style: scale+shift, no gates (:338-342)
        sc, sh = L.modulation(p["mod_c"], temb, 2, dtype)
        cn = _rms(c, eps) * (1.0 + sc[:, None, :]) + sh[:, None, :]
    else:
        sc_msa, gc_msa, sc_mlp, gc_mlp = L.modulation(p["mod_c"], temb, 4, dtype)
        cn = _rms(c, eps) * (1.0 + sc_msa[:, None, :])

    q, k, v = jnp.split(L.linear(p["qkv"], xn, dtype), 3, axis=-1)
    split = lambda t: t.reshape(t.shape[0], t.shape[1], H, -1).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    q = L.rms_norm(q, p["qnorm"], eps)
    k = L.rms_norm(k, p["knorm"], eps)
    q = _apply_mochi_rope(q, rope_cos, rope_sin)
    k = _apply_mochi_rope(k, rope_cos, rope_sin)

    ck, cv = jnp.split(L.linear(p["add_kv"], cn, dtype), 2, axis=-1)
    ck, cv = split(ck), split(cv)
    ck = L.rms_norm(ck, p["add_knorm"], eps)
    if not context_pre_only:
        cq = split(L.linear(p["add_q"], cn, dtype))
        cq = L.rms_norm(cq, p["add_qnorm"], eps)
        q = jnp.concatenate([q, cq], axis=2)
    k = jnp.concatenate([k, ck], axis=2)
    v = jnp.concatenate([v, cv], axis=2)

    o = attention(q, k, v, impl=attn_impl)
    Lx = x.shape[1]
    ox = o[:, :, :Lx].transpose(0, 2, 1, 3).reshape(x.shape[0], Lx, cfg.dim)
    x = x + _rms(L.linear(p["attn_out"], ox, dtype), eps) * jnp.tanh(
        gx_msa
    )[:, None, :]
    xn2 = _rms(x, eps) * (1.0 + sx_mlp[:, None, :])
    x = x + _rms(_swiglu(p["ff_in"], p["ff_out"], xn2, dtype), eps) * jnp.tanh(
        gx_mlp
    )[:, None, :]

    if not context_pre_only:
        oc = o[:, :, Lx:].transpose(0, 2, 1, 3).reshape(c.shape[0], c.shape[1], cfg.dim)
        c = c + _rms(L.linear(p["attn_out_c"], oc, dtype), eps) * jnp.tanh(
            gc_msa
        )[:, None, :]
        cn2 = _rms(c, eps) * (1.0 + sc_mlp[:, None, :])
        c = c + _rms(
            _swiglu(p["ff_c_in"], p["ff_c_out"], cn2, dtype), eps
        ) * jnp.tanh(gc_mlp)[:, None, :]
    return x, c


def _attention_pool(p, txt, text_mask, num_heads: int, dtype):
    """MochiAttentionPool (diffusers embeddings; loaded from
    time_embed.pooler.*): prepend the masked-mean token, use it as the
    single query, multi-head attention over the 1+L keys, project to the
    conditioning width."""
    B, Lt, D = txt.shape
    x = txt.astype(jnp.float32)
    if text_mask is not None:
        m = text_mask.astype(jnp.float32)
    else:
        m = jnp.ones((B, Lt), jnp.float32)
    mean = jnp.einsum("bl,bld->bd", m, x) / jnp.maximum(
        jnp.sum(m, axis=1, keepdims=True), 1.0
    )
    x = jnp.concatenate([mean[:, None], x], axis=1)  # (B, 1+L, D)
    kv = L.linear(p["to_kv"], x.astype(dtype), dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    q = L.linear(p["to_q"], x[:, 0].astype(dtype), dtype)  # (B, D)
    hd = D // num_heads
    k = k.reshape(B, 1 + Lt, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, 1 + Lt, num_heads, hd).transpose(0, 2, 1, 3)
    q = q.reshape(B, num_heads, 1, hd)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (hd**-0.5)
    key_valid = jnp.concatenate([jnp.ones((B, 1), jnp.float32), m], axis=1)
    logits = jnp.where(
        key_valid[:, None, None, :] > 0, logits, jnp.finfo(jnp.float32).min
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    )
    o = o.reshape(B, D).astype(dtype)
    return L.linear(p["to_out"], o, dtype)


def init_mochi(key, cfg: MochiConfig) -> Dict[str, Any]:
    d, td = cfg.dim, cfg.text_dim
    ks = jax.random.split(key, 8 + cfg.num_layers)
    pe = cfg.patch_size * cfg.patch_size * cfg.in_channels
    # blocks 0..N-2 share a structure and are stacked for lax.scan; the
    # final block (context_pre_only) differs and stays separate
    body_blocks = [
        _block_init(k, cfg, context_pre_only=False) for k in ks[8:-1]
    ]
    te = cfg.text_embed_dim
    params = {
        "patch_embed": L.linear_init(ks[0], pe, d),
        "time_in": L.mlp_embedder_init(ks[1], cfg.time_freq_dim, d),
        # MochiAttentionPool (diffusers layout: time_embed.pooler.to_kv/
        # to_q/to_out; convert_diffusers_to_mochi.py:58-69): masked-mean
        # token as the single query, multi-head attention over [mean|tokens]
        "pooler": {
            "to_kv": L.linear_init(ks[2], te, 2 * te),
            "to_q": L.linear_init(jax.random.fold_in(ks[2], 1), te, te),
            "to_out": L.linear_init(ks[3], te, d),
        },
        "caption_proj": L.linear_init(ks[4], cfg.text_embed_dim, td),
        "pos_frequencies": jax.random.normal(
            ks[5], (3, cfg.num_heads, cfg.head_dim // 2), jnp.float32
        ) * 0.02,
        "final_mod": L.modulation_init(ks[6], d, 2),
        "proj_out": L.linear_init(ks[7], d, pe),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *body_blocks),
        "final_block": _block_init(ks[-1], cfg, context_pre_only=True),
    }
    return params


def mochi_forward(
    params,
    cfg: MochiConfig,
    video_latents: jnp.ndarray,  # (B, T, H, W, C)
    txt: jnp.ndarray,  # (B, L, text_embed_dim) T5 features
    timestep: jnp.ndarray,  # (B,)
    text_mask: Optional[jnp.ndarray] = None,
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "xla",
    remat: bool = True,
) -> jnp.ndarray:
    B, T, Hh, Ww, C = video_latents.shape
    ps = cfg.patch_size
    x = video_latents.reshape(B, T, Hh // ps, ps, Ww // ps, ps, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        B, T * (Hh // ps) * (Ww // ps), ps * ps * C
    )
    x = L.linear(params["patch_embed"], x.astype(dtype), dtype)

    # combined timestep + attention-pooled caption conditioning
    temb = L.mlp_embedder(
        params["time_in"],
        L.timestep_embedding(timestep * 1000.0, cfg.time_freq_dim), dtype,
    )
    temb = temb + _attention_pool(
        params["pooler"], txt, text_mask, cfg.pool_heads, dtype
    )

    c = L.linear(params["caption_proj"], txt.astype(dtype), dtype)

    pos = mochi_positions(T, Hh // ps, Ww // ps, cfg.base_height * cfg.base_width)
    rope_cos, rope_sin = mochi_rope(params["pos_frequencies"], pos)

    def body(carry, bp):
        xh, ch = carry
        xh, ch = _mochi_block(
            bp, cfg, xh, ch, temb, rope_cos, rope_sin, False, attn_impl, dtype
        )
        return (xh, ch), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    (x, c), _ = jax.lax.scan(body, (x, c), params["blocks"])

    final = lambda xh, ch: _mochi_block(
        params["final_block"], cfg, xh, ch, temb, rope_cos, rope_sin,
        True, attn_impl, dtype,
    )
    if remat:
        final = jax.checkpoint(final, prevent_cse=False)
    x, c = final(x, c)

    scale, shift = L.modulation(params["final_mod"], temb, 2, dtype)
    x = L.modulate(L.layer_norm(x, cfg.eps), shift, scale)
    x = L.linear(params["proj_out"], x, dtype).astype(jnp.float32)
    x = x.reshape(B, T, Hh // ps, Ww // ps, ps, ps, C)
    return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, Hh, Ww, C)
