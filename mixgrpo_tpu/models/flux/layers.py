"""Primitive layers for the FLUX MMDiT (pure-functional, param pytrees).

Structural parity targets: the FLUX.1-dev ``FluxTransformer2DModel``
architecture as characterized in SURVEY.md §2.6 via the reference's in-tree
MMDiT exemplar (zqqqqz2000/MixGRPO
fastvideo/models/hunyuan/modules/models.py:23-369: adaLN modulation factors
6/3, fused QKV, per-head-dim RMS QK-norm, GELU-tanh MLP, gated residuals).

Conventions:
  - Params are fp32 master weights; ``apply`` casts to a compute dtype
    (bf16 on TPU) at the matmul inputs, mirroring the reference's fp32-FSDP
    + bf16-autocast recipe (fastvideo/utils/fsdp_util.py:56-66).
  - Weight matrices are stored as (in, out) so forward is ``x @ w`` with
    no transpose (HF linear weights are (out, in); the loader transposes).
  - LayerNorms inside blocks have no learnable affine (eps 1e-6); RMS
    QK-norm has a per-head-dim scale.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True):
    kw, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"w": jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -scale, scale)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def linear(p, x, dtype=None):
    dtype = dtype or x.dtype
    if "w_q" in p:  # int8-quantized weights (ops/quant.py) — MXU int8 path
        from mixgrpo_tpu.ops.quant import qlinear

        return qlinear(p, x, dtype)
    y = x.astype(dtype) @ p["w"].astype(dtype)
    if "b" in p:
        y = y + p["b"].astype(dtype)
    return y


def layer_norm(x, eps: float = 1e-6):
    """Non-affine LayerNorm computed in fp32."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def rms_norm(x, scale, eps: float = 1e-6):
    """RMSNorm with learnable scale, fp32 accumulation (QK-norm)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(x.dtype) * scale.astype(x.dtype)


def gelu_tanh(x):
    return jax.nn.gelu(x, approximate=True)


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, flip_sin_to_cos=True, freq shift 0: [cos | sin].

    ``t`` is the raw conditioning value; FLUX scales (t, guidance) by 1000
    before embedding (reference passes timesteps/1000 into the model which
    rescales — fastvideo/utils/sampling_utils.py:64-71).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    angle = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(angle), jnp.sin(angle)], axis=-1)


def mlp_embedder_init(key, in_dim: int, hidden: int):
    k1, k2 = jax.random.split(key)
    return {
        "in": linear_init(k1, in_dim, hidden),
        "out": linear_init(k2, hidden, hidden),
    }


def mlp_embedder(p, x, dtype):
    return linear(p["out"], jax.nn.silu(linear(p["in"], x, dtype)), dtype)


def modulation_init(key, hidden: int, factor: int):
    """adaLN modulation head: vec -> SiLU -> Linear(hidden -> factor*hidden)."""
    return {"lin": linear_init(key, hidden, factor * hidden)}


def modulation(p, vec, factor: int, dtype):
    out = linear(p["lin"], jax.nn.silu(vec.astype(dtype)), dtype)
    return jnp.split(out, factor, axis=-1)


def modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]
