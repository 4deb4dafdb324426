"""Int8 weight + dynamic per-token activation quantization for rollouts.

TPU MXUs run int8 x int8 -> int32 matmuls at twice the bf16 rate (v5e:
394 vs 197 TOPS).  The GRPO rollout is inference-only (no gradients,
fastvideo/train_grpo_flux.py:258-271 runs under no_grad) and compute-bound
at FLUX shapes, so an int8 rollout is a pure-throughput TPU lever the
reference's CUDA stack does not have.  Measured on v5e: a
(1536,3072)x(3072,9216) matmul chain *including* on-the-fly per-token
activation quantization runs at 372 TF(mac)/s = 95% of int8 peak = 1.99x
the bf16 rate — the quantize/dequantize VPU work is fully hidden behind
the MXU.

Scheme (weight-only storage, dynamic activations):
  - weights: symmetric per-output-channel int8, scale = max|w|/127 over
    the contraction axis; stacked block weights (L, in, out) quantize to
    (L, in, out) int8 + (L, 1, out) f32 scales, so ``lax.scan`` slicing is
    unchanged.
  - activations: symmetric per-token int8 computed inside the matmul
    (max|x| over the feature axis), accumulate int32, dequantize f32,
    bias in f32, cast to the compute dtype.

Policy-gradient validity: with an int8 rollout the *behavior* policy that
generates trajectories — and whose per-step Gaussian log-probs are stored
as the PPO "old" log-probs — is the quantized network itself, so the
importance ratio new/old stays a correct off-policy correction.  This is
the same situation as the reference's bf16-autocast rollout differing
from its fp32 FSDP master weights, only with a slightly larger policy
perturbation.  The recipe's clip_range is tiny (1e-4); monitor clip_frac
when enabling (``--rollout_quant int8``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# Per-token matmuls that carry ~99% of the forward FLOPs (model.py blocks).
DOUBLE_QUANT_KEYS = (
    "img_qkv", "txt_qkv", "img_attn_out", "txt_attn_out",
    "img_mlp_in", "img_mlp_out", "txt_mlp_in", "txt_mlp_out",
)
SINGLE_QUANT_KEYS = ("linear1", "linear2")


def quantize_weight(w: jnp.ndarray):
    """(…, in, out) f32/bf16 -> int8 weights + f32 scales (…, 1, out)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    w_q = jnp.round(wf / scale).astype(jnp.int8)
    return w_q, scale


def quantize_linear_params(p: Dict[str, Any]) -> Dict[str, Any]:
    """{"w", "b"?} -> {"w_q", "w_s", "b"?} (layers.linear dispatches on w_q)."""
    w_q, w_s = quantize_weight(p["w"])
    out = {"w_q": w_q, "w_s": w_s}
    if "b" in p:
        out["b"] = p["b"]
    return out


def qlinear(p: Dict[str, Any], x: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """int8 MXU matmul with dynamic per-token activation quantization."""
    dtype = dtype or x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.where(amax > 0, amax, 1.0) / 127.0
    xq = jnp.round(xf / xs).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, p["w_q"], (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * xs * p["w_s"]
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def quantize_flux_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize the stacked double/single block matmuls of a FLUX param
    tree (embedders, modulation heads, and norms — negligible per-token
    FLOPs — stay in full precision).  The result drops into
    ``flux_forward`` unchanged: ``layers.linear`` dispatches on ``w_q``.
    """
    out = dict(params)
    d = dict(params["double"])
    for k in DOUBLE_QUANT_KEYS:
        d[k] = quantize_linear_params(d[k])
    s = dict(params["single"])
    for k in SINGLE_QUANT_KEYS:
        s[k] = quantize_linear_params(s[k])
    out["double"], out["single"] = d, s
    return out
