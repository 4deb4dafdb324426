"""Attention dispatch: XLA reference path and Pallas TPU flash kernel.

This is the TPU-native replacement for the reference's FlashAttention-2
CUDA dependency (zqqqqz2000/MixGRPO fastvideo/models/flash_attn_no_pad.py:
unpad -> flash_attn_varlen_qkvpacked_func -> repad).  The MMDiT joint
text+image sequence here has *static* shape (512 text + packed image
tokens), so no varlen unpadding is needed; optional segment masking covers
padded text tokens.

Backends:
  - "xla":    jnp einsum with fp32 softmax — reference implementation and
              CPU/test path.  XLA already fuses this well on TPU.
  - "pallas": blockwise online-softmax flash kernel (ops/flash_attention.py)
              keeping the S x S score matrix out of HBM.
  - "auto":   pallas on TPU when shapes allow, else xla.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, mask=None, scale=None, layout="bhsd"):
    """q, k, v: (B, H, S, D) — or (B, S, H, D) with ``layout="bshd"``.
    Returns the same layout.  fp32 softmax."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d**0.5)
    qk = "bqhd,bkhd->bhqk" if layout == "bshd" else "bhqd,bhkd->bhqk"
    pv = "bhqk,bkhd->bqhd" if layout == "bshd" else "bhqk,bhkd->bhqd"
    logits = jnp.einsum(qk, q, k, preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum(
        pv, probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


def _on_tpu() -> bool:
    try:
        plat = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend
        return False
    return plat in ("tpu", "axon")


def attention(q, k, v, mask=None, impl: str = "auto", layout: str = "bhsd",
              kv_valid=None):
    """Bidirectional scaled dot-product attention over (B, H, S, D) — or
    (B, S, H, D) with ``layout="bshd"`` (the FLUX fast path: the packed
    qkv projection's head split becomes a free reshape; the Pallas kernel
    gathers per-head tiles with strided DMAs instead of the program
    paying (B,S,H*D) -> (B,H,S,D) relayout transposes).

    ``mask``: optional (B, 1|H, S, S) or (S, S) boolean, True = attend.
    ``kv_valid``: static int — only the first ``kv_valid`` keys are
    valid (the contiguous-prefix mask of lane-alignment padding); folds
    into the Pallas kernel's alignment comparison (within ~5% of the
    bias-mask representation — see flash_attention) and never enters
    the traced program as an operand.  Mutually exclusive with
    ``mask``.
    The SP impls (ulysses/ring) operate natively on (B, H, S, D); bshd
    inputs are converted at this boundary (SP is off by default, as in
    the reference).
    """
    if kv_valid is not None:
        assert mask is None, "mask and kv_valid are mutually exclusive"
        if int(kv_valid) >= k.shape[2 if layout == "bhsd" else 1]:
            kv_valid = None  # nothing masked
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    with jax.named_scope(f"mmdit_attention_{impl}"):
        if impl in ("ulysses", "ring"):
            if kv_valid is not None:
                # the SP impls shard keys across chips — hand them the
                # equivalent explicit mask instead of a prefix count
                Sk = k.shape[2 if layout == "bhsd" else 1]
                mask = (jnp.arange(Sk) < kv_valid)[None, None, None, :]
                kv_valid = None
            if layout == "bshd":
                out = attention(
                    q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), mask=mask, impl=impl,
                )
                return out.transpose(0, 2, 1, 3)
            from mixgrpo_tpu.parallel.ulysses import get_sp_context

            ctx = get_sp_context()
            assert ctx is not None, f"attention(impl={impl!r}) needs set_sp_context"
            mesh, axis = ctx
            if impl == "ring":
                from mixgrpo_tpu.parallel.ring import ring_attention

                return ring_attention(q, k, v, mesh, axis, mask=mask)
            from mixgrpo_tpu.parallel.ulysses import ulysses_attention

            base = "pallas" if _on_tpu() else "xla"
            return ulysses_attention(q, k, v, mesh, axis, base_impl=base, mask=mask)
        if impl == "pallas":
            from mixgrpo_tpu.ops.flash_attention import flash_attention

            return flash_attention(q, k, v, mask=mask, layout=layout,
                                   kv_valid=kv_valid)
        if kv_valid is not None:
            Sk = k.shape[2 if layout == "bhsd" else 1]
            mask = (jnp.arange(Sk) < kv_valid)[None, None, None, :]
        return _xla_attention(q, k, v, mask=mask, layout=layout)
