"""FLUX.1-style MMDiT policy model, pure-functional JAX.

Rebuild target #1 (SURVEY.md §2.2): the diffusers ``FluxTransformer2DModel``
policy used by the reference trainer (zqqqqz2000/MixGRPO
fastvideo/train_grpo_flux.py:58,677-692).  Architecture pinned by the
reference's in-tree MMDiT exemplar (fastvideo/models/hunyuan/modules/
models.py:23-369,620-680 — double/single stream blocks, adaLN factors 6/3,
RoPE over (id, h, w) ids, guidance embedding) and FLUX.1-dev HF config:
hidden 3072, 24 heads x 128, 19 double + 38 single blocks, in 64 channels
(16 latent ch x 2x2 packing), axes_dims (16, 56, 56), guidance-distilled.

TPU-first design choices (vs the reference's per-block Python modules):
  - The 19 double and 38 single blocks are **stacked** along a leading axis
    and executed with ``lax.scan`` — one traced block body each, small HLO,
    fast compiles, and a natural remat boundary per block
    (``jax.checkpoint`` when ``remat=True``, replacing torch selective
    activation checkpointing, fastvideo/utils/fsdp_util.py:26-53).
  - RoPE cos/sin tables are precomputed per resolution outside the rollout
    scan and passed in (the reference recomputes them inside every forward).
  - QKV/MLP projections for the single blocks are fused into one matmul
    (matching the exemplar's fused linear1/linear2, models.py:280-284).
  - fp32 master params, bf16 compute; softmax/norm statistics in fp32.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mixgrpo_tpu.models.flux import layers as L
from mixgrpo_tpu.models.flux.rope import apply_rope
from mixgrpo_tpu.ops.attention import attention
from mixgrpo_tpu.parallel.sharding import constrain_attn, constrain_residual


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    hidden_size: int = 3072
    num_heads: int = 24
    depth_double: int = 19
    depth_single: int = 38
    mlp_ratio: float = 4.0
    axes_dims: tuple = (16, 56, 56)
    pooled_dim: int = 768
    context_dim: int = 4096
    guidance_embeds: bool = True
    time_freq_dim: int = 256
    theta: float = 10000.0
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @classmethod
    def flux_dev(cls) -> "FluxConfig":
        return cls()

    @classmethod
    def tiny(cls, **kw) -> "FluxConfig":
        """Small config for tests/benchmarks (structure-identical)."""
        d = dict(
            in_channels=16, hidden_size=128, num_heads=4, depth_double=2,
            depth_single=4, pooled_dim=32, context_dim=64,
            axes_dims=(8, 12, 12), time_freq_dim=32,
        )
        d.update(kw)
        return cls(**d)


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------


def _double_block_init(key, cfg: FluxConfig) -> Dict[str, Any]:
    h, hd = cfg.hidden_size, cfg.head_dim
    ks = jax.random.split(key, 12)
    return {
        "img_mod": L.modulation_init(ks[0], h, 6),
        "txt_mod": L.modulation_init(ks[1], h, 6),
        "img_qkv": L.linear_init(ks[2], h, 3 * h),
        "txt_qkv": L.linear_init(ks[3], h, 3 * h),
        "img_qnorm": jnp.ones((hd,), jnp.float32),
        "img_knorm": jnp.ones((hd,), jnp.float32),
        "txt_qnorm": jnp.ones((hd,), jnp.float32),
        "txt_knorm": jnp.ones((hd,), jnp.float32),
        "img_attn_out": L.linear_init(ks[4], h, h),
        "txt_attn_out": L.linear_init(ks[5], h, h),
        "img_mlp_in": L.linear_init(ks[6], h, cfg.mlp_hidden),
        "img_mlp_out": L.linear_init(ks[7], cfg.mlp_hidden, h),
        "txt_mlp_in": L.linear_init(ks[8], h, cfg.mlp_hidden),
        "txt_mlp_out": L.linear_init(ks[9], cfg.mlp_hidden, h),
    }


def _single_block_init(key, cfg: FluxConfig) -> Dict[str, Any]:
    h, hd, mh = cfg.hidden_size, cfg.head_dim, cfg.mlp_hidden
    ks = jax.random.split(key, 3)
    return {
        "mod": L.modulation_init(ks[0], h, 3),
        # fused [qkv | mlp_in] and [attn_out | mlp_out]
        "linear1": L.linear_init(ks[1], h, 3 * h + mh),
        "linear2": L.linear_init(ks[2], h + mh, h),
        "qnorm": jnp.ones((hd,), jnp.float32),
        "knorm": jnp.ones((hd,), jnp.float32),
    }


def init_flux(key, cfg: FluxConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 10)
    h = cfg.hidden_size
    params = {
        "x_embedder": L.linear_init(ks[0], cfg.in_channels, h),
        "context_embedder": L.linear_init(ks[1], cfg.context_dim, h),
        "time_in": L.mlp_embedder_init(ks[2], cfg.time_freq_dim, h),
        "vector_in": L.mlp_embedder_init(ks[3], cfg.pooled_dim, h),
        "final_mod": L.modulation_init(ks[5], h, 2),
        "proj_out": L.linear_init(ks[6], h, cfg.in_channels),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = L.mlp_embedder_init(ks[4], cfg.time_freq_dim, h)

    dkeys = jax.random.split(ks[7], cfg.depth_double)
    skeys = jax.random.split(ks[8], cfg.depth_single)
    params["double"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_double_block_init(k, cfg) for k in dkeys]
    )
    params["single"] = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_single_block_init(k, cfg) for k in skeys]
    )
    return params


# ----------------------------------------------------------------------------
# blocks
# ----------------------------------------------------------------------------


# test hook: force the modular-gather virtual-depth path even when the
# cycle count divides the stack depth (parity tests gather vs nested scan)
_FORCE_GATHER = False

# divisible-count virtual depth uses the hand-written cycle_scan VJP
# (utils/cycle_scan.py): dense in-place block-gradient accumulation
# instead of the nested-scan transpose's DUS-materialize + whole-stack
# add (195 ms/update-iter in the 512px profile).  Env-gated for A/B.
_CYCLE_VJP = os.environ.get("MIXGRPO_CYCLE_VJP", "1") != "0"

# unroll factor for the modular-gather virtual-depth scan (round-5 probe
# knob, scripts/probe_cycle_layout.py): unrolling lets XLA overlap the
# next application's weight gather with the current one's compute.
_GATHER_UNROLL = int(os.environ.get("MIXGRPO_GATHER_UNROLL", "1"))

# attention activation layout (env-gated for A/B):
#   bhsd (default) — head-major (B, H, S, D) via explicit split/merge
#       transposes around the attention kernel.
#   bshd — q/k/v stay (B, S, H, D): the head split off the packed qkv
#       projection is a free reshape and the flash kernel's block DMAs
#       gather per-head lane-column tiles directly (ops/flash_attention.py
#       layout docs).  Removes every (B,S,H*D) <-> (B,H,S,D) transpose
#       from the block — but measured round 5 it is a small NET LOSS at
#       the model level (512px same-session A/B: update 2.47 vs 2.40 s,
#       rollout 6.74 vs 6.61 s/group-2): the per-call cost of the strided
#       per-head DMAs exceeds what the transposes actually cost inside
#       XLA's fusion schedule.  Kept as a tested mode; see PERF.md
#       round-5 notes for the full numbers.
_ATTN_LAYOUT = os.environ.get("MIXGRPO_ATTN_LAYOUT", "bhsd")


def _split_heads(x, num_heads):
    b, s, _ = x.shape
    if _ATTN_LAYOUT == "bshd":
        return x.reshape(b, s, num_heads, -1)  # (B,S,H,D) — free
    return x.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)  # (B,H,S,D)


def _merge_heads(x):
    if _ATTN_LAYOUT == "bshd":
        b, s, h, d = x.shape
        return x.reshape(b, s, h * d)  # free
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def _seq_axis() -> int:
    """The sequence axis of split-head q/k/v under the active layout."""
    return 1 if _ATTN_LAYOUT == "bshd" else 2


def _rope_tables_for_layout(cos, sin):
    """(S, D) tables broadcast against (B,H,S,D) as-is; (B,S,H,D) needs an
    explicit singleton head axis so S aligns with the tokens."""
    if _ATTN_LAYOUT == "bshd":
        return cos[:, None, :], sin[:, None, :]
    return cos, sin


def _qk_norm(q, k, qscale, kscale, eps):
    return L.rms_norm(q, qscale, eps), L.rms_norm(k, kscale, eps)


def _double_block(p, cfg: FluxConfig, img, txt, vec, rope_cos, rope_sin,
                  attn_impl, dtype, attn_valid=None, attn_mask=None):
    """Double-stream MMDiT block (exemplar models.py:23-246)."""
    H, eps = cfg.num_heads, cfg.eps
    i_shift1, i_scale1, i_gate1, i_shift2, i_scale2, i_gate2 = L.modulation(
        p["img_mod"], vec, 6, dtype
    )
    t_shift1, t_scale1, t_gate1, t_shift2, t_scale2, t_gate2 = L.modulation(
        p["txt_mod"], vec, 6, dtype
    )

    img_mod = L.modulate(L.layer_norm(img, eps), i_shift1, i_scale1)
    txt_mod = L.modulate(L.layer_norm(txt, eps), t_shift1, t_scale1)

    iq, ik, iv = jnp.split(L.linear(p["img_qkv"], img_mod, dtype), 3, axis=-1)
    tq, tk, tv = jnp.split(L.linear(p["txt_qkv"], txt_mod, dtype), 3, axis=-1)
    iq, ik, iv = (_split_heads(x, H) for x in (iq, ik, iv))
    tq, tk, tv = (_split_heads(x, H) for x in (tq, tk, tv))
    iq, ik = _qk_norm(iq, ik, p["img_qnorm"], p["img_knorm"], eps)
    tq, tk = _qk_norm(tq, tk, p["txt_qnorm"], p["txt_knorm"], eps)

    # joint sequence: [text | image] (diffusers FLUX ordering).  The
    # explicit activation constraints keep the concat and attention on one
    # consistent layout under tp/sp meshes (see sharding.constrain_attn).
    seq_ax = _seq_axis()
    lay = _ATTN_LAYOUT
    q = constrain_attn(jnp.concatenate([tq, iq], axis=seq_ax), lay)
    k = constrain_attn(jnp.concatenate([tk, ik], axis=seq_ax), lay)
    v = constrain_attn(jnp.concatenate([tv, iv], axis=seq_ax), lay)
    rc, rs = _rope_tables_for_layout(rope_cos, rope_sin)
    q = apply_rope(q, rc, rs)
    k = apply_rope(k, rc, rs)

    out = constrain_attn(
        attention(q, k, v, mask=attn_mask, kv_valid=attn_valid,
                  impl=attn_impl, layout=lay),
        lay,
    )
    out = _merge_heads(out)
    Lt = txt.shape[1]
    txt_attn, img_attn = out[:, :Lt], out[:, Lt:]

    img = img + i_gate1[:, None, :] * L.linear(p["img_attn_out"], img_attn, dtype)
    txt = txt + t_gate1[:, None, :] * L.linear(p["txt_attn_out"], txt_attn, dtype)

    img_mlp = L.modulate(L.layer_norm(img, eps), i_shift2, i_scale2)
    img = img + i_gate2[:, None, :] * L.linear(
        p["img_mlp_out"], L.gelu_tanh(L.linear(p["img_mlp_in"], img_mlp, dtype)), dtype
    )
    txt_mlp = L.modulate(L.layer_norm(txt, eps), t_shift2, t_scale2)
    txt = txt + t_gate2[:, None, :] * L.linear(
        p["txt_mlp_out"], L.gelu_tanh(L.linear(p["txt_mlp_in"], txt_mlp, dtype)), dtype
    )
    return img, txt


def _single_block(p, cfg: FluxConfig, x, vec, rope_cos, rope_sin, attn_impl,
                  dtype, attn_valid=None, attn_mask=None):
    """Single-stream block with fused projections (exemplar models.py:248-369)."""
    H, h, mh, eps = cfg.num_heads, cfg.hidden_size, cfg.mlp_hidden, cfg.eps
    shift, scale, gate = L.modulation(p["mod"], vec, 3, dtype)
    x_mod = L.modulate(L.layer_norm(x, eps), shift, scale)

    proj = L.linear(p["linear1"], x_mod, dtype)
    qkv, mlp = proj[..., : 3 * h], proj[..., 3 * h :]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    lay = _ATTN_LAYOUT
    q, k, v = (constrain_attn(_split_heads(t, H), lay) for t in (q, k, v))
    q, k = _qk_norm(q, k, p["qnorm"], p["knorm"], eps)
    rc, rs = _rope_tables_for_layout(rope_cos, rope_sin)
    q = apply_rope(q, rc, rs)
    k = apply_rope(k, rc, rs)

    attn_out = constrain_attn(
        attention(q, k, v, mask=attn_mask, kv_valid=attn_valid,
                  impl=attn_impl, layout=lay),
        lay,
    )
    attn_out = _merge_heads(attn_out)
    out = L.linear(
        p["linear2"], jnp.concatenate([attn_out, L.gelu_tanh(mlp)], axis=-1), dtype
    )
    return x + gate[:, None, :] * out


# ----------------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------------


def flux_forward(
    params: Dict[str, Any],
    cfg: FluxConfig,
    img: jnp.ndarray,  # (B, L_img, in_channels) packed latents
    txt: jnp.ndarray,  # (B, L_txt, context_dim) T5 embeddings
    pooled: jnp.ndarray,  # (B, pooled_dim) CLIP pooled embedding
    timestep: jnp.ndarray,  # (B,) in [0, 1]
    guidance: Optional[jnp.ndarray],  # (B,) guidance scale (e.g. 3.5)
    rope_cos: jnp.ndarray,  # (L_txt + L_img, head_dim)
    rope_sin: jnp.ndarray,
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    remat=True,
    virtual_depth: Optional[tuple] = None,
    pad_seq_multiple: int = 128,
) -> jnp.ndarray:
    """Predict rectified-flow velocity for packed image tokens.

    Mirrors the reference call contract (fastvideo/train_grpo_flux.py:134-144):
    timestep/guidance are scaled by 1000 internally before sinusoidal
    embedding, conditioning vec = time + guidance + pooled projections.

    ``virtual_depth=(DD, DS)`` executes DD double / DS single block
    applications by cycling the resident weight stacks modulo their true
    depth (benchmarking aid: a full-depth forward's compute and per-block
    HBM weight traffic are executed exactly even when the full parameter
    set exceeds one chip's HBM — each scan iteration dynamic-slices and
    streams one block's weights from HBM, identical to a true full stack).

    ``pad_seq_multiple``: lane-align the joint sequence by padding the
    image-token tail up to a multiple (identity-RoPE pad positions,
    key-masked in attention, sliced off before the final layer) — exact
    semantics, measured 2.1x faster attention at the 720px recipe's
    S=2537 vs the ragged layout (every block otherwise pays a Mosaic
    relayout + pad/slice copy inside the kernel wrapper).  Applied only
    when S >= 8 x multiple so tiny test shapes keep their exact layout;
    0 disables.
    """
    L_txt, L_img = txt.shape[1], img.shape[1]
    S_total = L_txt + L_img
    npad = (-S_total) % pad_seq_multiple if pad_seq_multiple else 0
    attn_valid = None
    if npad and S_total >= 8 * pad_seq_multiple:
        img = jnp.pad(img, ((0, 0), (0, npad), (0, 0)))
        rope_cos = jnp.concatenate(
            [rope_cos, jnp.ones((npad, rope_cos.shape[-1]), rope_cos.dtype)]
        )
        rope_sin = jnp.concatenate(
            [rope_sin, jnp.zeros((npad, rope_sin.shape[-1]), rope_sin.dtype)]
        )
        # STATIC prefix-valid count: folds into the flash kernels'
        # col < kv_len comparison, so no traced mask operand enters the
        # block scan (round 5; measured within ~5% of the bias-add mask
        # representation at kernel level and neutral at model level —
        # kept for program hygiene, see flash_attention docstring)
        attn_valid = S_total

    x = L.linear(params["x_embedder"], img, dtype)
    c = L.linear(params["context_embedder"], txt, dtype)

    vec = L.mlp_embedder(
        params["time_in"],
        L.timestep_embedding(timestep * 1000.0, cfg.time_freq_dim),
        dtype,
    )
    if cfg.guidance_embeds:
        assert guidance is not None, "guidance-distilled model needs guidance"
        vec = vec + L.mlp_embedder(
            params["guidance_in"],
            L.timestep_embedding(guidance * 1000.0, cfg.time_freq_dim),
            dtype,
        )
    vec = vec + L.mlp_embedder(params["vector_in"], pooled, dtype)

    rope_cos = rope_cos.astype(jnp.float32)
    rope_sin = rope_sin.astype(jnp.float32)

    def double_body(carry, p):
        img_h, txt_h = carry
        img_h, txt_h = _double_block(
            p, cfg, img_h, txt_h, vec, rope_cos, rope_sin, attn_impl, dtype,
            attn_valid=attn_valid,
        )
        return (constrain_residual(img_h), constrain_residual(txt_h)), None

    def single_body(x_h, p):
        out = _single_block(
            p, cfg, x_h, vec, rope_cos, rope_sin, attn_impl, dtype,
            attn_valid=attn_valid,
        )
        return constrain_residual(out), None

    double_body_raw, single_body_raw = double_body, single_body
    if remat:
        # remat=True: full recompute (min memory); remat="dots": XLA may keep
        # profitable dot results (measured ~11% faster update step on v5e)
        policy = (
            jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            if remat == "dots" else None
        )
        double_body = jax.checkpoint(double_body, prevent_cse=False, policy=policy)
        single_body = jax.checkpoint(single_body, prevent_cse=False, policy=policy)

    if virtual_depth is None:
        (x, c), _ = jax.lax.scan(double_body, (x, c), params["double"])
        joint = jnp.concatenate([c, x], axis=1)
        joint, _ = jax.lax.scan(single_body, joint, params["single"])
    else:
        vd, vs = virtual_depth
        kd = jax.tree.leaves(params["double"])[0].shape[0]
        ks = jax.tree.leaves(params["single"])[0].shape[0]

        def cycle_scan(body, raw_body, carry, stack, n, k):
            """``n`` block applications cycling a ``k``-deep weight stack.

            When k divides n: the hand-written cycle_scan VJP
            (utils/cycle_scan.py) — dense in-place block-gradient
            accumulation, per-block remat by construction (``raw_body``,
            un-checkpointed, is what it differentiates).  With the VJP
            disabled, nested scans (outer over n//k cycles, inner over
            the real stack) — no per-step modular weight gather, so the
            rematerialized backward stays a plain scan transpose that the
            compiler handles at full virtual depth (the ``w[i % k]``
            dynamic-slice variant below blows up the remote compile service
            when differentiated; see PERF.md round-2 notes).
            """
            if n % k == 0 and not _FORCE_GATHER:
                if _CYCLE_VJP:
                    from mixgrpo_tpu.utils.cycle_scan import (
                        cycle_scan as cycle_scan_vjp,
                    )

                    return cycle_scan_vjp(raw_body, carry, stack, n, k)

                def outer(c2, _):
                    c3, _ = jax.lax.scan(body, c2, stack)
                    return c3, None

                carry, _ = jax.lax.scan(outer, carry, None, length=n // k)
                return carry

            def gather_body(c2, i):
                p = jax.tree.map(lambda w: w[i % k], stack)
                return body(c2, p)

            carry, _ = jax.lax.scan(
                gather_body, carry, jnp.arange(n), unroll=_GATHER_UNROLL
            )
            return carry

        (x, c) = cycle_scan(
            double_body, double_body_raw, (x, c), params["double"], vd, kd
        )
        joint = jnp.concatenate([c, x], axis=1)
        joint = cycle_scan(
            single_body, single_body_raw, joint, params["single"], vs, ks
        )
    x = joint[:, c.shape[1] : c.shape[1] + L_img]

    scale, shift = L.modulation(params["final_mod"], vec, 2, dtype)
    x = L.modulate(L.layer_norm(x, cfg.eps), shift, scale)
    return L.linear(params["proj_out"], x, dtype).astype(jnp.float32)


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
