"""Diffusers ``MochiTransformer3DModel`` safetensors -> mixgrpo_tpu pytree.

Name inventory cross-checked against the reference's converter
(zqqqqz2000/MixGRPO fastvideo/models/mochi_hf/convert_diffusers_to_mochi.py:
40-172), which enumerates every diffusers-side parameter:

  patch_embed.proj, time_embed.{timestep_embedder.linear_1/2, pooler.to_kv/
  to_q/to_out, caption_proj}, pos_frequencies,
  transformer_blocks.{i}.{norm1.linear, norm1_context.linear[_1],
  attn1.{to_q,to_k,to_v,norm_q,norm_k,to_out.0,add_q_proj,add_k_proj,
  add_v_proj,norm_added_q,norm_added_k,to_add_out}, ff.net.{0.proj,2},
  ff_context.net.{0.proj,2}}, norm_out.linear, proj_out.

Modulation orders follow diffusers directly: MochiRMSNormZero chunks to
(scale_msa, gate_msa, scale_mlp, gate_mlp); LayerNormContinuous to
(scale, shift) — both match the forward in models/mochi/model.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.mochi.model import MochiConfig


def _lin(st, name, transpose=True):
    w = np.asarray(st[f"{name}.weight"], np.float32)
    if w.ndim == 4:  # conv-style patch embed (out, in, ph, pw)
        w = w.reshape(w.shape[0], -1)
    p = {"w": np.ascontiguousarray(w.T if transpose else w)}
    if f"{name}.bias" in st:
        p["b"] = np.asarray(st[f"{name}.bias"], np.float32)
    return p


def _vec(st, name):
    return np.asarray(st[f"{name}.weight"], np.float32)


def _fused_qkv(st, base, names=("to_q", "to_k", "to_v")):
    ws = [np.asarray(st[f"{base}.{n}.weight"], np.float32) for n in names]
    return {"w": np.ascontiguousarray(np.concatenate(ws, axis=0).T)}


def _block_from(st, i: int, n_layers: int) -> Dict:
    b = f"transformer_blocks.{i}"
    last = i == n_layers - 1
    p = {
        "mod_x": {"lin": _lin(st, f"{b}.norm1.linear")},
        "qkv": _fused_qkv(st, f"{b}.attn1"),
        "qnorm": _vec(st, f"{b}.attn1.norm_q"),
        "knorm": _vec(st, f"{b}.attn1.norm_k"),
        "add_kv": _fused_qkv(st, f"{b}.attn1", ("add_k_proj", "add_v_proj")),
        "add_knorm": _vec(st, f"{b}.attn1.norm_added_k"),
        "attn_out": _lin(st, f"{b}.attn1.to_out.0"),
        "ff_in": _lin(st, f"{b}.ff.net.0.proj"),
        "ff_out": _lin(st, f"{b}.ff.net.2"),
    }
    if last:
        # context_pre_only: LayerNormContinuous with its own linear
        p["mod_c"] = {"lin": _lin(st, f"{b}.norm1_context.linear_1")}
    else:
        p["mod_c"] = {"lin": _lin(st, f"{b}.norm1_context.linear")}
        p["add_q"] = _lin(st, f"{b}.attn1.add_q_proj")
        p["add_qnorm"] = _vec(st, f"{b}.attn1.norm_added_q")
        p["attn_out_c"] = _lin(st, f"{b}.attn1.to_add_out")
        p["ff_c_in"] = _lin(st, f"{b}.ff_context.net.0.proj")
        p["ff_c_out"] = _lin(st, f"{b}.ff_context.net.2")
    return p


def load_mochi_hf(st: Dict[str, np.ndarray], cfg: MochiConfig):
    """Map a diffusers MochiTransformer3DModel state dict onto our pytree."""
    body = [
        _block_from(st, i, cfg.num_layers) for i in range(cfg.num_layers - 1)
    ]
    params = {
        "patch_embed": _lin(st, "patch_embed.proj"),
        "time_in": {
            "in": _lin(st, "time_embed.timestep_embedder.linear_1"),
            "out": _lin(st, "time_embed.timestep_embedder.linear_2"),
        },
        "pooler": {
            "to_kv": _lin(st, "time_embed.pooler.to_kv"),
            "to_q": _lin(st, "time_embed.pooler.to_q"),
            "to_out": _lin(st, "time_embed.pooler.to_out"),
        },
        "caption_proj": _lin(st, "time_embed.caption_proj"),
        "pos_frequencies": np.asarray(st["pos_frequencies"], np.float32),
        "final_mod": {"lin": _lin(st, "norm_out.linear")},
        "proj_out": _lin(st, "proj_out"),
        "blocks": jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *body),
        "final_block": _block_from(st, cfg.num_layers - 1, cfg.num_layers),
    }
    return jax.tree.map(jnp.asarray, params)


def load_mochi_checkpoint(path: str, cfg: MochiConfig = None):
    from mixgrpo_tpu.models.flux.load import load_safetensors_dir

    cfg = cfg or MochiConfig.mochi_preview()
    return load_mochi_hf(load_safetensors_dir(path), cfg)
