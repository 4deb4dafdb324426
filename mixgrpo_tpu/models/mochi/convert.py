"""Export a mixgrpo_tpu Mochi pytree back to diffusers-layout safetensors.

Counterpart of the reference's checkpoint converter
(zqqqqz2000/MixGRPO fastvideo/models/mochi_hf/convert_diffusers_to_mochi.py:
40-172 — a diffusers -> original-Mochi state-dict rewriter used to hand
fine-tuned weights back to the upstream ecosystem).  Here the conversion
runs from this framework's pytree (the load direction is
``load.load_mochi_hf``): every tensor is renamed and re-shaped to the
exact diffusers ``MochiTransformer3DModel`` names, so an exported
directory round-trips through ``load_mochi_checkpoint`` and loads in
torch/diffusers unchanged.

CLI: ``python -m mixgrpo_tpu.models.mochi.convert --in <diffusers_dir>
--out <dir>`` round-trips a checkpoint through the pytree (a structure
self-check); library use is ``export_mochi_diffusers(params, cfg)``.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from mixgrpo_tpu.models.mochi.model import MochiConfig


def _put_lin(out: Dict, name: str, p: Dict, conv_shape=None) -> None:
    w = np.asarray(p["w"], np.float32).T  # (out, in)
    if conv_shape is not None:
        w = w.reshape(conv_shape)
    out[f"{name}.weight"] = w
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"], np.float32)


def _put_fused(out: Dict, base: str, p: Dict, names) -> None:
    w = np.asarray(p["w"], np.float32).T  # (sum(out), in)
    for name, chunk in zip(names, np.split(w, len(names), axis=0)):
        out[f"{base}.{name}.weight"] = np.ascontiguousarray(chunk)


def _put_block(out: Dict, i: int, p: Dict, last: bool) -> None:
    b = f"transformer_blocks.{i}"
    _put_lin(out, f"{b}.norm1.linear", p["mod_x"]["lin"])
    _put_fused(out, f"{b}.attn1", p["qkv"], ("to_q", "to_k", "to_v"))
    out[f"{b}.attn1.norm_q.weight"] = np.asarray(p["qnorm"], np.float32)
    out[f"{b}.attn1.norm_k.weight"] = np.asarray(p["knorm"], np.float32)
    _put_fused(out, f"{b}.attn1", p["add_kv"], ("add_k_proj", "add_v_proj"))
    out[f"{b}.attn1.norm_added_k.weight"] = np.asarray(p["add_knorm"], np.float32)
    _put_lin(out, f"{b}.attn1.to_out.0", p["attn_out"])
    _put_lin(out, f"{b}.ff.net.0.proj", p["ff_in"])
    _put_lin(out, f"{b}.ff.net.2", p["ff_out"])
    if last:
        _put_lin(out, f"{b}.norm1_context.linear_1", p["mod_c"]["lin"])
    else:
        _put_lin(out, f"{b}.norm1_context.linear", p["mod_c"]["lin"])
        _put_lin(out, f"{b}.attn1.add_q_proj", p["add_q"])
        out[f"{b}.attn1.norm_added_q.weight"] = np.asarray(
            p["add_qnorm"], np.float32
        )
        _put_lin(out, f"{b}.attn1.to_add_out", p["attn_out_c"])
        _put_lin(out, f"{b}.ff_context.net.0.proj", p["ff_c_in"])
        _put_lin(out, f"{b}.ff_context.net.2", p["ff_c_out"])


def export_mochi_diffusers(params, cfg: MochiConfig) -> Dict[str, np.ndarray]:
    """Pytree -> flat diffusers-name state dict (numpy, fp32)."""
    params = jax.device_get(params)
    out: Dict[str, np.ndarray] = {}
    _put_lin(out, "patch_embed.proj", params["patch_embed"],
             conv_shape=(cfg.dim, cfg.in_channels, cfg.patch_size, cfg.patch_size))
    _put_lin(out, "time_embed.timestep_embedder.linear_1", params["time_in"]["in"])
    _put_lin(out, "time_embed.timestep_embedder.linear_2", params["time_in"]["out"])
    _put_lin(out, "time_embed.pooler.to_kv", params["pooler"]["to_kv"])
    _put_lin(out, "time_embed.pooler.to_q", params["pooler"]["to_q"])
    _put_lin(out, "time_embed.pooler.to_out", params["pooler"]["to_out"])
    _put_lin(out, "time_embed.caption_proj", params["caption_proj"])
    out["pos_frequencies"] = np.asarray(params["pos_frequencies"], np.float32)
    _put_lin(out, "norm_out.linear", params["final_mod"]["lin"])
    _put_lin(out, "proj_out", params["proj_out"])

    n = cfg.num_layers
    stacked = params["blocks"]
    for i in range(n - 1):
        _put_block(out, i, jax.tree.map(lambda x: x[i], stacked), last=False)
    _put_block(out, n - 1, params["final_block"], last=True)
    return out


def save_mochi_diffusers(params, cfg: MochiConfig, out_dir: str) -> str:
    """Write diffusers-layout safetensors (one shard) + a minimal index."""
    import json
    import os

    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    st = export_mochi_diffusers(params, cfg)
    path = os.path.join(out_dir, "diffusion_pytorch_model.safetensors")
    save_file(st, path)
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "_class_name": "MochiTransformer3DModel",
            "patch_size": cfg.patch_size, "num_attention_heads": cfg.num_heads,
            "attention_head_dim": cfg.head_dim, "num_layers": cfg.num_layers,
            "in_channels": cfg.in_channels,
            "pooled_projection_dim": cfg.text_dim,
            "text_embed_dim": cfg.text_embed_dim,
        }, f, indent=2)
    return path


def main():
    import argparse

    from mixgrpo_tpu.models.mochi.load import load_mochi_checkpoint

    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_dir", required=True,
                    help="diffusers MochiTransformer3DModel dir")
    ap.add_argument("--out", dest="out_dir", required=True)
    args = ap.parse_args()
    cfg = MochiConfig.mochi_preview()
    params = load_mochi_checkpoint(args.in_dir, cfg)
    print(save_mochi_diffusers(params, cfg, args.out_dir))


if __name__ == "__main__":
    main()
