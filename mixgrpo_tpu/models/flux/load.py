"""HF safetensors -> mixgrpo_tpu param-pytree weight loading.

Counterpart of the reference's ``from_pretrained`` calls (zqqqqz2000/MixGRPO
fastvideo/train_grpo_flux.py:677-701) and its model loader registry
(fastvideo/utils/load.py).  Maps diffusers ``FluxTransformer2DModel`` /
``AutoencoderKL`` checkpoint names onto our stacked-block pytrees:

  - HF linear weights are (out, in); ours are (in, out) -> transpose.
  - HF conv weights are (out, in, kh, kw); ours are (kh, kw, in, out).
  - Per-block tensors are stacked along a leading depth axis (our blocks
    run under ``lax.scan``).
  - Fused projections: double-block qkv = concat(to_q, to_k, to_v);
    single-block linear1 = concat(to_q, to_k, to_v, proj_mlp).

Checkpoint layout notes (verified against diffusers 0.32 naming, the
version the reference pins):
  double block i   -> transformer_blocks.{i}.{norm1,norm1_context}.linear,
                      .attn.{to_q,to_k,to_v,add_q_proj,add_k_proj,
                      add_v_proj,norm_q,norm_k,norm_added_q,norm_added_k,
                      to_out.0,to_add_out}, .ff.net.{0.proj,2},
                      .ff_context.net.{0.proj,2}
  single block i   -> single_transformer_blocks.{i}.{norm.linear,
                      attn.{to_q,to_k,to_v,norm_q,norm_k},proj_mlp,proj_out}
  head             -> norm_out.linear, proj_out
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux.model import FluxConfig
from mixgrpo_tpu.models.flux.vae import VAEConfig


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors under ``path`` (or a single file) as numpy."""
    from safetensors.numpy import load_file

    files = (
        [path]
        if path.endswith(".safetensors")
        else sorted(glob.glob(os.path.join(path, "*.safetensors")))
    )
    assert files, f"no safetensors found at {path}"
    state: Dict[str, np.ndarray] = {}
    for f in files:
        state.update(load_file(f))
    return state


def _lin(state, name, dtype=np.float32):
    p = {"w": np.ascontiguousarray(state[f"{name}.weight"].T.astype(dtype))}
    bias = f"{name}.bias"
    if bias in state:
        p["b"] = state[bias].astype(dtype)
    return p


def _lin_cat(state, names, dtype=np.float32):
    """Concatenate several HF linears along the output dim (fused proj)."""
    w = np.concatenate([state[f"{n}.weight"].astype(dtype) for n in names], axis=0)
    p = {"w": np.ascontiguousarray(w.T)}
    if f"{names[0]}.bias" in state:
        p["b"] = np.concatenate([state[f"{n}.bias"].astype(dtype) for n in names])
    return p


def _mlp_embedder(state, name, dtype=np.float32):
    return {"in": _lin(state, f"{name}.linear_1", dtype),
            "out": _lin(state, f"{name}.linear_2", dtype)}


def _stack(dicts):
    import jax

    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *dicts)


def load_flux_params(path: str, cfg: FluxConfig, dtype=np.float32):
    """Build the ``init_flux``-shaped pytree from a FLUX transformer ckpt."""
    st = load_safetensors_dir(path)
    params = {
        "x_embedder": _lin(st, "x_embedder", dtype),
        "context_embedder": _lin(st, "context_embedder", dtype),
        "time_in": _mlp_embedder(st, "time_text_embed.timestep_embedder", dtype),
        "vector_in": _mlp_embedder(st, "time_text_embed.text_embedder", dtype),
        "final_mod": {"lin": _lin(st, "norm_out.linear", dtype)},
        "proj_out": _lin(st, "proj_out", dtype),
    }
    if cfg.guidance_embeds:
        params["guidance_in"] = _mlp_embedder(
            st, "time_text_embed.guidance_embedder", dtype
        )

    doubles = []
    for i in range(cfg.depth_double):
        b = f"transformer_blocks.{i}"
        doubles.append({
            "img_mod": {"lin": _lin(st, f"{b}.norm1.linear", dtype)},
            "txt_mod": {"lin": _lin(st, f"{b}.norm1_context.linear", dtype)},
            "img_qkv": _lin_cat(
                st, [f"{b}.attn.to_q", f"{b}.attn.to_k", f"{b}.attn.to_v"], dtype
            ),
            "txt_qkv": _lin_cat(
                st,
                [f"{b}.attn.add_q_proj", f"{b}.attn.add_k_proj", f"{b}.attn.add_v_proj"],
                dtype,
            ),
            "img_qnorm": st[f"{b}.attn.norm_q.weight"].astype(dtype),
            "img_knorm": st[f"{b}.attn.norm_k.weight"].astype(dtype),
            "txt_qnorm": st[f"{b}.attn.norm_added_q.weight"].astype(dtype),
            "txt_knorm": st[f"{b}.attn.norm_added_k.weight"].astype(dtype),
            "img_attn_out": _lin(st, f"{b}.attn.to_out.0", dtype),
            "txt_attn_out": _lin(st, f"{b}.attn.to_add_out", dtype),
            "img_mlp_in": _lin(st, f"{b}.ff.net.0.proj", dtype),
            "img_mlp_out": _lin(st, f"{b}.ff.net.2", dtype),
            "txt_mlp_in": _lin(st, f"{b}.ff_context.net.0.proj", dtype),
            "txt_mlp_out": _lin(st, f"{b}.ff_context.net.2", dtype),
        })
    params["double"] = _stack(doubles)

    singles = []
    for i in range(cfg.depth_single):
        b = f"single_transformer_blocks.{i}"
        singles.append({
            "mod": {"lin": _lin(st, f"{b}.norm.linear", dtype)},
            "linear1": _lin_cat(
                st,
                [f"{b}.attn.to_q", f"{b}.attn.to_k", f"{b}.attn.to_v", f"{b}.proj_mlp"],
                dtype,
            ),
            "linear2": _lin(st, f"{b}.proj_out", dtype),
            "qnorm": st[f"{b}.attn.norm_q.weight"].astype(dtype),
            "knorm": st[f"{b}.attn.norm_k.weight"].astype(dtype),
        })
    params["single"] = _stack(singles)

    import jax

    return jax.tree.map(jnp.asarray, params)


# ----------------------------------------------------------------------------
# VAE decoder
# ----------------------------------------------------------------------------


def _convp(state, name, dtype=np.float32):
    w = state[f"{name}.weight"].astype(dtype)  # (out, in, kh, kw)
    return {
        "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "b": state[f"{name}.bias"].astype(dtype),
    }


def _gnp(state, name, dtype=np.float32):
    return {"scale": state[f"{name}.weight"].astype(dtype),
            "bias": state[f"{name}.bias"].astype(dtype)}


def _resnetp(state, name, dtype=np.float32):
    p = {
        "norm1": _gnp(state, f"{name}.norm1", dtype),
        "conv1": _convp(state, f"{name}.conv1", dtype),
        "norm2": _gnp(state, f"{name}.norm2", dtype),
        "conv2": _convp(state, f"{name}.conv2", dtype),
    }
    if f"{name}.conv_shortcut.weight" in state:
        p["shortcut"] = _convp(state, f"{name}.conv_shortcut", dtype)
    return p


def load_vae_encoder_params(path: str, cfg: VAEConfig, dtype=np.float32):
    """Encoder side of the AutoencoderKL checkpoint (encoder.* names)."""
    import jax

    st = load_safetensors_dir(path)
    e = "encoder"
    params = {
        "conv_in": _convp(st, f"{e}.conv_in", dtype),
        "mid_res1": _resnetp(st, f"{e}.mid_block.resnets.0", dtype),
        "mid_res2": _resnetp(st, f"{e}.mid_block.resnets.1", dtype),
        "norm_out": _gnp(st, f"{e}.conv_norm_out", dtype),
        "conv_out": _convp(st, f"{e}.conv_out", dtype),
    }
    a = f"{e}.mid_block.attentions.0"
    params["mid_attn"] = {
        "norm": _gnp(st, f"{a}.group_norm", dtype),
        "q": _lin(st, f"{a}.to_q", dtype),
        "k": _lin(st, f"{a}.to_k", dtype),
        "v": _lin(st, f"{a}.to_v", dtype),
        "out": _lin(st, f"{a}.to_out.0", dtype),
    }
    blocks = []
    for bi in range(len(cfg.block_out_channels)):
        name = f"{e}.down_blocks.{bi}"
        blk = {
            "resnets": [
                _resnetp(st, f"{name}.resnets.{li}", dtype)
                for li in range(cfg.layers_per_block)
            ]
        }
        if f"{name}.downsamplers.0.conv.weight" in st:
            blk["downsample"] = _convp(st, f"{name}.downsamplers.0.conv", dtype)
        blocks.append(blk)
    params["down_blocks"] = blocks
    return jax.tree.map(jnp.asarray, params)


def load_vae_decoder_params(path: str, cfg: VAEConfig, dtype=np.float32):
    import jax

    st = load_safetensors_dir(path)
    d = "decoder"
    params = {
        "conv_in": _convp(st, f"{d}.conv_in", dtype),
        "mid_res1": _resnetp(st, f"{d}.mid_block.resnets.0", dtype),
        "mid_res2": _resnetp(st, f"{d}.mid_block.resnets.1", dtype),
        "norm_out": _gnp(st, f"{d}.conv_norm_out", dtype),
        "conv_out": _convp(st, f"{d}.conv_out", dtype),
    }
    a = f"{d}.mid_block.attentions.0"
    params["mid_attn"] = {
        "norm": _gnp(st, f"{a}.group_norm", dtype),
        "q": _lin(st, f"{a}.to_q", dtype),
        "k": _lin(st, f"{a}.to_k", dtype),
        "v": _lin(st, f"{a}.to_v", dtype),
        "out": _lin(st, f"{a}.to_out.0", dtype),
    }
    blocks = []
    for bi in range(len(cfg.block_out_channels)):
        name = f"{d}.up_blocks.{bi}"
        blk = {
            "resnets": [
                _resnetp(st, f"{name}.resnets.{li}", dtype)
                for li in range(cfg.layers_per_block + 1)
            ]
        }
        if f"{name}.upsamplers.0.conv.weight" in st:
            blk["upsample"] = _convp(st, f"{name}.upsamplers.0.conv", dtype)
        blocks.append(blk)
    params["up_blocks"] = blocks
    return jax.tree.map(jnp.asarray, params)
