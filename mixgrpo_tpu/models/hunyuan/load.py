"""HunyuanVideo DiT checkpoint loader (official .pt layout -> pytree).

The reference loads the released HunyuanVideo transformer from a torch
checkpoint whose state dict (optionally nested under ``"module"``) uses the
native ``HYVideoDiffusionTransformer`` module names
(zqqqqz2000/MixGRPO fastvideo/models/hunyuan/inference.py:174-259 — path
resolution for ``pytorch_model_module.pt`` / ``*_model_states.pt``;
fastvideo/utils/load.py:229-249 — ``load_key="module"`` unwrap and strict
``load_state_dict``).  Name inventory pinned by the module definitions:

  img_in.proj (Conv3d)                       modules/embed_layers.py:40
  txt_in.{input_embedder, t_embedder.mlp.0/2,
          c_embedder.linear_1/2,
          individual_token_refiner.blocks.N.
            {norm1, self_attn_qkv, self_attn_proj, norm2,
             mlp.fc1/fc2, adaLN_modulation.1}} modules/token_refiner.py:36-71,182-200
  time_in.mlp.0/2, guidance_in.mlp.0/2       modules/embed_layers.py:147-153
  vector_in.{in_layer, out_layer}            modules/mlp_layers.py:69-74
  double_blocks.N.{img_mod.linear, img_attn_qkv, img_attn_{q,k}_norm,
    img_attn_proj, img_mlp.fc1/fc2, txt_* mirrors} modules/models.py:50-121
  single_blocks.N.{linear1, linear2, q_norm, k_norm, modulation.linear}
                                             modules/models.py:280-305
  final_layer.{linear, adaLN_modulation.1}   modules/mlp_layers.py:97-127

This module maps those names onto the stacked-scan pytree of
``models/hunyuan/model.py`` (the same treatment ``models/mochi/load.py``
gives Mochi), and provides the inverse export for round-trip tests and
for publishing fine-tuned weights back in the official layout.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from mixgrpo_tpu.models.hunyuan.model import HunyuanVideoConfig


def _np(x) -> np.ndarray:
    """torch tensor / numpy array -> float32 numpy."""
    if hasattr(x, "detach"):
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x, np.float32)


def _lin(sd, name):
    p = {"w": np.ascontiguousarray(_np(sd[f"{name}.weight"]).T)}
    if f"{name}.bias" in sd:
        p["b"] = _np(sd[f"{name}.bias"])
    return p


def _mlp_embedder(sd, n0, n1):
    return {"in": _lin(sd, n0), "out": _lin(sd, n1)}


def _ln(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _depth(sd, prefix: str) -> int:
    n = -1
    plen = len(prefix)
    for k in sd:
        if k.startswith(prefix):
            n = max(n, int(k[plen:].split(".", 1)[0]))
    return n + 1


def infer_hunyuan_config(sd: Dict[str, Any]) -> HunyuanVideoConfig:
    """Derive the architecture from checkpoint shapes (the reference instead
    hard-codes hunyuan_config, fastvideo/utils/load.py:26-34)."""
    conv_w = _np(sd["img_in.proj.weight"])  # (h, C, pt, ph, pw)
    hidden, in_ch = conv_w.shape[0], conv_w.shape[1]
    patch = tuple(conv_w.shape[2:])
    head_dim = _np(sd["single_blocks.0.q_norm.weight"]).shape[0]
    mlp_hidden = _np(sd["double_blocks.0.img_mlp.fc1.bias"]).shape[0]
    if head_dim == 128:
        rope_dims = (16, 56, 56)  # the released 720p model (load.py:28)
    else:
        t = head_dim // 4
        assert (head_dim - t) % 2 == 0, head_dim
        rope_dims = (t, (head_dim - t) // 2, (head_dim - t) // 2)
    return HunyuanVideoConfig(
        patch_size=patch,
        in_channels=in_ch,
        hidden_size=hidden,
        num_heads=hidden // head_dim,
        mlp_ratio=mlp_hidden / hidden,
        depth_double=_depth(sd, "double_blocks."),
        depth_single=_depth(sd, "single_blocks."),
        rope_dim_list=rope_dims,
        text_states_dim=_np(sd["txt_in.input_embedder.weight"]).shape[1],
        text_states_dim_2=_np(sd["vector_in.in_layer.weight"]).shape[1],
        refiner_depth=_depth(sd, "txt_in.individual_token_refiner.blocks."),
        guidance_embed="guidance_in.mlp.0.weight" in sd,
        time_freq_dim=_np(sd["time_in.mlp.0.weight"]).shape[1],
    )


def _double_block_from(sd, i: int) -> Dict[str, Any]:
    b = f"double_blocks.{i}"
    return {
        "img_mod": {"lin": _lin(sd, f"{b}.img_mod.linear")},
        "txt_mod": {"lin": _lin(sd, f"{b}.txt_mod.linear")},
        "img_qkv": _lin(sd, f"{b}.img_attn_qkv"),
        "txt_qkv": _lin(sd, f"{b}.txt_attn_qkv"),
        "img_qnorm": _np(sd[f"{b}.img_attn_q_norm.weight"]),
        "img_knorm": _np(sd[f"{b}.img_attn_k_norm.weight"]),
        "txt_qnorm": _np(sd[f"{b}.txt_attn_q_norm.weight"]),
        "txt_knorm": _np(sd[f"{b}.txt_attn_k_norm.weight"]),
        "img_attn_out": _lin(sd, f"{b}.img_attn_proj"),
        "txt_attn_out": _lin(sd, f"{b}.txt_attn_proj"),
        "img_mlp_in": _lin(sd, f"{b}.img_mlp.fc1"),
        "img_mlp_out": _lin(sd, f"{b}.img_mlp.fc2"),
        "txt_mlp_in": _lin(sd, f"{b}.txt_mlp.fc1"),
        "txt_mlp_out": _lin(sd, f"{b}.txt_mlp.fc2"),
    }


def _single_block_from(sd, i: int) -> Dict[str, Any]:
    b = f"single_blocks.{i}"
    return {
        "mod": {"lin": _lin(sd, f"{b}.modulation.linear")},
        "linear1": _lin(sd, f"{b}.linear1"),
        "linear2": _lin(sd, f"{b}.linear2"),
        "qnorm": _np(sd[f"{b}.q_norm.weight"]),
        "knorm": _np(sd[f"{b}.k_norm.weight"]),
    }


def _refiner_block_from(sd, i: int) -> Dict[str, Any]:
    b = f"txt_in.individual_token_refiner.blocks.{i}"
    return {
        "norm1": _ln(sd, f"{b}.norm1"),
        "qkv": _lin(sd, f"{b}.self_attn_qkv"),
        "proj": _lin(sd, f"{b}.self_attn_proj"),
        "norm2": _ln(sd, f"{b}.norm2"),
        "mlp_in": _lin(sd, f"{b}.mlp.fc1"),
        "mlp_out": _lin(sd, f"{b}.mlp.fc2"),
        "mod": {"lin": _lin(sd, f"{b}.adaLN_modulation.1")},
    }


def convert_hunyuan_state_dict(
    sd: Dict[str, Any], cfg: Optional[HunyuanVideoConfig] = None
):
    """Official HunyuanVideo state dict -> (params pytree, config)."""
    import jax
    import jax.numpy as jnp

    cfg = cfg or infer_hunyuan_config(sd)

    # Conv3d patchify (h, C, pt, ph, pw) -> matmul over tokens flattened in
    # (ph, pw, C) order (model.py patchify transpose); pt folds in front.
    conv_w = _np(sd["img_in.proj.weight"])
    w = np.ascontiguousarray(
        conv_w.transpose(2, 3, 4, 1, 0).reshape(-1, conv_w.shape[0])
    )
    params: Dict[str, Any] = {
        "img_in": {"w": w, "b": _np(sd["img_in.proj.bias"])},
        "txt_in": {
            "input_embedder": _lin(sd, "txt_in.input_embedder"),
            "t_embedder": _mlp_embedder(
                sd, "txt_in.t_embedder.mlp.0", "txt_in.t_embedder.mlp.2"
            ),
            "c_embedder": _mlp_embedder(
                sd, "txt_in.c_embedder.linear_1", "txt_in.c_embedder.linear_2"
            ),
            "blocks": [
                _refiner_block_from(sd, i) for i in range(cfg.refiner_depth)
            ],
        },
        "time_in": _mlp_embedder(sd, "time_in.mlp.0", "time_in.mlp.2"),
        "vector_in": _mlp_embedder(sd, "vector_in.in_layer", "vector_in.out_layer"),
        "final_mod": {"lin": _lin(sd, "final_layer.adaLN_modulation.1")},
        "final_proj": _lin(sd, "final_layer.linear"),
    }
    if cfg.guidance_embed:
        params["guidance_in"] = _mlp_embedder(
            sd, "guidance_in.mlp.0", "guidance_in.mlp.2"
        )
    stack = lambda blocks: jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params["double"] = stack(
        [_double_block_from(sd, i) for i in range(cfg.depth_double)]
    )
    params["single"] = stack(
        [_single_block_from(sd, i) for i in range(cfg.depth_single)]
    )
    params = jax.tree.map(jnp.asarray, params)
    return params, cfg


def resolve_checkpoint_path(path: str, load_key: str = "module") -> str:
    """Directory -> weight file, mirroring inference.py:174-234: prefer
    ``pytorch_model_{load_key}.pt``, else the unique ``*.pt`` /
    ``*_model_states.pt`` file."""
    if os.path.isfile(path):
        return path
    preferred = os.path.join(path, f"pytorch_model_{load_key}.pt")
    if os.path.exists(preferred):
        return preferred
    files = sorted(
        f for f in os.listdir(path)
        if f.endswith(".pt") or f.endswith("_model_states.pt")
    )
    if len(files) != 1:
        raise ValueError(
            f"cannot resolve HunyuanVideo weights in {path!r}: "
            f"no pytorch_model_{load_key}.pt and {len(files)} .pt candidates"
        )
    return os.path.join(path, files[0])


def load_hunyuan_video(
    path: str, cfg: Optional[HunyuanVideoConfig] = None, load_key: str = "module"
):
    """Load released HunyuanVideo DiT weights -> (params, config)."""
    import torch

    sd = torch.load(
        resolve_checkpoint_path(path, load_key),
        map_location="cpu", weights_only=True,
    )
    if load_key in sd:
        sd = sd[load_key]
    elif "module" in sd:
        sd = sd["module"]
    return convert_hunyuan_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# inverse: pytree -> official state-dict layout
# ---------------------------------------------------------------------------


def _unlin(out, name, p):
    out[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["w"], np.float32).T)
    if "b" in p:
        out[f"{name}.bias"] = np.asarray(p["b"], np.float32)


def _unstack(stacked, i):
    import jax

    return jax.tree.map(lambda x: np.asarray(x[i], np.float32), stacked)


def export_hunyuan_state_dict(params, cfg: HunyuanVideoConfig) -> Dict[str, np.ndarray]:
    """Our pytree -> the official HYVideoDiffusionTransformer state-dict
    names (numpy values), so fine-tuned weights can be published in the
    layout the reference consumes."""
    sd: Dict[str, np.ndarray] = {}
    h = cfg.hidden_size
    pt, ph, pw = cfg.patch_size
    w = np.asarray(params["img_in"]["w"], np.float32)
    sd["img_in.proj.weight"] = np.ascontiguousarray(
        w.reshape(pt, ph, pw, cfg.in_channels, h).transpose(4, 3, 0, 1, 2)
    )
    sd["img_in.proj.bias"] = np.asarray(params["img_in"]["b"], np.float32)

    tx = params["txt_in"]
    _unlin(sd, "txt_in.input_embedder", tx["input_embedder"])
    _unlin(sd, "txt_in.t_embedder.mlp.0", tx["t_embedder"]["in"])
    _unlin(sd, "txt_in.t_embedder.mlp.2", tx["t_embedder"]["out"])
    _unlin(sd, "txt_in.c_embedder.linear_1", tx["c_embedder"]["in"])
    _unlin(sd, "txt_in.c_embedder.linear_2", tx["c_embedder"]["out"])
    for i, bp in enumerate(tx["blocks"]):
        b = f"txt_in.individual_token_refiner.blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.asarray(bp["norm1"]["scale"], np.float32)
        sd[f"{b}.norm1.bias"] = np.asarray(bp["norm1"]["bias"], np.float32)
        sd[f"{b}.norm2.weight"] = np.asarray(bp["norm2"]["scale"], np.float32)
        sd[f"{b}.norm2.bias"] = np.asarray(bp["norm2"]["bias"], np.float32)
        _unlin(sd, f"{b}.self_attn_qkv", bp["qkv"])
        _unlin(sd, f"{b}.self_attn_proj", bp["proj"])
        _unlin(sd, f"{b}.mlp.fc1", bp["mlp_in"])
        _unlin(sd, f"{b}.mlp.fc2", bp["mlp_out"])
        _unlin(sd, f"{b}.adaLN_modulation.1", bp["mod"]["lin"])

    _unlin(sd, "time_in.mlp.0", params["time_in"]["in"])
    _unlin(sd, "time_in.mlp.2", params["time_in"]["out"])
    _unlin(sd, "vector_in.in_layer", params["vector_in"]["in"])
    _unlin(sd, "vector_in.out_layer", params["vector_in"]["out"])
    if cfg.guidance_embed:
        _unlin(sd, "guidance_in.mlp.0", params["guidance_in"]["in"])
        _unlin(sd, "guidance_in.mlp.2", params["guidance_in"]["out"])
    _unlin(sd, "final_layer.adaLN_modulation.1", params["final_mod"]["lin"])
    _unlin(sd, "final_layer.linear", params["final_proj"])

    for i in range(cfg.depth_double):
        bp = _unstack(params["double"], i)
        b = f"double_blocks.{i}"
        _unlin(sd, f"{b}.img_mod.linear", bp["img_mod"]["lin"])
        _unlin(sd, f"{b}.txt_mod.linear", bp["txt_mod"]["lin"])
        _unlin(sd, f"{b}.img_attn_qkv", bp["img_qkv"])
        _unlin(sd, f"{b}.txt_attn_qkv", bp["txt_qkv"])
        sd[f"{b}.img_attn_q_norm.weight"] = bp["img_qnorm"]
        sd[f"{b}.img_attn_k_norm.weight"] = bp["img_knorm"]
        sd[f"{b}.txt_attn_q_norm.weight"] = bp["txt_qnorm"]
        sd[f"{b}.txt_attn_k_norm.weight"] = bp["txt_knorm"]
        _unlin(sd, f"{b}.img_attn_proj", bp["img_attn_out"])
        _unlin(sd, f"{b}.txt_attn_proj", bp["txt_attn_out"])
        _unlin(sd, f"{b}.img_mlp.fc1", bp["img_mlp_in"])
        _unlin(sd, f"{b}.img_mlp.fc2", bp["img_mlp_out"])
        _unlin(sd, f"{b}.txt_mlp.fc1", bp["txt_mlp_in"])
        _unlin(sd, f"{b}.txt_mlp.fc2", bp["txt_mlp_out"])
    for i in range(cfg.depth_single):
        bp = _unstack(params["single"], i)
        b = f"single_blocks.{i}"
        _unlin(sd, f"{b}.modulation.linear", bp["mod"]["lin"])
        _unlin(sd, f"{b}.linear1", bp["linear1"])
        _unlin(sd, f"{b}.linear2", bp["linear2"])
        sd[f"{b}.q_norm.weight"] = bp["qnorm"]
        sd[f"{b}.k_norm.weight"] = bp["knorm"]
    return sd
