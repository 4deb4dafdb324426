"""CLIP weight loading: HF `CLIPModel` and OpenCLIP checkpoint formats.

Covers the reward zoo's three checkpoint flavors (SURVEY.md §2.1):
  - HF CLIP safetensors (PickScore: yuvalkirstain/PickScore_v1)
  - OpenCLIP state dicts (.pt/.bin — HPS_v2.1_compressed.pt which nests
    under 'state_dict', DFN5B open_clip_pytorch_model.bin)
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from mixgrpo_tpu.models.text.clip import CLIPConfig


def _to_np(t):
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16/fp16) without importing torch globally
    return np.asarray(t.float().cpu().numpy() if hasattr(t, "float") else t)


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.bin (HPS nests under 'state_dict') or safetensors."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: _to_np(v) for k, v in obj.items()}


# ---------------------------------------------------------------------------
# checkpoint-config introspection
# ---------------------------------------------------------------------------
#
# The reference builds CLIP reward towers from the checkpoint's own config
# (open_clip ``create_model_from_pretrained``, reward_model/clip_score.py:39
# — reads the hub repo's config JSON), so quick-GELU variants like DFN5B
# are constructed correctly by construction.  Equivalent here: read the
# config JSON shipped next to the weights instead of hard-coding vit_h_14.


def clip_config_from_json(cfg: dict, image_size=None) -> CLIPConfig:
    """Build a CLIPConfig from either config flavor:

    - HF ``CLIPModel`` config.json: ``vision_config``/``text_config`` with
      hidden_size / num_hidden_layers / num_attention_heads / image_size /
      patch_size / hidden_act / projection_dim;
    - open_clip ``open_clip_config.json``: ``model_cfg`` with ``embed_dim``,
      ``quick_gelu`` and ``vision_cfg``/``text_cfg`` (width, layers,
      head_width | heads, image_size, patch_size, context_length, vocab_size).
    """
    from mixgrpo_tpu.models.text.clip import CLIPConfig, CLIPTowerConfig

    if "model_cfg" in cfg:  # open_clip flavor
        m = cfg["model_cfg"]
        v, t = m["vision_cfg"], m["text_cfg"]
        v_width = v["width"]
        v_heads = v_width // v.get("head_width", 64)
        vision = CLIPTowerConfig(
            width=v_width, layers=v["layers"], heads=v_heads,
            patch=v.get("patch_size", 14),
            image_size=image_size or v.get("image_size", 224),
        )
        text = CLIPTowerConfig(
            width=t["width"], layers=t["layers"],
            heads=t.get("heads", t["width"] // 64),
            vocab=t.get("vocab_size", 49408),
            context=t.get("context_length", 77),
        )
        return CLIPConfig(
            embed_dim=m["embed_dim"], vision=vision, text=text,
            quick_gelu=bool(m.get("quick_gelu", False)),
        )

    v, t = cfg["vision_config"], cfg["text_config"]
    vision = CLIPTowerConfig(
        width=v["hidden_size"], layers=v["num_hidden_layers"],
        heads=v["num_attention_heads"], patch=v.get("patch_size", 14),
        image_size=image_size or v.get("image_size", 224),
    )
    text = CLIPTowerConfig(
        width=t["hidden_size"], layers=t["num_hidden_layers"],
        heads=t["num_attention_heads"], vocab=t.get("vocab_size", 49408),
        context=t.get("max_position_embeddings", 77),
    )
    return CLIPConfig(
        embed_dim=cfg.get("projection_dim", 512), vision=vision, text=text,
        quick_gelu=v.get("hidden_act", "gelu") == "quick_gelu",
    )


def find_clip_config(path: str):
    """Locate the config JSON for a checkpoint path (file or directory):
    ``open_clip_config.json`` then ``config.json`` in the directory (or the
    file's parent).  Returns the parsed dict or None."""
    import json
    import os

    d = path if os.path.isdir(path) else os.path.dirname(os.path.abspath(path))
    for name in ("open_clip_config.json", "config.json"):
        p = os.path.join(d, name)
        if os.path.exists(p):
            with open(p) as f:
                cfg = json.load(f)
            if "model_cfg" in cfg or "vision_config" in cfg:
                return cfg
    return None


def clip_config_from_checkpoint(
    path: str, image_size=None, default=None
) -> CLIPConfig:
    """Config introspected from the checkpoint dir; falls back to
    ``default`` (or ViT-H-14) with a warning when no config JSON exists
    (e.g. a bare HPS_v2.1_compressed.pt — which *is* ViT-H-14)."""
    cfg = find_clip_config(path)
    if cfg is not None:
        return clip_config_from_json(cfg, image_size=image_size)
    if default is not None:
        return default
    import warnings

    warnings.warn(
        f"no config JSON next to {path!r}; assuming OpenCLIP ViT-H-14 "
        "geometry (quick_gelu=False)"
    )
    return CLIPConfig.vit_h_14(image_size=image_size or 224)


def _ln(st, name):
    return {"scale": st[f"{name}.weight"].astype(np.float32),
            "bias": st[f"{name}.bias"].astype(np.float32)}


def _lin(st, name):
    return {"w": np.ascontiguousarray(st[f"{name}.weight"].astype(np.float32).T),
            "b": st[f"{name}.bias"].astype(np.float32)}


def _stack(dicts):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *dicts)


def _finish(params):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(jnp.asarray, params)


# ---------------------------------------------------------------------------
# HF CLIPModel naming
# ---------------------------------------------------------------------------


def load_clip_hf(state: Dict[str, np.ndarray], cfg: CLIPConfig):
    """Map transformers ``CLIPModel`` names onto our pytree."""
    st = state

    def blocks(prefix, n):
        out = []
        for i in range(n):
            b = f"{prefix}.layers.{i}"
            qkv_w = np.concatenate(
                [st[f"{b}.self_attn.{x}_proj.weight"] for x in "qkv"], axis=0
            ).astype(np.float32)
            qkv_b = np.concatenate(
                [st[f"{b}.self_attn.{x}_proj.bias"] for x in "qkv"]
            ).astype(np.float32)
            out.append({
                "ln1": _ln(st, f"{b}.layer_norm1"),
                "qkv": {"w": np.ascontiguousarray(qkv_w.T), "b": qkv_b},
                "out": _lin(st, f"{b}.self_attn.out_proj"),
                "ln2": _ln(st, f"{b}.layer_norm2"),
                "fc1": _lin(st, f"{b}.mlp.fc1"),
                "fc2": _lin(st, f"{b}.mlp.fc2"),
            })
        return _stack(out)

    vp = "vision_model"
    patch = st[f"{vp}.embeddings.patch_embedding.weight"].astype(np.float32)
    vision = {
        "patch_embed": {"w": np.ascontiguousarray(patch.transpose(2, 3, 1, 0))},
        "class_emb": st[f"{vp}.embeddings.class_embedding"].astype(np.float32),
        "pos_emb": st[f"{vp}.embeddings.position_embedding.weight"].astype(np.float32),
        # HF's historical typo: "pre_layrnorm"
        "ln_pre": _ln(
            st, f"{vp}.pre_layrnorm" if f"{vp}.pre_layrnorm.weight" in st
            else f"{vp}.pre_layernorm"
        ),
        "blocks": blocks(f"{vp}.encoder", cfg.vision.layers),
        "ln_post": _ln(st, f"{vp}.post_layernorm"),
        "proj": np.ascontiguousarray(
            st["visual_projection.weight"].astype(np.float32).T
        ),
    }
    tp = "text_model"
    text = {
        "token_emb": st[f"{tp}.embeddings.token_embedding.weight"].astype(np.float32),
        "pos_emb": st[f"{tp}.embeddings.position_embedding.weight"].astype(np.float32),
        "blocks": blocks(f"{tp}.encoder", cfg.text.layers),
        "ln_final": _ln(st, f"{tp}.final_layer_norm"),
        "proj": np.ascontiguousarray(st["text_projection.weight"].astype(np.float32).T),
    }
    return _finish({
        "vision": vision,
        "text": text,
        "logit_scale": st["logit_scale"].astype(np.float32).reshape(()),
    })


def load_clip_hf_text_only(state: Dict[str, np.ndarray], cfg: CLIPConfig):
    """Text tower only (FLUX's ``text_encoder`` dir is a bare CLIPTextModel
    with no vision weights and no projection)."""
    st = state

    def blocks(prefix, n):
        out = []
        for i in range(n):
            b = f"{prefix}.layers.{i}"
            qkv_w = np.concatenate(
                [st[f"{b}.self_attn.{x}_proj.weight"] for x in "qkv"], axis=0
            ).astype(np.float32)
            qkv_b = np.concatenate(
                [st[f"{b}.self_attn.{x}_proj.bias"] for x in "qkv"]
            ).astype(np.float32)
            out.append({
                "ln1": _ln(st, f"{b}.layer_norm1"),
                "qkv": {"w": np.ascontiguousarray(qkv_w.T), "b": qkv_b},
                "out": _lin(st, f"{b}.self_attn.out_proj"),
                "ln2": _ln(st, f"{b}.layer_norm2"),
                "fc1": _lin(st, f"{b}.mlp.fc1"),
                "fc2": _lin(st, f"{b}.mlp.fc2"),
            })
        return _stack(out)

    tp = "text_model"
    width = st[f"{tp}.embeddings.token_embedding.weight"].shape[1]
    text = {
        "token_emb": st[f"{tp}.embeddings.token_embedding.weight"].astype(np.float32),
        "pos_emb": st[f"{tp}.embeddings.position_embedding.weight"].astype(np.float32),
        "blocks": blocks(f"{tp}.encoder", cfg.text.layers),
        "ln_final": _ln(st, f"{tp}.final_layer_norm"),
        "proj": (
            np.ascontiguousarray(st["text_projection.weight"].astype(np.float32).T)
            if "text_projection.weight" in st
            else np.eye(width, dtype=np.float32)
        ),
    }
    return _finish({"text": text, "logit_scale": np.float32(0.0)})


# ---------------------------------------------------------------------------
# OpenCLIP naming
# ---------------------------------------------------------------------------


def load_clip_openclip(state: Dict[str, np.ndarray], cfg: CLIPConfig):
    """Map OpenCLIP state-dict names (visual.*, transformer.*, ...)."""
    st = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
          for k, v in state.items()}

    def blocks(prefix, n):
        out = []
        for i in range(n):
            b = f"{prefix}.resblocks.{i}"
            w = st[f"{b}.attn.in_proj_weight"].astype(np.float32)
            bb = st[f"{b}.attn.in_proj_bias"].astype(np.float32)
            out.append({
                "ln1": _ln(st, f"{b}.ln_1"),
                "qkv": {"w": np.ascontiguousarray(w.T), "b": bb},
                "out": _lin(st, f"{b}.attn.out_proj"),
                "ln2": _ln(st, f"{b}.ln_2"),
                "fc1": _lin(st, f"{b}.mlp.c_fc"),
                "fc2": _lin(st, f"{b}.mlp.c_proj"),
            })
        return _stack(out)

    patch = st["visual.conv1.weight"].astype(np.float32)  # (w, 3, p, p), no bias
    vision = {
        "patch_embed": {"w": np.ascontiguousarray(patch.transpose(2, 3, 1, 0))},
        "class_emb": st["visual.class_embedding"].astype(np.float32),
        "pos_emb": st["visual.positional_embedding"].astype(np.float32),
        "ln_pre": _ln(st, "visual.ln_pre"),
        "blocks": blocks("visual.transformer", cfg.vision.layers),
        "ln_post": _ln(st, "visual.ln_post"),
        "proj": st["visual.proj"].astype(np.float32),  # already (width, embed)
    }
    text = {
        "token_emb": st["token_embedding.weight"].astype(np.float32),
        "pos_emb": st["positional_embedding"].astype(np.float32),
        "blocks": blocks("transformer", cfg.text.layers),
        "ln_final": _ln(st, "ln_final"),
        "proj": st["text_projection"].astype(np.float32),
    }
    return _finish({
        "vision": vision,
        "text": text,
        "logit_scale": st["logit_scale"].astype(np.float32).reshape(()),
    })
