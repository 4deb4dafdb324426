"""LoRA adapters for the FLUX MMDiT (and any param pytree).

Counterpart of the reference's LoRA checkpoint path
(zqqqqz2000/MixGRPO fastvideo/utils/checkpoint.py:257-314
``save_lora_checkpoint``/``resume_lora_optimizer`` via peft).  Here LoRA is
a parallel pytree of low-rank factors over selected weight leaves:

    w_eff = w + (a @ b) * (alpha / rank)

Stacked block weights (depth, in, out) get per-depth factors
(depth, in, r) x (depth, r, out), so the scanned-block structure is
preserved.  ``lora_train_step`` builds updates that differentiate only the
adapter params — the 12B base stays frozen (and can live in bf16).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = r"(qkv|linear1|linear2|attn_out|mlp_in|mlp_out)/w$"


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def init_lora(
    key,
    params: Any,
    rank: int = 16,
    alpha: float = 16.0,
    targets: str = DEFAULT_TARGETS,
) -> Dict[str, Any]:
    """Build the adapter pytree: {"factors": {path: {a, b}}, meta}."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    factors = {}
    keys = jax.random.split(key, len(flat))
    for (path, leaf), k in zip(flat, keys):
        ps = _path_str(path)
        if leaf.ndim < 2 or not re.search(targets, ps):
            continue
        *lead, din, dout = leaf.shape
        a = jax.random.normal(k, (*lead, din, rank), jnp.float32) * (din**-0.5)
        b = jnp.zeros((*lead, rank, dout), jnp.float32)
        factors[ps] = {"a": a, "b": b}
    return {"factors": factors, "rank": rank, "alpha": alpha}


def apply_lora(params: Any, lora: Dict[str, Any]) -> Any:
    """Merge adapters into an effective param pytree (pure)."""
    scale = lora["alpha"] / lora["rank"]
    factors = lora["factors"]

    def merge(path, leaf):
        ps = _path_str(path)
        if ps not in factors:
            return leaf
        f = factors[ps]
        delta = jnp.einsum("...ir,...ro->...io", f["a"], f["b"]) * scale
        return leaf + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def merge_lora(params: Any, lora: Dict[str, Any]) -> Any:
    """Permanently fold adapters into the weights (for export)."""
    return apply_lora(params, lora)


def save_lora(lora: Dict[str, Any], path: str) -> None:
    import numpy as np
    from safetensors.numpy import save_file

    st = {}
    for ps, f in lora["factors"].items():
        st[f"{ps}.lora_A"] = np.asarray(jax.device_get(f["a"]), np.float32)
        st[f"{ps}.lora_B"] = np.asarray(jax.device_get(f["b"]), np.float32)
    save_file(st, path, metadata={
        "rank": str(lora["rank"]), "alpha": str(lora["alpha"]),
    })


def load_lora(path: str) -> Dict[str, Any]:
    from safetensors import safe_open

    factors: Dict[str, Any] = {}
    with safe_open(path, framework="numpy") as f:
        meta = f.metadata() or {}
        for name in f.keys():
            base, kind = name.rsplit(".", 1)
            factors.setdefault(base, {})[
                "a" if kind == "lora_A" else "b"
            ] = jnp.asarray(f.get_tensor(name))
    return {
        "factors": factors,
        "rank": int(meta.get("rank", 16)),
        "alpha": float(meta.get("alpha", 16.0)),
    }


def lora_loss_fn(base_params, lora, loss_of_params):
    """Compose: differentiate ``loss_of_params(apply_lora(base, lora))``
    with respect to the adapters only."""
    return loss_of_params(apply_lora(base_params, lora))
