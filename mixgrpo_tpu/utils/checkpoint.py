"""Orbax checkpointing + diffusers-format safetensors export.

Counterpart of fastvideo/utils/checkpoint.py (zqqqqz2000/MixGRPO):
  - the reference all-gathers FSDP FULL_STATE_DICT to rank-0 CPU and writes
    ``diffusion_pytorch_model.safetensors`` (:65-88); here Orbax writes
    *sharded* checkpoints directly from device memory (every host writes
    its shards — no gather, no host OOM at 12B params);
  - full resume (params + optimizer + step) mirrors :228-254;
  - **improvement over the reference** (SURVEY.md §5): the sliding-window
    scheduler state and the config are checkpointed too, so resume
    continues the window walk instead of restarting it (the reference's
    GRPO trainer raises NotImplementedError on resume,
    train_grpo_flux.py:781-783);
  - ``export_flux_safetensors`` writes diffusers-named weights so trained
    checkpoints drop into the reference's inference stack.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        params: Any,
        opt_state: Any = None,
        window_state: Optional[dict] = None,
        extra: Optional[dict] = None,
        ema_params: Any = None,
        blocking: bool = True,
    ) -> None:
        """``blocking=False`` returns as soon as device arrays are staged to
        host; the disk write proceeds in Orbax's background thread so the
        training step after a periodic checkpoint is not stalled (the
        reference blocks every rank on a full FSDP state-dict gather,
        checkpoint.py:65-88).  Orbax serializes overlapping saves; call
        :meth:`close` (or a blocking save) to guarantee durability."""
        import orbax.checkpoint as ocp

        items = {"params": ocp.args.StandardSave(params)}
        if opt_state is not None:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        if ema_params is not None:
            items["ema_params"] = ocp.args.StandardSave(ema_params)
        meta = {"window_state": window_state, "extra": extra or {}, "step": step}
        items["meta"] = ocp.args.JsonSave(meta)
        self._mgr.save(step, args=ocp.args.Composite(**items))
        if blocking:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self,
        step: Optional[int] = None,
        params_template: Any = None,
        opt_state_template: Any = None,
        ema_template: Any = None,
    ) -> Tuple[Any, Any, Optional[dict], int]:
        """Returns (params, opt_state, window_state, step).  When
        ``ema_template`` is given and the checkpoint contains EMA state,
        it is returned via :meth:`last_ema` (set as ``self._last_ema``)."""
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoint under {self.directory}"
        items: Dict[str, Any] = {"meta": ocp.args.JsonRestore()}
        items["params"] = ocp.args.StandardRestore(params_template)
        if opt_state_template is not None:
            items["opt_state"] = ocp.args.StandardRestore(opt_state_template)
        if ema_template is not None and "ema_params" in self._item_names(step):
            items["ema_params"] = ocp.args.StandardRestore(ema_template)
        out = self._mgr.restore(step, args=ocp.args.Composite(**items))
        meta = out["meta"]
        self._last_ema = out.get("ema_params")
        return (
            out["params"],
            out.get("opt_state"),
            meta.get("window_state"),
            meta["step"],
        )

    def _item_names(self, step: int):
        """Item subdirectories present in a checkpoint step."""
        d = os.path.join(self.directory, str(step))
        try:
            return [n for n in os.listdir(d) if os.path.isdir(os.path.join(d, n))]
        except OSError:
            return []

    def last_ema(self) -> Any:
        """EMA pytree from the most recent :meth:`restore`, if present."""
        return getattr(self, "_last_ema", None)

    def close(self):
        self._mgr.close()


# ---------------------------------------------------------------------------
# diffusers interop export (inverse of models/flux/load.py)
# ---------------------------------------------------------------------------


def _np(x):
    return np.asarray(jax.device_get(x), np.float32)


def export_flux_safetensors(params: Any, cfg, path: str) -> None:
    """Write FLUX params as diffusers ``FluxTransformer2DModel`` names.

    Output matches what the reference's ``save_checkpoint`` produces
    (checkpoint.py:65-88), so our trained weights load into diffusers (and
    into our own ``load_flux_params``).
    """
    st: Dict[str, np.ndarray] = {}

    def lin(name, p):
        # safetensors serializes the raw buffer: must be C-contiguous
        st[f"{name}.weight"] = np.ascontiguousarray(_np(p["w"]).T)
        if "b" in p:
            st[f"{name}.bias"] = _np(p["b"])

    def lin_split(names, p, sizes):
        w = _np(p["w"]).T  # (out, in)
        b = _np(p["b"]) if "b" in p else None
        off = 0
        for name, s in zip(names, sizes):
            st[f"{name}.weight"] = np.ascontiguousarray(w[off : off + s])
            if b is not None:
                st[f"{name}.bias"] = np.ascontiguousarray(b[off : off + s])
            off += s

    def embedder(name, p):
        lin(f"{name}.linear_1", p["in"])
        lin(f"{name}.linear_2", p["out"])

    lin("x_embedder", params["x_embedder"])
    lin("context_embedder", params["context_embedder"])
    embedder("time_text_embed.timestep_embedder", params["time_in"])
    embedder("time_text_embed.text_embedder", params["vector_in"])
    if "guidance_in" in params:
        embedder("time_text_embed.guidance_embedder", params["guidance_in"])
    lin("norm_out.linear", params["final_mod"]["lin"])
    lin("proj_out", params["proj_out"])

    h, mh = cfg.hidden_size, cfg.mlp_hidden
    for i in range(cfg.depth_double):
        p = jax.tree.map(lambda x: x[i], params["double"])
        b = f"transformer_blocks.{i}"
        lin(f"{b}.norm1.linear", p["img_mod"]["lin"])
        lin(f"{b}.norm1_context.linear", p["txt_mod"]["lin"])
        lin_split(
            [f"{b}.attn.to_q", f"{b}.attn.to_k", f"{b}.attn.to_v"],
            p["img_qkv"], [h, h, h],
        )
        lin_split(
            [f"{b}.attn.add_q_proj", f"{b}.attn.add_k_proj", f"{b}.attn.add_v_proj"],
            p["txt_qkv"], [h, h, h],
        )
        st[f"{b}.attn.norm_q.weight"] = _np(p["img_qnorm"])
        st[f"{b}.attn.norm_k.weight"] = _np(p["img_knorm"])
        st[f"{b}.attn.norm_added_q.weight"] = _np(p["txt_qnorm"])
        st[f"{b}.attn.norm_added_k.weight"] = _np(p["txt_knorm"])
        lin(f"{b}.attn.to_out.0", p["img_attn_out"])
        lin(f"{b}.attn.to_add_out", p["txt_attn_out"])
        lin(f"{b}.ff.net.0.proj", p["img_mlp_in"])
        lin(f"{b}.ff.net.2", p["img_mlp_out"])
        lin(f"{b}.ff_context.net.0.proj", p["txt_mlp_in"])
        lin(f"{b}.ff_context.net.2", p["txt_mlp_out"])

    for i in range(cfg.depth_single):
        p = jax.tree.map(lambda x: x[i], params["single"])
        b = f"single_transformer_blocks.{i}"
        lin(f"{b}.norm.linear", p["mod"]["lin"])
        lin_split(
            [f"{b}.attn.to_q", f"{b}.attn.to_k", f"{b}.attn.to_v", f"{b}.proj_mlp"],
            p["linear1"], [h, h, h, mh],
        )
        st[f"{b}.attn.norm_q.weight"] = _np(p["qnorm"])
        st[f"{b}.attn.norm_k.weight"] = _np(p["knorm"])
        lin(f"{b}.proj_out", p["linear2"])

    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    save_file(st, path)
