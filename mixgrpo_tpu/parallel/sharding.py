"""Sharding rules: FSDP-style weight sharding + tensor parallel for FLUX.

TPU-native replacement for torch FSDP (zqqqqz2000/MixGRPO
fastvideo/utils/fsdp_util.py:69-117: auto-wrap at transformer blocks,
full/hybrid sharding strategies, bf16 mixed precision).  Here sharding is a
pytree of ``NamedSharding`` annotations; jit's SPMD partitioner inserts the
all-gathers/reduce-scatters that FSDP does imperatively.

Rules (path-pattern -> PartitionSpec over mesh axes (dp, fsdp, sp, tp)):
  - stacked block params keep the leading depth axis unsharded (scan dim);
  - big projections shard their *input or output feature dim* over "fsdp"
    (ZeRO-3-like: every weight split across the fsdp axis, gathered on use);
  - attention qkv / mlp-in shard the output dim over "tp"; attention-out /
    mlp-out shard the input dim over "tp" (Megatron layout), so within a
    block only one reduce lands on the residual stream;
  - small vectors (biases, norms) replicate.

``fsdp`` and ``tp`` shard *different dims* of the same weight where
possible, so they compose.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# path-regex -> spec for the *last dims* of the weight (leading stacked depth
# axis gets None automatically when ndim is one larger than the spec).
_FLUX_RULES = [
    # fused qkv / linear1 / mlp-in: (h_in, out) -> fsdp on in, tp on out
    (r"(img_qkv|txt_qkv|linear1|img_mlp_in|txt_mlp_in)/w$", P("fsdp", "tp")),
    (r"(img_qkv|txt_qkv|linear1|img_mlp_in|txt_mlp_in)/b$", P("tp")),
    # output projections: (in, h) -> tp on in, fsdp on out
    (r"(img_attn_out|txt_attn_out|linear2|img_mlp_out|txt_mlp_out)/w$", P("tp", "fsdp")),
    (r"(img_attn_out|txt_attn_out|linear2|img_mlp_out|txt_mlp_out)/b$", P()),
    # adaLN modulation heads: replicate over tp (chunked output), fsdp on in
    (r"(img_mod|txt_mod|mod|final_mod)/lin/w$", P("fsdp", None)),
    (r"(img_mod|txt_mod|mod|final_mod)/lin/b$", P()),
    # embedders: replicated.  They are tiny next to the block stacks
    # (context_embedder 4096x3072 is the largest), and fsdp-sharding their
    # output dim makes the backward dW dot demand hidden-sharded cotangents
    # while the block-scan cotangents are batch-sharded — an SPMD resharding
    # XLA can only do by involuntary full rematerialization (round-2 dryrun
    # warning, VERDICT #2).
    (r"(x_embedder|context_embedder|proj_out)/w$", P()),
    (r"(time_in|vector_in|guidance_in)/(in|out)/w$", P()),
    # everything else (biases, qk norms) replicated
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path_s: str, ndim: int, shape, mesh: Mesh) -> P:
    for pat, spec in _FLUX_RULES:
        if re.search(pat, path_s):
            parts = list(spec)
            # pad leading dims (stacked depth axis etc.) with None
            while len(parts) < ndim:
                parts.insert(0, None)
            parts = parts[:ndim]
            # drop shardings that do not divide the dim evenly
            out = []
            for dim, ax in zip(shape, parts):
                if ax is None:
                    out.append(None)
                    continue
                size = mesh.shape[ax] if isinstance(ax, str) else 1
                out.append(ax if size > 1 and dim % size == 0 else None)
            # canonical form: no trailing Nones.  jit's lowering cache keys
            # on exact spec equality and GSPMD emits canonical specs, so
            # P(None,) vs P() would recompile consumers across an update.
            while out and out[-1] is None:
                out.pop()
            return P(*out)
    return P()


def flux_param_specs(params: Any, mesh: Mesh) -> Any:
    """Pytree of NamedSharding matching ``params`` (works on shapes too)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [
        NamedSharding(mesh, _spec_for(_path_str(p), v.ndim, v.shape, mesh))
        for p, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place (and shard) a param pytree on the mesh."""
    return jax.device_put(params, flux_param_specs(params, mesh))


def shard_opt_state(opt_state: Any, mesh: Mesh) -> Any:
    """Eagerly place a fresh optimizer state on the mesh by the param rules.

    ``optax``'s ``init`` builds ``mu``/``nu`` with ``zeros_like(params)``
    (inheriting the param shardings) but creates scalar state (``count``)
    as single-device arrays; a jitted update step then returns those
    replicated, which changes the call signature and recompiles the whole
    full-depth update once.  mu/nu leaf paths carry the param paths as
    suffixes, so the same rule table applies.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    out = [
        jax.device_put(
            v,
            NamedSharding(mesh, _spec_for(_path_str(p), v.ndim, v.shape, mesh)),
        )
        for p, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def constrain_params_sharding(params: Any) -> Any:
    """Pin a param-structured pytree (params or grads) to the rule shardings
    inside jit; no-op without an installed activation mesh.

    Without this, the grads coming out of ``jax.grad`` carry whatever
    shardings GSPMD propagated through the backward, and the updated
    params inherit them — the recipe-shape dryrun measured 33/52 leaves
    drifting off the FSDP rules after one update, which both recompiles
    every other program consuming params (rollout) and abandons the
    designed weight layout.  Constraining grads + outputs keeps the whole
    train state on the rule shardings across steps.
    """
    mesh = _ACT_MESH[0]
    if mesh is None:
        return params
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [
        jax.lax.with_sharding_constraint(
            v,
            NamedSharding(mesh, _spec_for(_path_str(p), v.ndim, v.shape, mesh)),
        )
        for p, v in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def data_spec(mesh: Mesh, ndim: int, batch_axes=("dp", "fsdp")) -> NamedSharding:
    """Batch sharded over dp+fsdp (fsdp doubles as data parallel for
    activations — ZeRO-3 semantics), rest replicated."""
    axes = tuple(a for a in batch_axes if mesh.shape[a] > 1)
    lead = axes if axes else None
    return NamedSharding(mesh, P(lead, *([None] * (ndim - 1))))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# activation sharding (attention tensors)
# ---------------------------------------------------------------------------
#
# Under a tp (and/or sp) mesh, XLA's sharding propagation has to pick a
# layout for the joint-sequence concat of the text/image Q/K/V streams
# ((B, H, S, D), concat on S).  Left to itself it can pick conflicting
# shardings on either side of the concat and fall back to "involuntary full
# rematerialization" — replicating the tensor every rollout step (observed
# in the round-2 8-device dryrun).  Pinning the attention activations to
# the natural layout (batch on dp/fsdp, heads on tp, sequence on sp) keeps
# the concat, RoPE, and attention all on one consistent sharding.  The
# reference's counterpart is its hand-rolled head resharding
# (fastvideo/utils/communications.py:17-100).

_ACT_MESH = [None]


def set_activation_mesh(mesh: Mesh | None) -> None:
    """Install (or clear) the mesh used by :func:`constrain_attn`."""
    _ACT_MESH[0] = mesh


def get_activation_mesh() -> Mesh | None:
    return _ACT_MESH[0]


def batch_axes_for(mesh: Mesh, dim: int, axes=("dp", "fsdp")):
    """The (dp, fsdp) axes usable to shard a batch dim of size ``dim``."""
    use = tuple(a for a in axes if mesh.shape.get(a, 1) > 1)
    total = 1
    for a in use:
        total *= mesh.shape[a]
    return use if use and dim % total == 0 else ()


def constrain_attn(x, layout: str = "bhsd"):
    """Sharding constraint for split-head attention activations —
    (B, H, S, D), or (B, S, H, D) with ``layout="bshd"``.

    Batch -> (dp, fsdp), heads -> tp, sequence -> sp — each only when the
    dim divides evenly; no-op when no activation mesh is installed.
    """
    mesh = _ACT_MESH[0]
    if mesh is None or x.ndim != 4:
        return x
    if layout == "bshd":
        B, S, H, _ = x.shape
    else:
        B, H, S, _ = x.shape
    b = batch_axes_for(mesh, B) or None
    tp = mesh.shape.get("tp", 1)
    sp = mesh.shape.get("sp", 1)
    h = "tp" if tp > 1 and H % tp == 0 else None
    s = "sp" if sp > 1 and S % sp == 0 else None
    if b is None and h is None and s is None:
        return x
    spec = P(b, s, h, None) if layout == "bshd" else P(b, h, s, None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def constrain_residual(x):
    """Sharding constraint for (B, S, hidden) residual-stream activations.

    Batch on (dp, fsdp), sequence and hidden replicated — the Megatron
    layout (tp shards weights and attention heads, never the residual
    stream).  Applied at the block-scan carry boundary so the backward
    (transposed) scan keeps one consistent layout instead of SPMD guessing
    a hidden-dim sharding from the fsdp-sharded embedder weights.
    """
    mesh = _ACT_MESH[0]
    if mesh is None or x.ndim != 3:
        return x
    b = batch_axes_for(mesh, x.shape[0]) or None
    if b is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(b, None, None))
    )


# ---------------------------------------------------------------------------
# multi-host batch placement
# ---------------------------------------------------------------------------
#
# On a pod each process loads its OWN prompt shard (host-local batch); the
# jitted SPMD functions consume *global* arrays.  ``jax.device_put`` with a
# mesh-wide NamedSharding expects the global value, so host-local data must
# go through host_local_array_to_global_array (and back for host-side reward
# scoring, where captions are process-local).  The reference's analogue is
# per-rank batches + NCCL all_gathers (train_grpo_flux.py:332-338,417-425).


def put_global_batch(mesh: Mesh, x, dtype=None):
    """Place a process-local batch (leading dim = local rows) on the mesh as
    a global dp-sharded array.  Single-process: a plain device_put."""
    import numpy as np

    x = np.asarray(x)
    if dtype is not None:
        x = x.astype(dtype)
    spec = data_spec(mesh, x.ndim)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            x, mesh, spec.spec
        )
    return jax.device_put(x, spec)


def get_local_batch(mesh: Mesh, x):
    """This process's rows of a global batch-sharded array, as numpy —
    aligned with the local rows that :func:`put_global_batch` contributed."""
    import numpy as np

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.global_array_to_host_local_array(
                x, mesh, data_spec(mesh, x.ndim).spec
            )
        )
    return np.asarray(x)
