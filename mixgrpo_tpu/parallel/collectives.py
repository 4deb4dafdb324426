"""Named-axis collective helpers (reference communications.py parity).

The reference implements autograd-aware NCCL wrappers
(zqqqqz2000/MixGRPO fastvideo/utils/communications.py: ``all_to_all_4D``
head/seq resharding :17-137, ``all_gather`` with split backward :201-237,
``broadcast``, plus the SP dataloader wrapper).  Under JAX, collectives are
``jax.lax`` primitives inside ``shard_map`` — differentiable by
construction — so these helpers are thin, documented aliases used by the
Ulysses layer and tests.  All must be called inside a ``shard_map`` (or
other named-axis context).
"""

from __future__ import annotations

import jax


def all_to_all_heads_to_seq(x, axis: str):
    """(B, H, S/sp, D) -> (B, H/sp, S, D) — scatter heads, gather sequence
    (communications.py scatter_idx=1(H)/gather_idx=2(S) after batch dim)."""
    return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2, tiled=True)


def all_to_all_seq_to_heads(x, axis: str):
    """(B, H/sp, S, D) -> (B, H, S/sp, D) — the inverse resharding."""
    return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1, tiled=True)


def all_gather_seq(x, axis: str, dim: int = 1):
    """Gather a sequence-sharded tensor along ``dim`` (communications.py
    ``all_gather``; backward is the matching slice, provided by AD)."""
    return jax.lax.all_gather(x, axis, axis=dim, tiled=True)


def psum(x, axis: str):
    return jax.lax.psum(x, axis)


def pmean(x, axis: str):
    return jax.lax.pmean(x, axis)


def broadcast_from(x, axis: str, src: int = 0):
    """Every shard takes shard ``src``'s value (communications.py
    ``broadcast`` from the SP group leader)."""
    full = jax.lax.all_gather(x, axis, axis=0)
    return full[src]
