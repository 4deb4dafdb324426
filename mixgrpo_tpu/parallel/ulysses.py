"""Ulysses (DeepSpeed-style) sequence parallelism via shard_map all_to_all.

TPU-native re-design of the reference's SP collectives
(zqqqqz2000/MixGRPO fastvideo/utils/communications.py:17-137
``_all_to_all_4D``/``SeqAllToAll4D`` and the attention integrations in
fastvideo/models/hunyuan/modules/attenion.py:35-90,
modeling_hunyuan.py:142-190, modeling_mochi.py:192-264): before attention,
all-to-all the sequence-sharded QKV into head-sharded full-sequence tensors;
after attention, the inverse.  Ulysses maps 1:1 onto a single ICI
``all_to_all`` per tensor — no torch autograd wrappers needed, the
collective is differentiable and the backward all_to_all is inserted by AD.

The reference runs the FLUX recipe with sp_size=1 (SURVEY.md §2.5); this is
the same off-by-default capability with scale headroom for >1024px (joint
sequences beyond one chip's attention working set).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

_SP_CONTEXT: Optional[Tuple[Mesh, str]] = None


def set_sp_context(mesh: Optional[Mesh], axis: str = "sp") -> None:
    """Install the mesh/axis used by ``attention(impl='ulysses')``."""
    global _SP_CONTEXT
    _SP_CONTEXT = (mesh, axis) if mesh is not None else None


def get_sp_context() -> Optional[Tuple[Mesh, str]]:
    return _SP_CONTEXT


def ulysses_attention(
    q, k, v, mesh: Mesh, axis: str = "sp", base_impl: str = "xla", mask=None
):
    """Attention over (B, H, S, D) with S sharded on ``axis``.

    Inside each shard: all_to_all scatters heads / gathers sequence
    (H -> H/sp, S/sp -> S), local full-sequence attention runs on the head
    slice, and the inverse all_to_all restores sequence sharding — exactly
    the reference's scatter_idx=2/gather_idx=1 then 1/2 pattern
    (hunyuan/modules/attenion.py:43-55).

    ``mask``: optional key-side boolean, (B, S) or (B, 1, 1, S), True =
    attend (HunyuanVideo's padded-text masking, modeling_hunyuan.py:142-190
    — the reference's only live SP consumer).  The mask is sequence-sharded
    alongside K/V and all-gathered inside the shard so local full-sequence
    attention sees all key validity bits.  Query-dependent (full S x S)
    masks are not supported under SP.
    """
    from jax import shard_map

    sp = mesh.shape[axis]
    H, S = q.shape[1], q.shape[2]
    assert H % sp == 0, f"heads {H} not divisible by sp={sp}"
    assert S % sp == 0, f"seq {S} not divisible by sp={sp}"
    if mask is not None:
        m = jax.numpy.asarray(mask)
        if m.ndim == 4:
            assert m.shape[1] == 1 and m.shape[2] == 1, (
                "ulysses attention supports key-side masks only, got "
                f"{m.shape}"
            )
            m = m[:, 0, 0, :]
        assert m.ndim == 2 and m.shape[-1] == S, (m.shape, S)

    def local(q, k, v, m):
        # local in: (B, H, S/sp, D) -> (B, H/sp, S, D)
        a2a = lambda x: jax.lax.all_to_all(
            x, axis, split_axis=1, concat_axis=2, tiled=True
        )
        q, k, v = a2a(q), a2a(k), a2a(v)
        from mixgrpo_tpu.ops.attention import attention

        local_mask = None
        if m is not None:
            # (B, S/sp) key bits -> (B, S): every head shard needs the full
            # key-validity row
            full = jax.lax.all_gather(m, axis, axis=1, tiled=True)
            local_mask = full[:, None, None, :]
        o = attention(q, k, v, mask=local_mask, impl=base_impl)
        return jax.lax.all_to_all(o, axis, split_axis=2, concat_axis=1, tiled=True)

    # Batch rides dp/fsdp when divisible (pure data parallelism inside the
    # shard_map — no collective touches it); otherwise replicated.
    from mixgrpo_tpu.parallel.sharding import batch_axes_for

    b = batch_axes_for(mesh, q.shape[0]) or None
    spec = P(b, None, axis, None)
    if mask is None:
        return shard_map(
            lambda q, k, v: local(q, k, v, None),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )(q, k, v)
    mspec = P(b, axis)
    return shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, mspec), out_specs=spec,
    )(q, k, v, m)
