"""Ring attention (context parallelism) via shard_map + ppermute.

The reference exposes a ``--ring-degree`` flag for its legacy inference
path but never implements ring attention (zqqqqz2000/MixGRPO
fastvideo/models/hunyuan/idle_config.py:381-399 is a config stub; SURVEY.md
§2.5 "TP / PP / EP / CP / ring attention: absent").  This module is the
TPU-native realization of that stub: the joint sequence is sharded over a
mesh axis, each device keeps its Q block resident, and K/V blocks rotate
around the ring with ``jax.lax.ppermute`` while a streaming (online-
softmax) accumulator builds the exact attention output.

Compared to Ulysses (parallel/ulysses.py), ring attention

  - never materializes the full sequence on any device: peak activation
    per device is O((S/sp)^2) scores + the resident Q/K/V blocks, so it
    scales to sequences Ulysses cannot hold after its all_to_all;
  - does not require ``heads % sp == 0`` (it shards sequence only), so it
    composes with tensor-parallel head sharding at any degree;
  - overlaps compute with ICI transfer: each ppermute hop moves the next
    K/V block while the current block's partial attention runs.

All ops are differentiable (``ppermute`` transposes to the reverse
permutation under AD), so the same code path serves rollout and the PPO
update's recomputed-log-prob backward.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30  # finite mask fill: keeps the running max well-defined


def _ring_local(q, k, v, m, axis: str, sp: int, scale: float):
    """Streaming-softmax attention over the ring.

    q, k, v: local blocks (B, H, S/sp, D); m: local key-validity bits
    (B, S/sp) or None.  Returns the exact (B, H, S/sp, D) output for the
    local queries against the *global* key/value sequence.
    """
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    B, H, Sq, D = q.shape
    qf = q.astype(jnp.float32) * scale

    acc = jnp.zeros((B, H, Sq, D), jnp.float32)
    denom = jnp.zeros((B, H, Sq), jnp.float32)
    run_max = jnp.full((B, H, Sq), _NEG, jnp.float32)

    # sp is static (mesh shape), so a Python loop unrolls into sp chunk
    # steps; XLA overlaps each ppermute with the previous chunk's matmuls.
    for step in range(sp):
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if m is not None:
            s = jnp.where(m[:, None, None, :], s, _NEG)
        new_max = jnp.maximum(run_max, s.max(axis=-1))
        corr = jnp.exp(run_max - new_max)
        p = jnp.exp(s - new_max[..., None])
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        denom = denom * corr + p.sum(axis=-1)
        run_max = new_max
        if step != sp - 1:
            k = jax.lax.ppermute(k, axis, perm)
            v = jax.lax.ppermute(v, axis, perm)
            if m is not None:
                m = jax.lax.ppermute(m, axis, perm)

    return (acc / denom[..., None]).astype(v.dtype)


def ring_attention(
    q, k, v, mesh: Mesh, axis: str = "sp", mask=None
):
    """Exact attention over (B, H, S, D) with S sharded on ``axis``.

    ``mask``: optional key-side boolean, (B, S) or (B, 1, 1, S), True =
    attend — the same contract as ulysses_attention (padded-text masking;
    query-dependent S x S masks are not supported under SP).
    """
    sp = mesh.shape[axis]
    S = q.shape[2]
    assert S % sp == 0, f"seq {S} not divisible by ring degree {sp}"
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)

    m: Optional[jax.Array] = None
    if mask is not None:
        m = jnp.asarray(mask)
        if m.ndim == 4:
            assert m.shape[1] == 1 and m.shape[2] == 1, (
                f"ring attention supports key-side masks only, got {m.shape}"
            )
            m = m[:, 0, 0, :]
        assert m.ndim == 2 and m.shape[-1] == S, (m.shape, S)

    from jax import shard_map

    from mixgrpo_tpu.parallel.sharding import batch_axes_for

    b = batch_axes_for(mesh, q.shape[0]) or None
    spec = P(b, None, axis, None)
    if m is None:
        return shard_map(
            lambda q, k, v: _ring_local(q, k, v, None, axis, sp, scale),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        )(q, k, v)
    mspec = P(b, axis)
    return shard_map(
        lambda q, k, v, m: _ring_local(q, k, v, m, axis, sp, scale),
        mesh=mesh, in_specs=(spec, spec, spec, mspec), out_specs=spec,
    )(q, k, v, m)
