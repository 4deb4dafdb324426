"""Mesh + sharding on the 8-device virtual CPU mesh.

This is the multi-chip test story (SURVEY.md §4): real mesh-sharded
programs compiled and executed on virtual devices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mixgrpo_tpu.models.flux import (
    FluxConfig, flux_forward, init_flux, make_image_ids, make_text_ids,
    rope_tables,
)
from mixgrpo_tpu.parallel import (
    MeshConfig, data_spec, flux_param_specs, make_mesh, shard_params,
)


pytestmark = pytest.mark.slow


def _tiny_inputs(cfg, B=8, lh=8, lw=8, lt=4):
    key = jax.random.key(0)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), cfg.in_channels))
    txt = jax.random.normal(key, (B, lt, cfg.context_dim))
    pooled = jax.random.normal(key, (B, cfg.pooled_dim))
    t = jnp.full((B,), 0.5)
    g = jnp.full((B,), 3.5)
    ids = np.concatenate([make_text_ids(lt), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)
    return img, txt, pooled, t, g, cos, sin


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, sp=1, tp=2))
    assert dict(mesh.shape) == {"dp": 2, "fsdp": 2, "sp": 1, "tp": 2}
    mesh = make_mesh(MeshConfig())  # all dp
    assert mesh.shape["dp"] == 8


def test_fsdp_sharding_divides_params():
    cfg = FluxConfig.tiny()
    mesh = make_mesh(MeshConfig(dp=2, fsdp=4))
    params = init_flux(jax.random.key(0), cfg)
    sharded = shard_params(params, mesh)
    # the big projections must actually be sharded (not replicated)
    qkv = sharded["double"]["img_qkv"]["w"]
    assert qkv.sharding.spec == P(None, "fsdp", None)
    n_shards = len({d for s in qkv.addressable_shards for d in [s.device]})
    assert n_shards == 8
    # values preserved
    np.testing.assert_allclose(
        np.asarray(qkv), np.asarray(params["double"]["img_qkv"]["w"])
    )


@pytest.mark.parametrize("mcfg", [
    MeshConfig(dp=8, fsdp=1, tp=1),
    MeshConfig(dp=2, fsdp=4, tp=1),
    MeshConfig(dp=2, fsdp=2, tp=2),
])
def test_sharded_forward_matches_single_device(mcfg):
    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    args = _tiny_inputs(cfg)

    want = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla")

    mesh = make_mesh(mcfg)
    sharded = shard_params(params, mesh)
    in_shard = [data_spec(mesh, a.ndim) for a in args[:5]]
    args_sharded = [jax.device_put(a, s) for a, s in zip(args[:5], in_shard)]

    @jax.jit
    def fwd(p, img, txt, pooled, t, g):
        return flux_forward(p, cfg, img, txt, pooled, t, g, args[5], args[6],
                            dtype=jnp.float32, attn_impl="xla")

    got = fwd(sharded, *args_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_sharded_grad_matches_single_device():
    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    args = _tiny_inputs(cfg, B=8)

    def loss(p, *a):
        return jnp.mean(
            flux_forward(p, cfg, *a, args[5], args[6], dtype=jnp.float32,
                         attn_impl="xla") ** 2
        )

    want = jax.grad(loss)(params, *args[:5])

    mesh = make_mesh(MeshConfig(dp=2, fsdp=4))
    sharded = shard_params(params, mesh)
    args_sharded = [
        jax.device_put(a, data_spec(mesh, a.ndim)) for a in args[:5]
    ]
    got = jax.jit(jax.grad(loss))(sharded, *args_sharded)
    for g1, g2 in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=5e-5
        )
