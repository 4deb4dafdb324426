"""Model registry + collective helpers + profiling utils."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mixgrpo_tpu.models.registry import available_models, get_model, load_vae
from mixgrpo_tpu.parallel import MeshConfig, make_mesh
from mixgrpo_tpu.parallel.collectives import (
    all_gather_seq,
    all_to_all_heads_to_seq,
    all_to_all_seq_to_heads,
    broadcast_from,
)
from mixgrpo_tpu.utils.profiling import Stopwatch, force_sync


def test_registry_lists_model_zoo():
    assert available_models() == ["flux", "hunyuan_video", "mochi"]
    e = get_model("flux")
    cfg = e.config()
    assert cfg.hidden_size == 3072
    assert e.load is not None
    v = load_vae("hunyuan_video")
    assert v.config().time_compression_ratio == 4


def test_all_to_all_roundtrip():
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, sp=4, tp=1))
    x = jax.random.normal(jax.random.key(0), (2, 8, 16, 4))
    spec = NamedSharding(mesh, P(None, None, "sp", None))
    xs = jax.device_put(x, spec)

    def f(x):
        y = all_to_all_heads_to_seq(x, "sp")
        return all_to_all_seq_to_heads(y, "sp")

    got = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=P(None, None, "sp", None),
        out_specs=P(None, None, "sp", None),
    ))(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-6)


def test_all_gather_and_broadcast():
    mesh = make_mesh(MeshConfig(dp=1, fsdp=1, sp=8, tp=1))
    x = jnp.arange(16.0).reshape(1, 16, 1)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "sp", None)))

    gathered = jax.jit(jax.shard_map(
        lambda x: all_gather_seq(x, "sp", dim=1), mesh=mesh,
        in_specs=P(None, "sp", None), out_specs=P(None, None, None),
        check_vma=False,  # all_gather output replication isn't inferred
    ))(xs)
    np.testing.assert_allclose(np.asarray(gathered), np.asarray(x))

    b = jax.jit(jax.shard_map(
        lambda x: broadcast_from(x, "sp", src=0), mesh=mesh,
        in_specs=P(None, "sp", None), out_specs=P(None, "sp", None),
    ))(xs)
    # every shard now holds shard 0's values
    bn = np.asarray(b).reshape(8, 2)
    for i in range(8):
        np.testing.assert_allclose(bn[i], [0.0, 1.0])


def test_stopwatch_and_sync():
    sw = Stopwatch()
    with sw.section("work"):
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
    force_sync(x)
    s = sw.summary()
    assert "work" in s and s["work"] >= 0
