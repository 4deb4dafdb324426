"""Mesh + sharding on the 8-device virtual CPU mesh.

This is the multi-chip test story (SURVEY.md §4): real mesh-sharded
programs compiled and executed on virtual devices.
"""

import os

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
    # canonical spec: no trailing Nones (tp=1 here, so the tp dim drops and
    # the spec ends at the fsdp axis) — exact-form stability is what keeps
    # jit caches warm across update steps
    assert qkv.sharding.spec == P(None, "fsdp")
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


_SPMD_PROBE = r"""
import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux import FluxConfig, init_flux
from mixgrpo_tpu.parallel import (
    MeshConfig, data_spec, make_mesh, set_activation_mesh, shard_params,
)
from mixgrpo_tpu.rl.ppo import PPOConfig
from mixgrpo_tpu.sampler import FluxSampler
from mixgrpo_tpu.solvers.rollout import SamplerConfig
from mixgrpo_tpu.solvers.schedule import deterministic_mask, sigma_schedule
from mixgrpo_tpu.trainer import build_update_batch, make_optimizer, make_update_fns

mesh = make_mesh(MeshConfig(dp=2, fsdp=2, sp=1, tp=2))
set_activation_mesh(mesh)
cfg = FluxConfig.tiny()
T, B = 4, 16
sampler = FluxSampler(
    cfg, SamplerConfig(num_steps_max=T, eta=0.7),
    height=64, width=64, text_len=4, dtype=jnp.float32, attn_impl="xla",
)
params = shard_params(init_flux(jax.random.key(0), cfg), mesh)
key = jax.random.key(1)
txt = jax.device_put(
    jax.random.normal(key, (B, 4, cfg.context_dim)), data_spec(mesh, 3))
pooled = jax.device_put(
    jax.random.normal(key, (B, cfg.pooled_dim)), data_spec(mesh, 2))
sig = sigma_schedule(T, 3.0)
det = deterministic_mask(T, [1, 2])
z0 = jax.device_put(
    sampler.init_noise(jax.random.key(2), B, same_noise_groups=4),
    data_spec(mesh, 3))
with mesh:
    out = sampler.rollout(params, z0, txt, pooled, sig, det, T, jax.random.key(3))
    adv = jnp.zeros((B,)) + 0.1
    sample_idx = np.repeat(np.arange(B), 2)
    t_idx = np.tile(np.asarray([1, 2]), B)
    batch = build_update_batch(
        out.all_latents, out.all_log_probs, adv, txt, pooled, sample_idx, t_idx)
    opt = make_optimizer(learning_rate=1e-3)
    update_step, _, _ = make_update_fns(
        cfg, SamplerConfig(num_steps_max=T, eta=0.7), PPOConfig(), opt,
        sampler.rope_cos, sampler.rope_sin, dtype=jnp.float32,
        attn_impl="xla", remat=True,
    )
    opt_state = opt.init(params)
    params, opt_state, m = update_step(params, opt_state, batch, jnp.asarray(sig))
    print("PROBE_OK grad_norm=%.5f" % float(m["grad_norm"]))
"""


@pytest.mark.slow
def test_no_involuntary_rematerialization_under_tp():
    """The dp/fsdp/tp rollout+update must compile without SPMD falling back
    to 'involuntary full rematerialization' on the joint-seq concat (the
    round-2 dryrun warning).  The warning is emitted by XLA's C++ logger,
    so it is checked on a subprocess's stderr."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["TF_CPP_MIN_LOG_LEVEL"] = "0"
    r = subprocess.run(
        [sys.executable, "-c", _SPMD_PROBE],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-4000:]
    assert "PROBE_OK" in r.stdout, (r.stdout, r.stderr[-2000:])
    assert "Involuntary full rematerialization" not in r.stderr, (
        "SPMD fell back to full rematerialization:\n" + r.stderr[-4000:]
    )


def test_recipe_shape_dryrun_train_state_sharding_stable():
    """Recipe-structured geometry (G=12, T=25, window walk, grad-accum 3)
    on the dp/fsdp/tp mesh: asserts the rollout and update programs each
    compile exactly once across iterations (no param/opt-state sharding
    drift — the round-4 regression caught by this dryrun: grads carried
    GSPMD-propagated shardings into the updated params, 33/52 leaves off
    the FSDP rules) and that the update's collective structure is
    geometry-independent.  Delegates to the driver dryrun so the driver
    and test tiers check the same thing."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge._dryrun_recipe_shape(
        MeshConfig(dp=2, fsdp=2, sp=1, tp=2), jax.devices()[:8]
    )
