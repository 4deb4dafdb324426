"""End-to-end GRPO mechanics on a tiny FLUX: rollout -> advantage -> update."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux import FluxConfig, init_flux
from mixgrpo_tpu.rl.advantage import group_advantages
from mixgrpo_tpu.rl.ppo import PPOConfig
from mixgrpo_tpu.sampler import FluxSampler
from mixgrpo_tpu.solvers.rollout import SamplerConfig
from mixgrpo_tpu.solvers.schedule import deterministic_mask, sigma_schedule
from mixgrpo_tpu.trainer import (
    build_update_batch,
    make_optimizer,
    make_update_fns,
)


pytestmark = pytest.mark.slow


def _setup(T=6, window=(2, 3), G=4, n_prompts=2):
    flux_cfg = FluxConfig.tiny()
    sampler_cfg = SamplerConfig(num_steps_max=T, eta=0.7)
    sampler = FluxSampler(
        flux_cfg, sampler_cfg, height=64, width=64, text_len=4,
        dtype=jnp.float32, attn_impl="xla",
    )
    params = init_flux(jax.random.key(0), flux_cfg)
    B = G * n_prompts
    txt = jax.random.normal(jax.random.key(1), (B, 4, flux_cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(2), (B, flux_cfg.pooled_dim))
    sig = sigma_schedule(T, 3.0)
    det = deterministic_mask(T, window)
    return flux_cfg, sampler_cfg, sampler, params, txt, pooled, sig, det


def test_grpo_iteration_mechanics():
    T, window, G = 6, (2, 3), 4
    flux_cfg, sampler_cfg, sampler, params, txt, pooled, sig, det = _setup()
    B = txt.shape[0]

    z0 = sampler.init_noise(jax.random.key(3), B, same_noise_groups=G)
    # init_same_noise: within a group identical, across groups different
    z0n = np.asarray(z0)
    np.testing.assert_allclose(z0n[0], z0n[G - 1])
    assert not np.allclose(z0n[0], z0n[G])

    out = sampler.rollout(params, z0, txt, pooled, sig, det, T, jax.random.key(4))
    assert out.all_latents.shape[1] == T + 1
    assert np.isfinite(np.asarray(out.all_log_probs)).all()

    # synthetic reward: prefer bright final latents
    rewards = jnp.mean(out.final_latents, axis=(1, 2))
    adv = group_advantages(rewards, G)
    assert abs(float(jnp.mean(adv))) < 1e-5

    # build one accumulation group: all samples x window pairs
    w = list(window)
    sample_idx = np.repeat(np.arange(B), len(w))
    t_idx = np.tile(np.asarray(w), B)
    batch = build_update_batch(
        out.all_latents, out.all_log_probs, adv, txt, pooled, sample_idx, t_idx
    )
    assert batch.latents.shape[0] == B * len(w)

    opt = make_optimizer(learning_rate=1e-3, warmup_steps=0)
    opt_state = opt.init(params)
    update_step, accum_step, apply_step = make_update_fns(
        flux_cfg, sampler_cfg, PPOConfig(clip_range=0.2), opt,
        sampler.rope_cos, sampler.rope_sin, dtype=jnp.float32,
        attn_impl="xla", remat=False,
    )
    old = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    params2, opt_state, metrics = update_step(
        params, opt_state, batch, jnp.asarray(sig)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # ratio at first update must be ~1 (same params recompute the same logp)
    np.testing.assert_allclose(float(metrics["ratio_mean"]), 1.0, atol=1e-3)
    # params moved
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(params2), jax.tree.leaves(old))
    )
    assert moved


def test_accumulated_update_matches_single_batch():
    flux_cfg, sampler_cfg, sampler, params, txt, pooled, sig, det = _setup()
    B, T = txt.shape[0], 6
    z0 = sampler.init_noise(jax.random.key(3), B)
    out = sampler.rollout(params, z0, txt, pooled, sig, det, T, jax.random.key(4))
    rewards = jnp.mean(out.final_latents, axis=(1, 2))
    adv = group_advantages(rewards, 4)
    w = [2, 3]
    sample_idx = np.repeat(np.arange(B), len(w))
    t_idx = np.tile(np.asarray(w), B)
    batch = build_update_batch(
        out.all_latents, out.all_log_probs, adv, txt, pooled, sample_idx, t_idx
    )

    opt = make_optimizer(learning_rate=1e-3, warmup_steps=0)
    update_step, accum_step, apply_step = make_update_fns(
        flux_cfg, sampler_cfg, PPOConfig(clip_range=0.2), opt,
        sampler.rope_cos, sampler.rope_sin, dtype=jnp.float32,
        attn_impl="xla", remat=False,
    )

    copy = lambda t: jax.tree.map(jnp.array, t)

    # path A: one fused step (params donated -> use a copy)
    p_in = copy(params)
    pa, _, _ = update_step(p_in, opt.init(params), batch, jnp.asarray(sig))

    # path B: two half-group accumulations then apply
    N = batch.latents.shape[0]
    half = N // 2
    first = jax.tree.map(lambda x: x[:half], batch)
    second = jax.tree.map(lambda x: x[half:], batch)
    acc = jax.tree.map(jnp.zeros_like, params)
    acc, _ = accum_step(params, acc, first, jnp.asarray(sig), 0.5)
    acc, _ = accum_step(params, acc, second, jnp.asarray(sig), 0.5)
    pb, _, _, gn = apply_step(copy(params), opt.init(params), acc)
    assert np.isfinite(float(gn))

    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_lr_schedules():
    for name in ("constant", "constant_with_warmup", "linear", "cosine",
                 "cosine_with_restarts", "polynomial"):
        opt = make_optimizer(lr_scheduler=name, warmup_steps=5, total_steps=50)
        p = {"w": jnp.ones((4, 4))}
        st = opt.init(p)
        up, st = opt.update({"w": jnp.ones((4, 4)) * 0.1}, st, p)
        assert np.isfinite(np.asarray(up["w"])).all()
