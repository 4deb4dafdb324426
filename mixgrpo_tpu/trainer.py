"""GRPO policy-update step: recomputed log-probs + clipped PPO loss.

TPU-native counterpart of the reference update loop
(zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:118-181 ``grpo_one_step``
and :536-615): the reference runs 12 samples x 4 window timesteps as 48
sequential single-pair forward+backwards with FSDP grad accumulation; here
all (sample, timestep) pairs of an accumulation group are **batched into
one forward+backward** (identical gradient: the reference's per-pair
``loss / (grad_accum * |W|)`` normalization telescopes to a mean over the
group's pairs), then one optimizer step — 1 compiled program instead of 12,
and the DiT runs at batch = pairs, keeping the MXU fed.

Log-prob recomputation parity (grpo_one_step):
  - flow_grpo_sampling (dpm null/post): ``flow_grpo_step`` with
    prev_sample = stored next latent (:148-157);
  - DanceGRPO: ``dance_grpo_step`` sde=True (:158-168);
  - dpm "all": first-order DPM-Solver log-prob, no multistep state (:169-180).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from mixgrpo_tpu.models.flux.model import FluxConfig, flux_forward
from mixgrpo_tpu.rl.ppo import PPOConfig, ppo_loss
from mixgrpo_tpu.sampler import quantized_timestep
from mixgrpo_tpu.solvers import dpm as dpm_mod
from mixgrpo_tpu.solvers.rollout import SamplerConfig
from mixgrpo_tpu.solvers.steps import dance_grpo_step, flow_grpo_step


class UpdateBatch(NamedTuple):
    """One accumulation group of (sample, window-timestep) pairs.

    N = samples_per_group * window_size pairs, all independent rows.
    """

    latents: jnp.ndarray  # (N, L, C) latent before step t
    next_latents: jnp.ndarray  # (N, L, C) stored latent after step t
    t_index: jnp.ndarray  # (N,) int step index into sigmas
    old_log_probs: jnp.ndarray  # (N,)
    advantages: jnp.ndarray  # (N,)
    txt: jnp.ndarray  # (N, Lt, context_dim)
    pooled: jnp.ndarray  # (N, pooled_dim)


def recompute_log_prob(
    sampler_cfg: SamplerConfig,
    pred,
    latents,
    next_latents,
    sigmas,
    t_index,
):
    """Per-row SDE log-prob of stored transitions given a fresh prediction."""
    sigma = jnp.take(sigmas, t_index)  # (N,)
    sigma_prev = jnp.take(sigmas, t_index + 1)
    shape = (-1,) + (1,) * (latents.ndim - 1)
    sig = sigma.reshape(shape)
    sig_prev = sigma_prev.reshape(shape)

    if not sampler_cfg.use_dpm or sampler_cfg.dpm_apply_strategy == "post":
        if sampler_cfg.flow_grpo_sampling:
            _, _, log_prob, _, _ = flow_grpo_step(
                pred, latents, sampler_cfg.eta, sig, sig_prev, sigmas[1],
                prev_sample=next_latents, deterministic=False,
            )
        else:
            _, _, log_prob = dance_grpo_step(
                pred, latents, sampler_cfg.eta, sig, sig_prev,
                prev_sample=next_latents, sde=True,
            )
    else:  # dpm "all": first-order dpm log-prob (grpo_one_step:169-180)
        x0 = dpm_mod.convert_model_output(pred, latents, sig)
        mean, _, std, dts = dpm_mod._first_order(
            sampler_cfg.dpm_algorithm_type, latents, x0, sig_prev, sig
        )
        from mixgrpo_tpu.solvers.steps import gaussian_log_prob

        log_prob = gaussian_log_prob(
            next_latents, mean, jnp.maximum(std * dts, 1e-7)
        )
    return log_prob


def make_update_fns(
    flux_cfg: FluxConfig,
    sampler_cfg: SamplerConfig,
    ppo_cfg: PPOConfig,
    optimizer: optax.GradientTransformation,
    rope_cos,
    rope_sin,
    *,
    guidance_scale: float = 3.5,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    remat="dots",
    loss_scale: float = 1.0,
    virtual_depth=None,  # benchmark aid: see flux_forward docstring
):
    """Build jitted ``update_step(params, opt_state, batch, sigmas)``."""

    def loss_fn(params, batch: UpdateBatch, sigmas):
        N = batch.latents.shape[0]
        sigma = jnp.take(sigmas, batch.t_index)
        t = quantized_timestep(sigma)
        g = jnp.full((N,), guidance_scale, jnp.float32)
        pred = flux_forward(
            params, flux_cfg, batch.latents.astype(dtype), batch.txt,
            batch.pooled, t, g, rope_cos, rope_sin,
            dtype=dtype, attn_impl=attn_impl, remat=remat,
            virtual_depth=virtual_depth,
        )
        new_lp = recompute_log_prob(
            sampler_cfg, pred, batch.latents.astype(jnp.float32),
            batch.next_latents.astype(jnp.float32), sigmas, batch.t_index,
        )
        loss, metrics = ppo_loss(
            new_lp, batch.old_log_probs, batch.advantages, ppo_cfg,
            loss_scale=loss_scale,
        )
        return loss, metrics

    # Pin grads and updated params to the FSDP/TP rule shardings (no-op
    # without a mesh): the backward's GSPMD-propagated grad shardings
    # otherwise leak into the updated params, recompiling the rollout and
    # abandoning the designed layout after the first step (caught by
    # __graft_entry__._dryrun_recipe_shape).
    from mixgrpo_tpu.parallel.sharding import constrain_params_sharding

    def update_step(params, opt_state, batch: UpdateBatch, sigmas):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, sigmas
        )
        grads = constrain_params_sharding(grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = constrain_params_sharding(optax.apply_updates(params, updates))
        # opt_state leaves (mu/nu) carry the param paths as suffixes, so the
        # same rules pin them — otherwise the next call sees new opt_state
        # shardings and recompiles the full-depth update once
        opt_state = constrain_params_sharding(opt_state)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return params, opt_state, metrics

    def accum_step(params, grad_acc, batch: UpdateBatch, sigmas, weight):
        """Accumulate ``weight``-scaled grads without applying (for groups
        too large for one backward)."""
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, sigmas
        )
        grads = constrain_params_sharding(grads)
        grad_acc = constrain_params_sharding(
            jax.tree.map(lambda a, g: a + g * weight, grad_acc, grads)
        )
        return grad_acc, metrics

    def apply_step(params, opt_state, grad_acc):
        updates, opt_state = optimizer.update(grad_acc, opt_state, params)
        params = constrain_params_sharding(optax.apply_updates(params, updates))
        opt_state = constrain_params_sharding(opt_state)
        zero = constrain_params_sharding(jax.tree.map(jnp.zeros_like, grad_acc))
        return params, opt_state, zero, optax.global_norm(grad_acc)

    return (
        jax.jit(update_step, donate_argnums=(0, 1)),
        jax.jit(accum_step, donate_argnums=(1,)),
        jax.jit(apply_step, donate_argnums=(0, 1, 2)),
    )


def make_optimizer(
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-4,
    max_grad_norm: float = 1.0,
    lr_scheduler: str = "constant_with_warmup",
    warmup_steps: int = 0,
    total_steps: int = 300,
    lr_num_cycles: int = 1,
    lr_power: float = 1.0,
) -> optax.GradientTransformation:
    """AdamW + global-norm clip + HF-style LR schedules.

    Mirrors the reference's inlined AdamW (train_grpo_flux.py:715-721,
    betas (0.9, 0.999), eps 1e-8) and diffusers ``get_scheduler`` variants.
    """
    if lr_scheduler == "constant" or (
        lr_scheduler == "constant_with_warmup" and warmup_steps <= 0
    ):
        sched = optax.constant_schedule(learning_rate)
    elif lr_scheduler == "constant_with_warmup":
        sched = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    elif lr_scheduler == "linear":
        sched = optax.linear_schedule(learning_rate, 0.0, total_steps)
    elif lr_scheduler == "cosine":
        sched = optax.cosine_decay_schedule(learning_rate, total_steps)
    elif lr_scheduler == "cosine_with_restarts":
        per = max(total_steps // max(lr_num_cycles, 1), 1)
        sched = optax.join_schedules(
            [optax.cosine_decay_schedule(learning_rate, per)] * lr_num_cycles,
            [per * i for i in range(1, lr_num_cycles)],
        )
    elif lr_scheduler == "polynomial":
        sched = optax.polynomial_schedule(
            learning_rate, 0.0, lr_power, total_steps
        )
    else:
        raise ValueError(f"unknown lr_scheduler {lr_scheduler}")
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay
        ),
    )


def make_lora_update_fns(
    flux_cfg: FluxConfig,
    sampler_cfg: SamplerConfig,
    ppo_cfg: PPOConfig,
    optimizer: optax.GradientTransformation,
    rope_cos,
    rope_sin,
    *,
    guidance_scale: float = 3.5,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    remat="dots",
    loss_scale: float = 1.0,
):
    """LoRA variant of ``make_update_fns``: the base params stay frozen
    (first arg, non-donated) and gradients flow only into the adapter
    factors.  Counterpart of the reference's peft-LoRA training surface
    (fastvideo/utils/checkpoint.py:257-314)."""
    from mixgrpo_tpu.lora import apply_lora

    def loss_fn(factors, lora_meta, base_params, batch: UpdateBatch, sigmas):
        params = apply_lora(base_params, {**lora_meta, "factors": factors})
        N = batch.latents.shape[0]
        sigma = jnp.take(sigmas, batch.t_index)
        t = quantized_timestep(sigma)
        g = jnp.full((N,), guidance_scale, jnp.float32)
        pred = flux_forward(
            params, flux_cfg, batch.latents.astype(dtype), batch.txt,
            batch.pooled, t, g, rope_cos, rope_sin,
            dtype=dtype, attn_impl=attn_impl, remat=remat,
        )
        new_lp = recompute_log_prob(
            sampler_cfg, pred, batch.latents.astype(jnp.float32),
            batch.next_latents.astype(jnp.float32), sigmas, batch.t_index,
        )
        return ppo_loss(
            new_lp, batch.old_log_probs, batch.advantages, ppo_cfg,
            loss_scale=loss_scale,
        )

    def update_step(factors, opt_state, lora_meta, base_params, batch, sigmas):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            factors, lora_meta, base_params, batch, sigmas
        )
        updates, opt_state = optimizer.update(grads, opt_state, factors)
        factors = optax.apply_updates(factors, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return factors, opt_state, metrics

    return jax.jit(update_step, donate_argnums=(0, 1), static_argnums=())


def get_optimizer(
    name: str = "adamw",
    learning_rate: float = 1e-5,
    weight_decay: float = 1e-4,
    max_grad_norm: float = 1.0,
    **kw,
) -> optax.GradientTransformation:
    """Optimizer factory (reference fastvideo/utils/optimizer.py:1-78 exposes
    adam/adamw/adamw8bit/prodigy; 8-bit and prodigy are CUDA-ecosystem
    packages — on TPU adam/adamw cover the used surface, and anything else
    composes from optax)."""
    if name == "adamw":
        return make_optimizer(
            learning_rate=learning_rate, weight_decay=weight_decay,
            max_grad_norm=max_grad_norm, **kw,
        )
    if name == "adam":
        return optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
        )
    raise ValueError(
        f"optimizer {name!r} not supported on TPU (use adam/adamw)"
    )


def build_update_batch(
    rollout_latents,  # (B, T+1, L, C)
    rollout_log_probs,  # (B, T)
    advantages,  # (B,)
    txt,  # (B, Lt, D)
    pooled,  # (B, P)
    sample_idx,  # (N,) which sample each pair comes from
    t_idx,  # (N,) which timestep each pair trains
) -> UpdateBatch:
    """Gather (sample, timestep) pairs into one batched update group."""
    sample_idx = jnp.asarray(sample_idx, jnp.int32)
    t_idx = jnp.asarray(t_idx, jnp.int32)
    return UpdateBatch(
        latents=rollout_latents[sample_idx, t_idx],
        next_latents=rollout_latents[sample_idx, t_idx + 1],
        t_index=t_idx,
        old_log_probs=rollout_log_probs[sample_idx, t_idx],
        advantages=jnp.asarray(advantages)[sample_idx],
        txt=txt[sample_idx],
        pooled=pooled[sample_idx],
    )
