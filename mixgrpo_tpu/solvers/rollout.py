"""Jitted mixed ODE-SDE rollout as a single bounded ``lax.while_loop``.

TPU-native re-design of the reference rollout driver
(zqqqqz2000/MixGRPO fastvideo/utils/sampling_utils.py:12-155
``run_sample_step``): the reference drives a Python for-loop of T transformer
calls with per-step Python branching on the ODE/SDE mode; here the whole
trajectory is one compiled loop, with the per-step mode mask, the sigma
schedule, the valid-step count, and the SDE-window boundary all passed as
*data*.  When the MixGRPO sliding window moves or the Flash tail is
recompressed, nothing recompiles.

Flash schedule compression makes the trajectory length dynamic in the
reference (sampling_utils.py:29-59); here schedules are padded to
``cfg.num_steps_max`` but the loop trip count is the *traced*
``num_steps``, so a compressed 13-step trajectory costs 13 model calls
(buffer rows with ``i >= num_steps`` keep the pass-through contract:
latents frozen at z_T, log_prob = 0).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mixgrpo_tpu.solvers import dpm as dpm_mod
from mixgrpo_tpu.solvers.steps import dance_grpo_step, flow_grpo_step


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler configuration (compile-time structure).

    Mirrors the reference flag surface (train_grpo_flux.py:1268-1467):
    ``flow_grpo_sampling`` -> algorithm, ``dpm_algorithm_type``,
    ``dpm_apply_strategy``, ``dpm_solver_order``, ``dpm_solver_type``,
    ``eta``, ``drop_last_sample``.
    """

    num_steps_max: int
    eta: float = 0.7
    flow_grpo_sampling: bool = True  # True: Flow-GRPO SDE; False: DanceGRPO
    dpm_algorithm_type: str = "null"  # "null" | "dpmsolver" | "dpmsolver++"
    dpm_apply_strategy: str = "post"  # "post" | "all"
    dpm_solver_order: int = 2
    dpm_solver_type: str = "midpoint"  # "midpoint" | "heun"
    drop_last_sample: bool = False

    @property
    def use_dpm(self) -> bool:
        return "dpmsolver" in self.dpm_algorithm_type


class RolloutOutput(NamedTuple):
    final_latents: jnp.ndarray  # (B, ...) z_T (or x0 if drop_last_sample)
    all_latents: jnp.ndarray  # (B, T_max+1, ...)
    all_log_probs: jnp.ndarray  # (B, T_max)
    step_valid: jnp.ndarray  # (T_max,) bool


def _select_tree(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def rollout_step(
    cfg: SamplerConfig,
    model_fn: Callable,
    z,
    dpm_state,
    *,
    sigmas,
    step_index,
    num_steps,
    deterministic,
    last_sde_index,
    noise,
):
    """One solver step given the model prediction; pure, scan-friendly.

    ``model_fn(z, sigma) -> velocity``.  ``deterministic`` is this step's
    ODE/SDE flag (traced bool).  ``last_sde_index`` is the index of the last
    SDE step (for dpm "post" strategy branch selection, traced int).
    Returns ``(z_next, log_prob, x0_pred, new_dpm_state)``.
    """
    i = jnp.asarray(step_index, jnp.int32)
    sigma = jnp.take(sigmas, i)
    sigma_prev = jnp.take(sigmas, i + 1)
    sigma_max = sigmas[1]

    pred = model_fn(z, sigma).astype(jnp.float32)
    zf = z.astype(jnp.float32)

    if not cfg.use_dpm:
        if cfg.flow_grpo_sampling:
            z_next, x0, log_prob, _, _ = flow_grpo_step(
                pred, zf, cfg.eta, sigma, sigma_prev, sigma_max,
                noise=noise, deterministic=deterministic,
            )
        else:
            z_next, x0, log_prob = dance_grpo_step(
                pred, zf, cfg.eta, sigma, sigma_prev,
                noise=noise, sde=jnp.logical_not(deterministic),
            )
        new_state = dpm_state
    elif cfg.dpm_apply_strategy == "all":
        x0 = dpm_mod.convert_model_output(pred, zf, sigma)
        st = dpm_mod.dpm_state_update(dpm_state, x0)
        z_next, _, log_prob, new_state = dpm_mod.dpm_solver_step(
            algo=cfg.dpm_algorithm_type,
            solver_order=cfg.dpm_solver_order,
            solver_type=cfg.dpm_solver_type,
            state=st, sample=zf, sigmas=sigmas, step_index=i,
            num_steps=num_steps, noise=noise,
            sde=jnp.logical_not(deterministic),
        )
    else:  # "post": window steps use the SDE solver, tail uses DPM ODE
        x0 = dpm_mod.convert_model_output(pred, zf, sigma)
        st = dpm_mod.dpm_state_update(dpm_state, x0)
        in_window = i <= last_sde_index
        # window branch (sampling_utils.py:114-133)
        if cfg.flow_grpo_sampling:
            zw, _, lpw, _, _ = flow_grpo_step(
                pred, zf, cfg.eta, sigma, sigma_prev, sigma_max,
                noise=noise, deterministic=deterministic,
            )
        else:
            zw, _, lpw = dance_grpo_step(
                pred, zf, cfg.eta, sigma, sigma_prev,
                noise=noise, sde=jnp.logical_not(deterministic),
            )
        st_w = dpm_mod.dpm_state_bump(st, cfg.dpm_solver_order)
        # tail branch (sampling_utils.py:134-144): pure ODE DPM step
        zt, _, lpt, st_t = dpm_mod.dpm_solver_step(
            algo=cfg.dpm_algorithm_type,
            solver_order=cfg.dpm_solver_order,
            solver_type=cfg.dpm_solver_type,
            state=st, sample=zf, sigmas=sigmas, step_index=i,
            num_steps=num_steps, noise=None, sde=False,
        )
        z_next = jnp.where(in_window, zw, zt)
        log_prob = jnp.where(in_window, lpw, lpt)
        new_state = _select_tree(in_window, st_w, st_t)

    # padded steps pass latents through untouched
    valid = i < num_steps
    z_next = jnp.where(valid, z_next, zf)
    log_prob = jnp.where(valid, log_prob, jnp.zeros_like(log_prob))
    x0 = jnp.where(valid, x0, zf)
    new_state = _select_tree(valid, new_state, dpm_state)
    return z_next, log_prob, x0, new_state


def run_rollout(
    cfg: SamplerConfig,
    model_fn: Callable,
    z0: jnp.ndarray,
    *,
    sigmas: jnp.ndarray,
    deterministic: jnp.ndarray,
    num_steps,
    rng: jax.Array,
) -> RolloutOutput:
    """Run the full T-step rollout under one scan (no gradients intended).

    Args:
      model_fn: ``(z, sigma) -> velocity`` closure over weights/conditioning.
      z0: initial noise latents, any shape with leading batch dim.
      sigmas: (num_steps_max + 1,) padded sigma schedule.
      deterministic: (num_steps_max,) bool, True = ODE step.
      num_steps: traced int, number of valid steps.
      rng: PRNG key for per-step SDE noise.
    """
    T = cfg.num_steps_max
    assert sigmas.shape[0] == T + 1, (sigmas.shape, T)
    assert deterministic.shape[0] == T
    num_steps = jnp.asarray(num_steps, jnp.int32)
    sde_idx = jnp.nonzero(~deterministic, size=T, fill_value=-1)[0]
    last_sde_index = jnp.max(sde_idx)  # -1 if no SDE step

    dpm_state = dpm_mod.dpm_state_init(
        max(cfg.dpm_solver_order, 1), z0.shape, jnp.float32
    )

    # A while_loop with a *traced* trip count instead of a fixed-length
    # scan: a Flash-compressed schedule (num_steps=13 of T_max=25) then
    # runs 13 model forwards, not 25 — the reference's dynamic-length
    # trajectory savings (sampling_utils.py:29-59) are realized without
    # recompiling when num_steps changes (it stays data).  Rollouts take
    # no gradients, so while_loop's non-differentiability is free.
    z0f = z0.astype(jnp.float32)
    zs0 = jnp.zeros((T,) + z0.shape, jnp.float32)
    lp0 = jnp.zeros((T, z0.shape[0]), jnp.float32)

    def cond(carry):
        return carry[-1] < num_steps

    def body(carry):
        z, st, x0_final, zs, lps, i = carry
        noise = jax.random.normal(jax.random.fold_in(rng, i), z.shape, jnp.float32)
        z_next, log_prob, x0, st = rollout_step(
            cfg, model_fn, z, st,
            sigmas=sigmas, step_index=i, num_steps=num_steps,
            deterministic=deterministic[i], last_sde_index=last_sde_index,
            noise=noise,
        )
        x0_final = jnp.where(i == num_steps - 1, x0, x0_final)
        zs = jax.lax.dynamic_update_index_in_dim(zs, z_next, i, 0)
        lps = jax.lax.dynamic_update_index_in_dim(lps, log_prob, i, 0)
        return (z_next, st, x0_final, zs, lps, i + 1)

    z_T, _, x0_final, zs, log_probs, _ = jax.lax.while_loop(
        cond, body, (z0f, dpm_state, z0f, zs0, lp0, jnp.int32(0))
    )

    # padded tail: latents pass through unchanged, log_prob = 0 (same
    # contract as the old fixed-length scan)
    valid_t = (jnp.arange(T) < num_steps).reshape((T,) + (1,) * z0.ndim)
    zs = jnp.where(valid_t, zs, z_T[None])

    # time is stacked along axis 0 -> (T, B, ...); move it next to batch
    all_latents = jnp.concatenate([z0f[None], zs], axis=0)
    all_latents = jnp.moveaxis(all_latents, 0, 1)  # (B, T+1, ...)
    all_log_probs = jnp.moveaxis(log_probs, 0, 1)  # (B, T)

    final = x0_final if cfg.drop_last_sample else z_T
    step_valid = jnp.arange(T) < num_steps
    return RolloutOutput(final, all_latents, all_log_probs, step_valid)
