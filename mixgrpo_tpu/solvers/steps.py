"""Flow-matching ODE/SDE step functions with Gaussian log-probs.

Pure-functional JAX re-derivations of the reference solver math
(zqqqqz2000/MixGRPO fastvideo/utils/sampling_utils.py):

  - ``flow_grpo_step``  — Flow-GRPO SDE step (sampling_utils.py:157-210)
  - ``dance_grpo_step`` — DanceGRPO score-function SDE step
                          (sampling_utils.py:212-253)
  - ``gaussian_log_prob`` — per-sample diagonal-Gaussian log-density,
    averaged over all non-batch dims (sampling_utils.py:201-208)

All functions are shape-polymorphic pure functions of (latents, model_output,
schedule scalars, noise) -> (next_latents, x0_pred, log_prob, ...).  They are
designed to be called from inside a jitted ``lax.scan`` rollout where the
per-step SDE/ODE choice is *data* (a traced boolean), selected with
``jnp.where`` — no Python control flow on traced values.

Deviation from reference (documented, intentional): ``dance_grpo_step``'s
log-prob includes the full Gaussian normalization constants; the reference
drops them via a dead statement (sampling_utils.py:244-247, SURVEY.md §8.5).
Constants cancel in PPO ratios and in the KL term, so training behavior is
identical, but absolute log-probs here are correct.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def _mean_over_nonbatch(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def gaussian_log_prob(sample, mean, total_std):
    """Diagonal Gaussian log-density of ``sample`` ~ N(mean, total_std^2).

    ``total_std`` is the full per-element standard deviation (already
    including any sqrt(dt) factor).  Returns the *mean* over all non-batch
    dimensions, matching sampling_utils.py:201-208.
    """
    var = total_std * total_std
    ll = -((sample - mean) ** 2) / (2.0 * var) - jnp.log(total_std) - _LOG_SQRT_2PI
    return _mean_over_nonbatch(ll)


def flow_grpo_step(
    model_output,
    latents,
    eta: float,
    sigma,
    sigma_prev,
    sigma_max,
    noise=None,
    prev_sample=None,
    deterministic=False,
):
    """Flow-GRPO SDE step (MixGRPO's solver when ``flow_grpo_sampling``).

    Math parity with sampling_utils.py:157-210:
      dt        = sigma_prev - sigma                        (negative)
      x0        = x - sigma * v
      std_t     = eta * sqrt(sigma / (1 - sigma'))          sigma'=sigma_max if sigma==1
      mean      = x*(1 + std_t^2/(2 sigma) dt) + v*(1 + std_t^2 (1-sigma)/(2 sigma)) dt
      x_next    = mean + std_t * sqrt(-dt) * noise          (SDE)
      x_next    = x + dt * v                                (deterministic ODE)
      log_prob  = N(x_next | mean, (std_t sqrt(-dt))^2)     averaged over dims

    ``deterministic`` may be a traced bool (selected via ``jnp.where``).
    When recomputing log-probs in the PPO update, pass ``prev_sample`` (the
    stored next latent) instead of ``noise``.
    """
    sigma = jnp.asarray(sigma, dtype=latents.dtype)
    sigma_prev = jnp.asarray(sigma_prev, dtype=latents.dtype)
    dt = sigma_prev - sigma  # negative

    x0_pred = latents - sigma * model_output

    denom = 1.0 - jnp.where(sigma == 1.0, sigma_max, sigma)
    std_t = jnp.sqrt(sigma / denom) * eta
    total_std = std_t * jnp.sqrt(-dt)

    mean = latents * (1.0 + std_t**2 / (2.0 * sigma) * dt) + model_output * (
        1.0 + std_t**2 * (1.0 - sigma) / (2.0 * sigma)
    ) * dt

    if prev_sample is None:
        assert noise is not None, "need noise when prev_sample is not given"
        sde_next = mean + total_std * noise
        ode_next = latents + dt * model_output
        next_latents = jnp.where(deterministic, ode_next, sde_next)
    else:
        next_latents = prev_sample

    log_prob = gaussian_log_prob(
        jnp.asarray(next_latents), mean, total_std
    )
    return next_latents, x0_pred, log_prob, mean, total_std


def dance_grpo_step(
    model_output,
    latents,
    eta: float,
    sigma,
    sigma_prev,
    noise=None,
    prev_sample=None,
    sde=True,
):
    """DanceGRPO score-function SDE step (sampling_utils.py:212-253).

      dsigma    = sigma_prev - sigma                        (negative)
      mean      = x + dsigma * v
      x0        = x - sigma * v
      std_t     = eta * sqrt(-dsigma)
      if sde:   score = -(x - x0*(1-sigma)) / sigma^2
                mean += (-0.5 eta^2 score) * dsigma
      x_next    = mean + std_t * noise  (sde) | mean  (ode)
      log_prob  = N(x_next | mean, std_t^2)

    ``sde`` may be a traced bool.  Note ``std_t`` already includes the
    sqrt(dt) factor here (unlike flow_grpo_step).
    """
    sigma = jnp.asarray(sigma, dtype=latents.dtype)
    sigma_prev = jnp.asarray(sigma_prev, dtype=latents.dtype)
    dsigma = sigma_prev - sigma  # negative

    ode_mean = latents + dsigma * model_output
    x0_pred = latents - sigma * model_output

    std_t = eta * jnp.sqrt(sigma - sigma_prev)

    score = -(latents - x0_pred * (1.0 - sigma)) / (sigma**2)
    sde_mean = ode_mean + (-0.5 * eta**2 * score) * dsigma
    mean = jnp.where(sde, sde_mean, ode_mean)

    if prev_sample is None:
        assert noise is not None
        next_latents = jnp.where(sde, mean + std_t * noise, mean)
    else:
        next_latents = prev_sample

    # Guard the log against std_t == 0 on a pure-ODE step (log_prob is
    # masked out downstream for deterministic steps anyway).
    safe_std = jnp.where(std_t > 0, std_t, jnp.ones_like(std_t))
    log_prob = gaussian_log_prob(jnp.asarray(next_latents), mean, safe_std)
    return next_latents, x0_pred, log_prob
