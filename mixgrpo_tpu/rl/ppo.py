"""PPO-style clipped policy loss over per-step SDE log-probs.

Math parity with zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:560-583:

  ratio       = exp(new_logp - old_logp)
  policy_loss = mean(max(-A * ratio, -A * clip(ratio, 1-c, 1+c)))
  kl_loss     = 0.5 * mean((new_logp - old_logp)^2)
  loss        = policy_loss + kl_coeff * kl_loss
  clip_frac   = mean(|ratio - 1| > c)

Advantages are clamped to ±adv_clip_max first (:560-564).  The reference
normalizes the loss by ``grad_accum * len(train_timesteps)`` at each backward;
here the caller supplies ``loss_scale`` for the same effect (we vectorize
over window timesteps instead of looping).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    clip_range: float = 1e-4
    adv_clip_max: float = 5.0
    kl_coeff: float = 0.0


def ppo_loss(
    new_log_probs: jnp.ndarray,
    old_log_probs: jnp.ndarray,
    advantages: jnp.ndarray,
    cfg: PPOConfig,
    loss_scale: float = 1.0,
    mask: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Clipped PPO loss.

    ``new_log_probs``/``old_log_probs``: any matching shape (e.g. (B, W) for
    B samples x W window timesteps).  ``advantages``: broadcastable to that
    shape (per-sample advantages repeat across the window, matching the
    reference's per-timestep loop using the same sample advantage).
    ``mask``: optional validity mask (e.g. to ignore padded window slots);
    means are taken over unmasked entries only.
    """
    adv = jnp.clip(advantages, -cfg.adv_clip_max, cfg.adv_clip_max)
    adv = jnp.broadcast_to(adv, new_log_probs.shape)

    diff = new_log_probs - old_log_probs
    ratio = jnp.exp(diff)
    unclipped = -adv * ratio
    clipped = -adv * jnp.clip(ratio, 1.0 - cfg.clip_range, 1.0 + cfg.clip_range)
    per_elem_policy = jnp.maximum(unclipped, clipped)
    per_elem_kl = 0.5 * diff * diff
    clip_ind = (jnp.abs(ratio - 1.0) > cfg.clip_range).astype(jnp.float32)

    if mask is not None:
        m = jnp.broadcast_to(mask, new_log_probs.shape).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        mean = lambda x: jnp.sum(x * m) / denom
    else:
        mean = jnp.mean

    policy_loss = mean(per_elem_policy) * loss_scale
    kl_loss = mean(per_elem_kl) * loss_scale
    loss = policy_loss + cfg.kl_coeff * kl_loss
    metrics = {
        "loss": loss,
        "policy_loss": policy_loss,
        "kl_loss": kl_loss,
        "clip_frac": mean(clip_ind),
        "ratio_mean": mean(ratio),
    }
    return loss, metrics
