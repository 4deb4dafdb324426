"""Group-relative advantage computation and multi-reward mixing.

Vectorized JAX re-derivation of the reference advantage logic
(zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:440-501): the reference
loops over groups in Python; here rewards are reshaped to
``(num_groups, group_size)`` and normalized in one fused pass.

Conventions matched to the reference:
  - std uses Bessel's correction (torch ``.std()`` default, ddof=1).
  - trimmed variant (:452-457): sort ascending, drop the lowest
    ``min(int(G*ratio), G-1)`` rewards, normalize *all* entries by the
    trimmed statistics.
  - ``advantage_aggr``: per-model group advantages merged with per-model
    weights (:441-468); ``reward_aggr``: rewards merged first with weights,
    then one advantage pass (:470-491, weights applied in compute_reward).
  - non-group mode (:494-499): normalize by the globally gathered
    reward statistics.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp


def _std(x, axis=None, keepdims=False):
    """Sample standard deviation (ddof=1), matching torch.std default."""
    return jnp.std(x, axis=axis, keepdims=keepdims, ddof=1)


def group_advantages(
    rewards: jnp.ndarray,
    num_generations: int,
    trimmed_ratio: float = 0.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Per-group normalized advantages.

    ``rewards``: (N,) with N a multiple of ``num_generations``; consecutive
    blocks of ``num_generations`` are one prompt group (train_grpo_flux.py
    repeats prompts with repeat_interleave, :368-384).
    """
    n = rewards.shape[0]
    assert n % num_generations == 0, (n, num_generations)
    g = rewards.reshape(-1, num_generations)
    if trimmed_ratio > 0:
        G = num_generations
        trim = min(int(G * trimmed_ratio), G - 1)
        s = jnp.sort(g, axis=1)[:, trim:]
        mean = jnp.mean(s, axis=1, keepdims=True)
        std = _std(s, axis=1, keepdims=True) + eps
    else:
        mean = jnp.mean(g, axis=1, keepdims=True)
        std = _std(g, axis=1, keepdims=True) + eps
    return ((g - mean) / std).reshape(n)


def global_advantages(
    rewards: jnp.ndarray, gathered_rewards: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Non-group advantages vs global statistics (train_grpo_flux.py:498)."""
    return (rewards - jnp.mean(gathered_rewards)) / (_std(gathered_rewards) + eps)


def mix_advantages(
    rewards_dict: Mapping[str, jnp.ndarray],
    weights: Mapping[str, float],
    num_generations: int,
    trimmed_ratio: float = 0.0,
) -> jnp.ndarray:
    """``advantage_aggr`` mixing: weighted sum of per-model group advantages."""
    merged = None
    for name, r in rewards_dict.items():
        adv = group_advantages(r, num_generations, trimmed_ratio) * float(
            weights.get(name, 1.0)
        )
        merged = adv if merged is None else merged + adv
    assert merged is not None, "empty rewards_dict"
    return merged


def mix_rewards(
    rewards_dict: Mapping[str, jnp.ndarray], weights: Mapping[str, float]
) -> jnp.ndarray:
    """``reward_aggr`` mixing: weighted sum of raw per-model rewards.

    This is the *documented* contract of the reference's broken-at-HEAD
    ``compute_reward`` (fastvideo/models/reward_model/utils.py:4-15,
    SURVEY.md §8.2).
    """
    merged = None
    for name, r in rewards_dict.items():
        w = float(weights.get(name, 1.0))
        merged = r * w if merged is None else merged + r * w
    assert merged is not None, "empty rewards_dict"
    return merged


def masked_group_advantages(
    rewards: jnp.ndarray,
    successes: jnp.ndarray,
    num_generations: int,
    trimmed_ratio: float = 0.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Per-group advantages with a per-sample success mask.

    Failed samples (success=0, e.g. an unanswered UnifiedReward HTTP call)
    are excluded from the group mean/std and receive advantage 0 for this
    model, so a garbage score never moves the policy.  With all-success
    masks this reduces exactly to :func:`group_advantages` (ddof=1 stats,
    identical trimming rule).  The reference collects ``successes_dict``
    but leaves its use as a TODO (train_grpo_flux.py:299-318); masking is
    the documented intent (eval_reward.py:264-276 masks means the same way).
    """
    n = rewards.shape[0]
    assert n % num_generations == 0, (n, num_generations)
    G = num_generations
    g = rewards.reshape(-1, G)
    s = successes.reshape(-1, G).astype(rewards.dtype)
    if trimmed_ratio > 0:
        trim = min(int(G * trimmed_ratio), G - 1)
        # Sort with failures pushed to the top; positions [trim, k) of the
        # ascending order are the surviving successful entries (k = #success).
        big = jnp.where(s > 0, g, jnp.inf)
        order = jnp.argsort(big, axis=1)
        sv = jnp.take_along_axis(g, order, axis=1)
        k = jnp.sum(s, axis=1, keepdims=True)
        pos = jnp.arange(G)[None, :]
        w = ((pos >= trim) & (pos < k)).astype(rewards.dtype)
    else:
        sv, w = g, s
    cnt = jnp.sum(w, axis=1, keepdims=True)
    mean = jnp.sum(sv * w, axis=1, keepdims=True) / jnp.maximum(cnt, 1.0)
    var = jnp.sum(w * (sv - mean) ** 2, axis=1, keepdims=True) / jnp.maximum(
        cnt - 1.0, 1.0
    )
    std = jnp.sqrt(var) + eps
    return (s * (g - mean) / std).reshape(n)


def masked_mix_advantages(
    rewards_dict: Mapping[str, jnp.ndarray],
    successes_dict: Mapping[str, jnp.ndarray],
    weights: Mapping[str, float],
    num_generations: int,
    trimmed_ratio: float = 0.0,
) -> jnp.ndarray:
    """``advantage_aggr`` mixing with success masks.

    Per sample, the merged advantage is the weighted sum over the models
    that *succeeded* on that sample, rescaled to the full weight total so
    scale matches the all-success case (mirrors
    :func:`masked_mix_rewards`).
    """
    total_w = sum(float(weights.get(n, 1.0)) for n in rewards_dict)
    num = None
    den = None
    for name, r in rewards_dict.items():
        w = float(weights.get(name, 1.0))
        s = successes_dict[name].astype(r.dtype)
        adv = masked_group_advantages(r, s, num_generations, trimmed_ratio)
        num = adv * w if num is None else num + adv * w
        den = s * w if den is None else den + s * w
    assert num is not None, "empty rewards_dict"
    return num / jnp.maximum(den, 1e-8) * total_w


def masked_mix_rewards(
    rewards_dict: Mapping[str, jnp.ndarray],
    successes_dict: Mapping[str, jnp.ndarray],
    weights: Mapping[str, float],
) -> jnp.ndarray:
    """Weighted reward mixing with per-model success masks.

    Failed scores (success=0, e.g. UnifiedReward HTTP failures,
    unified_reward.py:225-264) are dropped from the per-sample weighted
    mean, which is then rescaled to the full weight total so the scale
    matches the all-success case.
    """
    total_w = sum(float(weights.get(n, 1.0)) for n in rewards_dict)
    num = None
    den = None
    for name, r in rewards_dict.items():
        w = float(weights.get(name, 1.0))
        s = successes_dict[name].astype(r.dtype)
        num = r * s * w if num is None else num + r * s * w
        den = s * w if den is None else den + s * w
    assert num is not None
    return num / jnp.maximum(den, 1e-8) * total_w
