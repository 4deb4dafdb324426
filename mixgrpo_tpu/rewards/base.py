"""Reward model protocol + multi-reward aggregation.

``compute_reward`` implements the *documented* contract that is broken at
the reference's HEAD (fastvideo/models/reward_model/utils.py:4-15, see
SURVEY.md §8.2): run every model in ``reward_models``, return
``(rewards, successes, rewards_dict, successes_dict)`` keyed by model name,
with rewards mixed by ``weights`` in the ``reward_aggr`` case (the
``advantage_aggr`` consumer mixes per-model advantages downstream,
train_grpo_flux.py:305-316,441-468).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Protocol, Sequence, Tuple

import numpy as np


class RewardModel(Protocol):
    name: str

    def __call__(
        self, images, prompts: Sequence[str]
    ) -> Tuple[List[float], List[float]]:
        """Score a batch.  Returns (scores, successes) as python lists."""
        ...


def compute_reward(
    images,
    prompts: Sequence[str],
    reward_models: Mapping[str, RewardModel],
    weights: Mapping[str, float],
) -> Tuple[List[float], List[float], Dict[str, List[float]], Dict[str, List[float]]]:
    n = len(prompts)
    rewards_dict: Dict[str, List[float]] = {}
    successes_dict: Dict[str, List[float]] = {}
    for name, model in reward_models.items():
        scores, successes = model(images, prompts)
        assert len(scores) == n, (name, len(scores), n)
        rewards_dict[name] = [float(s) for s in scores]
        successes_dict[name] = [float(s) for s in successes]

    total = np.zeros(n, np.float64)
    ok = np.ones(n, np.float64)
    for name, scores in rewards_dict.items():
        w = float(weights.get(name, 1.0))
        total += np.asarray(scores) * w
        ok *= np.asarray(successes_dict[name])
    return total.tolist(), ok.tolist(), rewards_dict, successes_dict
