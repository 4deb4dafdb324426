from mixgrpo_tpu.rewards.base import RewardModel, compute_reward
from mixgrpo_tpu.rewards.clip_family import (
    CLIPScoreReward,
    HPSReward,
    PickScoreReward,
)
from mixgrpo_tpu.rewards.unified_reward import UnifiedReward

__all__ = [
    "RewardModel",
    "compute_reward",
    "HPSReward",
    "PickScoreReward",
    "CLIPScoreReward",
    "UnifiedReward",
]
