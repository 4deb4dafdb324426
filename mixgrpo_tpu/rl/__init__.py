from mixgrpo_tpu.rl.window import SlidingWindowState
from mixgrpo_tpu.rl.advantage import (
    group_advantages,
    global_advantages,
    mix_advantages,
    mix_rewards,
)
from mixgrpo_tpu.rl.ppo import ppo_loss, PPOConfig
from mixgrpo_tpu.rl.balance import balance_pos_neg

__all__ = [
    "SlidingWindowState",
    "group_advantages",
    "global_advantages",
    "mix_advantages",
    "mix_rewards",
    "ppo_loss",
    "PPOConfig",
    "balance_pos_neg",
]
