"""Flow-match discrete Euler scheduler (HunyuanVideo inference path).

Counterpart of zqqqqz2000/MixGRPO
fastvideo/models/hunyuan/diffusion/schedulers/scheduling_flow_match_discrete.py:
sigmas = linspace(1, 0, N+1) optionally time-shifted
(sigma' = s*sigma/(1+(s-1)*sigma)), timesteps = sigma*1000, reverse-flow
Euler step x_{t+1} = x_t + (sigma_next - sigma_t) * v.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.solvers.schedule import sd3_time_shift


@dataclasses.dataclass
class FlowMatchDiscreteScheduler:
    num_train_timesteps: int = 1000
    shift: float = 1.0
    reverse: bool = True

    def set_timesteps(self, num_inference_steps: int):
        sigmas = np.linspace(1.0, 0.0, num_inference_steps + 1, dtype=np.float64)
        if not self.reverse:
            sigmas = 1.0 - sigmas
        sigmas = sd3_time_shift(self.shift, sigmas).astype(np.float32)
        self.sigmas = sigmas
        self.timesteps = (sigmas[:-1] * self.num_train_timesteps).astype(np.float32)
        return self.timesteps

    def step(self, model_output, step_index: int, sample):
        dt = self.sigmas[step_index + 1] - self.sigmas[step_index]
        return sample + jnp.asarray(model_output) * dt
