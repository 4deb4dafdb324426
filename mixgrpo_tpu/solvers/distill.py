"""Consistency-distillation solver (PCM flow matching) + multiphase Euler.

Counterpart of the reference's legacy distillation stack
(zqqqqz2000/MixGRPO fastvideo/distill/solver.py — dead code at HEAD but part
of the component inventory, SURVEY.md §2.3):

  - ``pcm_sigma_schedule``: num_train_timesteps sigmas, time-shifted or
    linear-quadratic, subsampled at ``pcm_timesteps`` Euler points
    (solver.py:32-67);
  - ``EulerSolver``: stores (sigmas, sigmas_prev) at the Euler points;
    ``euler_step`` advances one point; ``euler_style_multiphase_pred`` jumps
    to the start of the current phase (phased-consistency target,
    solver.py:243-310) — all as pure vectorized JAX functions.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.solvers.schedule import sd3_time_shift


def linear_quadratic_schedule(steps: int, threshold: float, linear_steps: int):
    """Mochi-style linear-then-quadratic sigma schedule
    (mochi_hf/pipeline_mochi.py)."""
    if linear_steps is None:
        linear_steps = steps // 2
    linear = [i * threshold / linear_steps for i in range(linear_steps)]
    threshold_noise_step_diff = linear_steps - threshold * steps
    quadratic_steps = steps - linear_steps
    quadratic_coef = threshold_noise_step_diff / (linear_steps * quadratic_steps**2)
    linear_coef = threshold / linear_steps - 2 * threshold_noise_step_diff / (
        quadratic_steps**2
    )
    const = quadratic_coef * (linear_steps**2)
    quadratic = [
        quadratic_coef * (i**2) + linear_coef * i + const
        for i in range(linear_steps, steps)
    ]
    sigmas = linear + quadratic
    return np.asarray([1.0 - x for x in sigmas], np.float32)


def pcm_sigma_schedule(
    num_train_timesteps: int = 1000,
    shift: float = 1.0,
    linear_quadratic: bool = False,
    lq_threshold: float = 0.025,
    lq_range: float = 0.5,
) -> np.ndarray:
    """Dense descending sigma table over training timesteps (solver.py:32-56)."""
    if linear_quadratic:
        return linear_quadratic_schedule(
            num_train_timesteps, lq_threshold,
            int(num_train_timesteps * lq_range),
        )
    t = np.linspace(1, num_train_timesteps, num_train_timesteps,
                    dtype=np.float32)[::-1]
    sig = t / num_train_timesteps
    return sd3_time_shift(shift, sig).astype(np.float32)


class EulerSolver(NamedTuple):
    """Euler-point sigma tables (solver.py:243-268)."""

    euler_timesteps: np.ndarray  # (K,) dense-timestep index per point
    euler_timesteps_prev: np.ndarray
    sigmas: np.ndarray  # (K,)
    sigmas_prev: np.ndarray

    @classmethod
    def build(cls, sigmas: np.ndarray, timesteps: int = 1000,
              euler_timesteps: int = 50) -> "EulerSolver":
        step_ratio = timesteps // euler_timesteps
        idx = (np.arange(1, euler_timesteps + 1) * step_ratio).round().astype(
            np.int64
        ) - 1
        idx_prev = np.asarray([0] + idx[:-1].tolist())
        return cls(
            euler_timesteps=idx,
            euler_timesteps_prev=idx_prev,
            sigmas=np.asarray(sigmas)[idx],
            sigmas_prev=np.asarray(
                [sigmas[0]] + np.asarray(sigmas)[idx[:-1]].tolist(),
                np.float32,
            ),
        )

    def _bcast(self, table, t_index, like):
        v = jnp.asarray(table)[jnp.asarray(t_index)]
        return v.reshape((-1,) + (1,) * (like.ndim - 1))

    def euler_step(self, sample, model_pred, timestep_index):
        sigma = self._bcast(self.sigmas, timestep_index, model_pred)
        sigma_prev = self._bcast(self.sigmas_prev, timestep_index, model_pred)
        return sample + (sigma_prev - sigma) * model_pred

    def multiphase_pred(
        self, sample, model_pred, timestep_index, multiphase: int,
        is_target: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Jump each sample to its phase boundary (solver.py:272-310)."""
        K = len(self.euler_timesteps)
        bounds = np.floor(
            np.linspace(0, K, num=multiphase, endpoint=False)
        ).astype(np.int64)  # (P,)
        t_idx = jnp.asarray(timestep_index)
        valid = t_idx[:, None] >= jnp.asarray(bounds)[None, :]
        last_valid = valid.shape[1] - 1 - jnp.argmax(
            jnp.flip(valid.astype(jnp.int32), axis=1), axis=1
        )
        t_end = jnp.asarray(bounds)[last_valid]
        table = self.sigmas_prev if is_target else self.sigmas
        sigma = self._bcast(table, t_idx, sample)
        sigma_prev = self._bcast(self.sigmas_prev, t_end, sample)
        return sample + (sigma_prev - sigma) * model_pred, t_end


def pcm_scheduler_step(sigmas: np.ndarray, step_index: int, model_output,
                       sample):
    """PCMFMScheduler.step (solver.py:175-237): Euler on the subsampled
    schedule.  ``sigmas`` includes the trailing 0 (sigmas_)."""
    sigma = sigmas[step_index]
    denoised = sample - model_output * sigma
    derivative = (sample - denoised) / sigma
    dt = sigmas[step_index + 1] - sigma
    return sample + derivative * dt
