"""Multistep DPM-Solver / DPM-Solver++ for rectified flow, scan-friendly.

Re-derivation of the reference DPM machinery
(zqqqqz2000/MixGRPO fastvideo/utils/sampling_utils.py:255-645) in a form that
lives inside a jitted ``lax.scan``:

  - ``DPMState`` is a pytree: a fixed ``(order, *latent_shape)`` ring buffer
    of x0-predictions plus a ``lower_order_nums`` counter (the reference uses
    a Python list + mutable dataclass, sampling_utils.py:255-271).
  - Order selection (warm-up to higher order, first-order at the final step,
    second-order near the end for short schedules — sampling_utils.py:307-357)
    is *data*: all orders are computed (cheap VPU math next to a DiT forward)
    and selected with ``jnp.where`` on traced predicates.
  - Flow-matching convention alpha_t = 1 - sigma, sigma_t = sigma
    (sampling_utils.py:641-645).  Sigmas are clamped to ``_EPS`` before the
    log so the final sigma=0 step stays finite (the reference avoids the
    inf via its lower_order_final guard; with jnp.where selection we must
    keep every branch NaN-free).

Log-prob convention matches the SDE variants: x_next ~ N(mean, (std * dt_sqrt)^2)
with std = sigma_t and dt_sqrt as below (sampling_utils.py:376-385).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from mixgrpo_tpu.solvers.steps import gaussian_log_prob

_EPS = 1e-7


class DPMState(NamedTuple):
    """Ring buffer of the ``order`` most recent x0-predictions (oldest first)."""

    model_outputs: jnp.ndarray  # (order, *latent_shape)
    lower_order_nums: jnp.ndarray  # int32 scalar


def dpm_state_init(order: int, latent_shape, dtype=jnp.float32) -> DPMState:
    return DPMState(
        model_outputs=jnp.zeros((order, *latent_shape), dtype=dtype),
        lower_order_nums=jnp.zeros((), dtype=jnp.int32),
    )


def dpm_state_update(state: DPMState, x0_pred: jnp.ndarray) -> DPMState:
    """Shift the ring buffer and append the newest x0 prediction."""
    buf = jnp.concatenate(
        [state.model_outputs[1:], x0_pred[None].astype(state.model_outputs.dtype)], axis=0
    )
    return DPMState(model_outputs=buf, lower_order_nums=state.lower_order_nums)


def dpm_state_bump(state: DPMState, order: int) -> DPMState:
    return DPMState(
        model_outputs=state.model_outputs,
        lower_order_nums=jnp.minimum(state.lower_order_nums + 1, order),
    )


def convert_model_output(model_output, sample, sigma):
    """Velocity -> x0 prediction (sampling_utils.py:387-396)."""
    return sample - sigma * model_output


def _lambda(sigma):
    s = jnp.clip(sigma, _EPS, 1.0 - _EPS)
    return jnp.log1p(-s) - jnp.log(s)


def _first_order(algo, sample, m0, sig_t, sig_s):
    a_t, a_s = 1.0 - sig_t, 1.0 - sig_s
    h = _lambda(sig_t) - _lambda(sig_s)
    if algo == "dpmsolver++":
        mean = (sig_t / sig_s * jnp.exp(-h)) * sample + (a_t * (1 - jnp.exp(-2.0 * h))) * m0
        ode = (sig_t / sig_s) * sample - (a_t * (jnp.exp(-h) - 1.0)) * m0
        dt_sqrt = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(-2.0 * h), 0.0))
    else:  # "dpmsolver"
        mean = (a_t / a_s) * sample - 2.0 * (sig_t * (jnp.exp(h) - 1.0)) * m0
        ode = (a_t / a_s) * sample - (sig_t * (jnp.exp(h) - 1.0)) * m0
        dt_sqrt = jnp.sqrt(jnp.maximum(jnp.exp(2.0 * h) - 1.0, 0.0))
    return mean, ode, sig_t, dt_sqrt


def _second_order(algo, solver_type, sample, m0, m1, sig_t, sig_s0, sig_s1):
    a_t, a_s0 = 1.0 - sig_t, 1.0 - sig_s0
    l_t, l_s0, l_s1 = _lambda(sig_t), _lambda(sig_s0), _lambda(sig_s1)
    h, h0 = l_t - l_s0, l_s0 - l_s1
    r0 = h0 / h
    D0 = m0
    D1 = (m0 - m1) / r0
    if algo == "dpmsolver++":
        em = jnp.exp(-h)
        e2 = 1.0 - jnp.exp(-2.0 * h)
        base = (sig_t / sig_s0 * em) * sample + (a_t * e2) * D0
        if solver_type == "midpoint":
            mean = base + 0.5 * (a_t * e2) * D1
            ode = (
                (sig_t / sig_s0) * sample
                - (a_t * (em - 1.0)) * D0
                - 0.5 * (a_t * (em - 1.0)) * D1
            )
        else:  # heun
            mean = base + (a_t * (e2 / (-2.0 * h) + 1.0)) * D1
            ode = (
                (sig_t / sig_s0) * sample
                - (a_t * (em - 1.0)) * D0
                + (a_t * ((em - 1.0) / h + 1.0)) * D1
            )
        dt_sqrt = jnp.sqrt(jnp.maximum(e2, 0.0))
    else:
        eh = jnp.exp(h)
        if solver_type == "midpoint":
            mean = (a_t / a_s0) * sample - 2.0 * (sig_t * (eh - 1.0)) * D0 - (
                sig_t * (eh - 1.0)
            ) * D1
            ode = (
                (a_t / a_s0) * sample
                - (sig_t * (eh - 1.0)) * D0
                - 0.5 * (sig_t * (eh - 1.0)) * D1
            )
        else:
            mean = (a_t / a_s0) * sample - 2.0 * (sig_t * (eh - 1.0)) * D0 - 2.0 * (
                sig_t * ((eh - 1.0) / h - 1.0)
            ) * D1
            ode = (
                (a_t / a_s0) * sample
                - (sig_t * (eh - 1.0)) * D0
                - (sig_t * ((eh - 1.0) / h - 1.0)) * D1
            )
        dt_sqrt = jnp.sqrt(jnp.maximum(jnp.exp(2.0 * h) - 1.0, 0.0))
    return mean, ode, sig_t, dt_sqrt


def _third_order(algo, sample, m0, m1, m2, sig_t, sig_s0, sig_s1, sig_s2):
    a_t, a_s0 = 1.0 - sig_t, 1.0 - sig_s0
    l_t, l_s0, l_s1, l_s2 = _lambda(sig_t), _lambda(sig_s0), _lambda(sig_s1), _lambda(sig_s2)
    h, h0, h1 = l_t - l_s0, l_s0 - l_s1, l_s1 - l_s2
    r0, r1 = h0 / h, h1 / h
    D0 = m0
    D1_0, D1_1 = (m0 - m1) / r0, (m1 - m2) / r1
    D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
    D2 = (D1_0 - D1_1) / (r0 + r1)
    if algo == "dpmsolver++":
        em = jnp.exp(-h)
        e2 = 1.0 - jnp.exp(-2.0 * h)
        mean = (
            (sig_t / sig_s0 * em) * sample
            + (a_t * e2) * D0
            + (a_t * (e2 / (-2.0 * h) + 1.0)) * D1
            + (a_t * ((e2 - 2.0 * h) / (2.0 * h) ** 2 - 0.5)) * D2
        )
        ode = (
            (sig_t / sig_s0) * sample
            - (a_t * (em - 1.0)) * D0
            + (a_t * ((em - 1.0) / h + 1.0)) * D1
            - (a_t * ((em - 1.0 + h) / h**2 - 0.5)) * D2
        )
        dt_sqrt = jnp.sqrt(jnp.maximum(e2, 0.0))
    else:
        eh = jnp.exp(h)
        ode = (
            (a_t / a_s0) * sample
            - (sig_t * (eh - 1.0)) * D0
            - (sig_t * ((eh - 1.0) / h - 1.0)) * D1
            - (sig_t * ((eh - 1.0 - h) / h**2 - 0.5)) * D2
        )
        mean = ode  # plain dpmsolver order-3 has no SDE variant (ref asserts)
        dt_sqrt = jnp.sqrt(jnp.maximum(jnp.exp(2.0 * h) - 1.0, 0.0))
    return mean, ode, sig_t, dt_sqrt


def dpm_solver_step(
    *,
    algo: str,
    solver_order: int,
    solver_type: str,
    state: DPMState,
    sample,
    sigmas,
    step_index,
    num_steps,
    noise=None,
    prev_sample=None,
    sde=False,
):
    """One multistep DPM-Solver update with Gaussian log-prob.

    Mirrors sampling_utils.py:273-385: x0 ring buffer must already hold the
    current step's x0 at the last slot (call ``dpm_state_update`` first).
    Order warm-up & end-of-schedule downgrades (:307-309,327-357) become
    traced predicates.  ``sigmas`` may be longer than the live schedule
    (Flash padding); ``num_steps`` bounds the final-step predicate.

    Returns ``(next_latents, mean, log_prob, new_state)``.
    """
    step_index = jnp.asarray(step_index, dtype=jnp.int32)
    sig = lambda i: jnp.take(sigmas, jnp.clip(i, 0, sigmas.shape[0] - 1))
    sig_t, sig_s0 = sig(step_index + 1), sig(step_index)
    sig_s1, sig_s2 = sig(step_index - 1), sig(step_index - 2)

    m0 = state.model_outputs[-1]
    m1 = state.model_outputs[-2] if solver_order >= 2 else m0
    m2 = state.model_outputs[-3] if solver_order >= 3 else m0

    mean1, ode1, std1, dts1 = _first_order(algo, sample, m0, sig_t, sig_s0)
    if solver_order >= 2:
        mean2, ode2, std2, dts2 = _second_order(
            algo, solver_type, sample, m0, m1, sig_t, sig_s0, sig_s1
        )
    if solver_order >= 3:
        mean3, ode3, std3, dts3 = _third_order(
            algo, sample, m0, m1, m2, sig_t, sig_s0, sig_s1, sig_s2
        )

    lower_order_final = step_index == (num_steps - 1)
    lower_order_second = jnp.logical_and(step_index == (num_steps - 2), num_steps < 15)

    use_first = jnp.logical_or(state.lower_order_nums < 1, lower_order_final)
    if solver_order == 1:
        mean, ode, std, dts = mean1, ode1, std1, dts1
    elif solver_order == 2:
        use_second = jnp.logical_not(use_first)
        mean = jnp.where(use_second, mean2, mean1)
        ode = jnp.where(use_second, ode2, ode1)
        std = jnp.where(use_second, std2, std1)
        dts = jnp.where(use_second, dts2, dts1)
    else:
        use_second = jnp.logical_and(
            jnp.logical_not(use_first),
            jnp.logical_or(state.lower_order_nums < 2, lower_order_second),
        )
        use_third = jnp.logical_and(jnp.logical_not(use_first), jnp.logical_not(use_second))
        mean = jnp.where(use_third, mean3, jnp.where(use_second, mean2, mean1))
        ode = jnp.where(use_third, ode3, jnp.where(use_second, ode2, ode1))
        std = jnp.where(use_third, std3, jnp.where(use_second, std2, std1))
        dts = jnp.where(use_third, dts3, jnp.where(use_second, dts2, dts1))

    if prev_sample is None:
        if noise is None:
            next_latents = ode
        else:
            next_latents = jnp.where(sde, mean + std * dts * noise, ode)
    else:
        next_latents = prev_sample

    total_std = jnp.maximum(std * dts, _EPS)
    log_prob = gaussian_log_prob(jnp.asarray(next_latents), mean, total_std)

    new_state = dpm_state_bump(state, solver_order)
    return next_latents, mean, log_prob, new_state
