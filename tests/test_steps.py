"""Solver step math vs independent numpy golden formulas."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.solvers.steps import (
    dance_grpo_step,
    flow_grpo_step,
    gaussian_log_prob,
)


def _np_gauss_logpdf(x, mean, std):
    return -((x - mean) ** 2) / (2 * std**2) - np.log(std) - 0.5 * np.log(2 * np.pi)


def test_gaussian_log_prob_matches_normal_pdf():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    m = rng.normal(size=(2, 3, 4)).astype(np.float32)
    s = np.float32(0.37)
    got = gaussian_log_prob(jnp.asarray(x), jnp.asarray(m), jnp.asarray(s))
    want = _np_gauss_logpdf(x, m, s).mean(axis=(1, 2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_flow_grpo_deterministic_is_euler():
    rng = np.random.default_rng(1)
    z = rng.normal(size=(2, 8)).astype(np.float32)
    v = rng.normal(size=(2, 8)).astype(np.float32)
    sigma, sigma_prev = 0.8, 0.6
    nxt, x0, _, _, _ = flow_grpo_step(
        jnp.asarray(v), jnp.asarray(z), 0.7, sigma, sigma_prev, 0.95,
        noise=jnp.zeros_like(jnp.asarray(z)), deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(nxt), z + (sigma_prev - sigma) * v, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(x0), z - sigma * v, rtol=1e-6)


def test_flow_grpo_sde_mean_std_formula():
    """Golden check of the Flow-GRPO SDE mean/std (sampling_utils.py:157-210)."""
    rng = np.random.default_rng(2)
    z = rng.normal(size=(3, 16)).astype(np.float32)
    v = rng.normal(size=(3, 16)).astype(np.float32)
    noise = rng.normal(size=(3, 16)).astype(np.float32)
    eta, sigma, sigma_prev, sigma_max = 0.7, 0.5, 0.3, 0.95
    dt = sigma_prev - sigma
    std_t = math.sqrt(sigma / (1 - sigma)) * eta
    mean = z * (1 + std_t**2 / (2 * sigma) * dt) + v * (
        1 + std_t**2 * (1 - sigma) / (2 * sigma)
    ) * dt
    total_std = std_t * math.sqrt(-dt)
    want_next = mean + total_std * noise
    want_lp = _np_gauss_logpdf(want_next, mean, total_std).mean(axis=1)

    nxt, _, lp, got_mean, got_std = flow_grpo_step(
        jnp.asarray(v), jnp.asarray(z), eta, sigma, sigma_prev, sigma_max,
        noise=jnp.asarray(noise), deterministic=False,
    )
    np.testing.assert_allclose(np.asarray(nxt), want_next, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_mean), mean, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lp), want_lp, rtol=2e-4)


def test_flow_grpo_sigma_one_uses_sigma_max():
    z = jnp.ones((1, 4))
    v = jnp.ones((1, 4)) * 0.5
    # at sigma == 1 the denominator would be 0; reference substitutes sigmas[1]
    nxt, _, lp, _, _ = flow_grpo_step(
        v, z, 0.7, 1.0, 0.9, 0.95, noise=jnp.zeros_like(z), deterministic=False
    )
    assert np.isfinite(np.asarray(nxt)).all()
    assert np.isfinite(np.asarray(lp)).all()


def test_flow_grpo_recompute_logprob_with_prev_sample():
    """PPO update path: given stored next latents, log_prob must reproduce."""
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    args = (0.7, 0.5, 0.3, 0.95)
    nxt, _, lp1, _, _ = flow_grpo_step(v, z, *args, noise=noise, deterministic=False)
    _, _, lp2, _, _ = flow_grpo_step(v, z, *args, prev_sample=nxt)
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), rtol=1e-6)


def test_dance_grpo_ode_and_sde():
    rng = np.random.default_rng(4)
    z = rng.normal(size=(2, 8)).astype(np.float32)
    v = rng.normal(size=(2, 8)).astype(np.float32)
    noise = rng.normal(size=(2, 8)).astype(np.float32)
    eta, sigma, sigma_prev = 0.7, 0.6, 0.4
    dsigma = sigma_prev - sigma

    nxt, x0, _ = dance_grpo_step(
        jnp.asarray(v), jnp.asarray(z), eta, sigma, sigma_prev,
        noise=jnp.asarray(noise), sde=False,
    )
    np.testing.assert_allclose(np.asarray(nxt), z + dsigma * v, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), z - sigma * v, rtol=1e-5)

    # SDE golden (sampling_utils.py:212-251)
    x0_np = z - sigma * v
    score = -(z - x0_np * (1 - sigma)) / sigma**2
    mean = z + dsigma * v + (-0.5 * eta**2 * score) * dsigma
    std = eta * math.sqrt(sigma - sigma_prev)
    want = mean + std * noise
    want_lp = _np_gauss_logpdf(want, mean, std).mean(axis=1)

    nxt, _, lp = dance_grpo_step(
        jnp.asarray(v), jnp.asarray(z), eta, sigma, sigma_prev,
        noise=jnp.asarray(noise), sde=True,
    )
    np.testing.assert_allclose(np.asarray(nxt), want, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lp), want_lp, rtol=2e-4)


def test_steps_jittable_with_traced_mode():
    @jax.jit
    def f(z, v, det):
        nxt, _, lp, _, _ = flow_grpo_step(
            v, z, 0.7, 0.5, 0.3, 0.95, noise=jnp.zeros_like(z), deterministic=det
        )
        return nxt, lp

    z = jnp.ones((1, 4))
    v = jnp.ones((1, 4))
    a, _ = f(z, v, jnp.array(True))
    b, _ = f(z, v, jnp.array(False))
    np.testing.assert_allclose(np.asarray(a), np.asarray(z + (0.3 - 0.5) * v), rtol=1e-6)
    assert not np.allclose(np.asarray(a), np.asarray(b))
