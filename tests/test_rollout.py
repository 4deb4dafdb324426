"""Rollout scan: ODE exactness, SDE log-probs, window masking, Flash padding."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.solvers.rollout import SamplerConfig, run_rollout
from mixgrpo_tpu.solvers.schedule import (
    deterministic_mask,
    flash_post_schedule,
    sigma_schedule,
)


pytestmark = pytest.mark.slow


def _exact_model_fn(x0, eps):
    """Exact rectified-flow velocity: v = eps - x0, independent of (z, sigma)."""
    v = jnp.asarray(eps - x0)
    return lambda z, sigma: v


def test_ode_rollout_exact():
    """Euler on a linear (rectified) path is exact: final latents == x0."""
    T = 25
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 16)).astype(np.float32)
    eps = rng.normal(size=(2, 16)).astype(np.float32)
    sig = jnp.asarray(sigma_schedule(T, 3.0))
    cfg = SamplerConfig(num_steps_max=T, eta=0.7, flow_grpo_sampling=True)
    out = run_rollout(
        cfg, _exact_model_fn(x0, eps), jnp.asarray(eps),
        sigmas=sig, deterministic=jnp.ones(T, bool), num_steps=T,
        rng=jax.random.key(0),
    )
    np.testing.assert_allclose(np.asarray(out.final_latents), x0, rtol=1e-3, atol=1e-4)
    assert out.all_latents.shape == (2, T + 1, 16)
    assert out.all_log_probs.shape == (2, T)
    assert np.asarray(out.step_valid).all()


def test_window_sde_steps_differ_and_have_logprobs():
    T = 25
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(1, 16)).astype(np.float32)
    eps = rng.normal(size=(1, 16)).astype(np.float32)
    sig = jnp.asarray(sigma_schedule(T, 3.0))
    det = jnp.asarray(deterministic_mask(T, [10, 11, 12, 13]))
    cfg = SamplerConfig(num_steps_max=T)
    fn = _exact_model_fn(x0, eps)
    key = jax.random.key(42)

    out = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=sig,
                      deterministic=det, num_steps=T, rng=key)
    ode = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=sig,
                      deterministic=jnp.ones(T, bool), num_steps=T, rng=key)
    # trajectories identical before the window, diverge at the window
    np.testing.assert_allclose(
        np.asarray(out.all_latents[:, :11]), np.asarray(ode.all_latents[:, :11]),
        rtol=1e-5,
    )
    assert not np.allclose(
        np.asarray(out.all_latents[:, 11]), np.asarray(ode.all_latents[:, 11])
    )
    lp = np.asarray(out.all_log_probs)
    assert np.isfinite(lp).all()


def test_rollout_jit_window_is_data():
    """Moving the window must not retrigger compilation."""
    T = 10
    rng = np.random.default_rng(2)
    x0 = rng.normal(size=(1, 8)).astype(np.float32)
    eps = rng.normal(size=(1, 8)).astype(np.float32)
    sig = jnp.asarray(sigma_schedule(T, 3.0))
    cfg = SamplerConfig(num_steps_max=T)
    fn = _exact_model_fn(x0, eps)

    @jax.jit
    def roll(det, key):
        return run_rollout(cfg, fn, jnp.asarray(eps), sigmas=sig,
                           deterministic=det, num_steps=T, rng=key)

    d1 = jnp.asarray(deterministic_mask(T, [2, 3]))
    d2 = jnp.asarray(deterministic_mask(T, [6, 7]))
    r1 = roll(d1, jax.random.key(0))
    r2 = roll(d2, jax.random.key(0))
    assert roll._cache_size() == 1
    assert not np.allclose(np.asarray(r1.all_latents), np.asarray(r2.all_latents))


def test_flash_compressed_ode_rollout_exact():
    """Pure-ODE rollout over a Flash-compressed, padded schedule is exact.

    deterministic all-True makes every step take the DPM tail path
    (last_sde_index = -1), so this checks the in-scan multistep DPM solver
    plus the padding no-op region.
    """
    T = 25
    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(1, 16)).astype(np.float32)
    eps = rng.normal(size=(1, 16)).astype(np.float32)
    base = sigma_schedule(T, 3.0)
    det = deterministic_mask(T, [10, 11, 12, 13])
    sig_c, n, _ = flash_post_schedule(base, det, 3.0, 0.4, pad_to=T)

    cfg = SamplerConfig(
        num_steps_max=T, dpm_algorithm_type="dpmsolver++",
        dpm_apply_strategy="post", dpm_solver_order=2,
        dpm_solver_type="midpoint",
    )
    fn = _exact_model_fn(x0, eps)
    out = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=jnp.asarray(sig_c),
                      deterministic=jnp.ones(T, bool), num_steps=n,
                      rng=jax.random.key(7))
    np.testing.assert_allclose(np.asarray(out.final_latents), x0, rtol=2e-3, atol=2e-4)
    lat = np.asarray(out.all_latents)
    assert np.abs(lat[:, n:] - lat[:, n : n + 1]).max() == 0.0
    np.testing.assert_allclose(np.asarray(out.all_log_probs)[:, n:], 0.0)
    assert np.asarray(out.step_valid).sum() == n


def test_flash_sde_window_rollout():
    """Flash post strategy with a live SDE window: finite, padded no-ops,
    and the pre-window prefix matches a pure-ODE run."""
    T = 25
    rng = np.random.default_rng(8)
    x0 = rng.normal(size=(1, 16)).astype(np.float32)
    eps = rng.normal(size=(1, 16)).astype(np.float32)
    base = sigma_schedule(T, 3.0)
    det = deterministic_mask(T, [10, 11, 12, 13])
    sig_c, n, det_c = flash_post_schedule(base, det, 3.0, 0.4, pad_to=T)

    cfg = SamplerConfig(
        num_steps_max=T, dpm_algorithm_type="dpmsolver++",
        dpm_apply_strategy="post", dpm_solver_order=2,
        dpm_solver_type="midpoint",
    )
    fn = _exact_model_fn(x0, eps)
    key = jax.random.key(9)
    out = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=jnp.asarray(sig_c),
                      deterministic=jnp.asarray(det_c), num_steps=n, rng=key)
    ode = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=jnp.asarray(sig_c),
                      deterministic=jnp.ones(T, bool), num_steps=n, rng=key)
    assert np.isfinite(np.asarray(out.all_latents)).all()
    np.testing.assert_allclose(
        np.asarray(out.all_latents[:, :11]), np.asarray(ode.all_latents[:, :11]),
        rtol=1e-4, atol=1e-6,
    )
    # SDE window steps carry finite log-probs
    lp = np.asarray(out.all_log_probs)
    assert np.isfinite(lp).all()
    np.testing.assert_allclose(lp[:, n:], 0.0)
    lat = np.asarray(out.all_latents)
    assert np.abs(lat[:, n:] - lat[:, n : n + 1]).max() == 0.0


def test_dance_rollout_runs():
    T = 10
    rng = np.random.default_rng(4)
    x0 = rng.normal(size=(1, 8)).astype(np.float32)
    eps = rng.normal(size=(1, 8)).astype(np.float32)
    sig = jnp.asarray(sigma_schedule(T, 3.0))
    det = jnp.asarray(deterministic_mask(T, [4, 5]))
    cfg = SamplerConfig(num_steps_max=T, flow_grpo_sampling=False)
    out = run_rollout(cfg, _exact_model_fn(x0, eps), jnp.asarray(eps),
                      sigmas=sig, deterministic=det, num_steps=T,
                      rng=jax.random.key(0))
    assert np.isfinite(np.asarray(out.all_latents)).all()
    assert np.isfinite(np.asarray(out.all_log_probs)).all()


def test_dpm_all_strategy_rollout():
    T = 12
    rng = np.random.default_rng(5)
    x0 = rng.normal(size=(1, 8)).astype(np.float32)
    eps = rng.normal(size=(1, 8)).astype(np.float32)
    sig = jnp.asarray(sigma_schedule(T, 3.0))
    det = jnp.asarray(deterministic_mask(T, [4, 5, 6, 7]))
    cfg = SamplerConfig(
        num_steps_max=T, dpm_algorithm_type="dpmsolver++",
        dpm_apply_strategy="all", dpm_solver_order=2,
    )
    # pure ODE: exact on the linear path
    out = run_rollout(cfg, _exact_model_fn(x0, eps), jnp.asarray(eps),
                      sigmas=sig, deterministic=jnp.ones(T, bool), num_steps=T,
                      rng=jax.random.key(0))
    np.testing.assert_allclose(np.asarray(out.final_latents), x0, rtol=5e-3, atol=5e-4)
    # with an SDE window the trajectory leaves the exact path (the constant
    # "exact" velocity no longer points at x0) — just check finiteness
    out = run_rollout(cfg, _exact_model_fn(x0, eps), jnp.asarray(eps),
                      sigmas=sig, deterministic=det, num_steps=T,
                      rng=jax.random.key(0))
    assert np.isfinite(np.asarray(out.all_latents)).all()
    assert np.isfinite(np.asarray(out.all_log_probs)).all()


def test_rollout_deterministic_given_key():
    """Same PRNG key -> bit-identical trajectory; different key differs
    (the reference relies on per-rank torch seeds; here noise is a pure
    function of the key, SURVEY.md §7 'RNG discipline')."""
    T = 8
    rng = np.random.default_rng(9)
    x0 = rng.normal(size=(1, 8)).astype(np.float32)
    eps = rng.normal(size=(1, 8)).astype(np.float32)
    sig = jnp.asarray(sigma_schedule(T, 3.0))
    det = jnp.asarray(deterministic_mask(T, [2, 3, 4]))
    cfg = SamplerConfig(num_steps_max=T)
    fn = _exact_model_fn(x0, eps)
    a = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=sig, deterministic=det,
                    num_steps=T, rng=jax.random.key(11))
    b = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=sig, deterministic=det,
                    num_steps=T, rng=jax.random.key(11))
    np.testing.assert_array_equal(np.asarray(a.all_latents), np.asarray(b.all_latents))
    np.testing.assert_array_equal(np.asarray(a.all_log_probs), np.asarray(b.all_log_probs))
    c = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=sig, deterministic=det,
                    num_steps=T, rng=jax.random.key(12))
    assert not np.allclose(np.asarray(a.all_latents), np.asarray(c.all_latents))


def test_run_rollout_matches_python_step_loop():
    """The fused traced-bound loop reproduces a plain Python loop of
    rollout_step exactly (latents AND log-probs), including SDE window
    steps and the padded tail — guards the while_loop carry/indexing."""
    from mixgrpo_tpu.solvers import dpm as dpm_mod
    from mixgrpo_tpu.solvers.rollout import rollout_step

    T, n_valid = 10, 8
    rng = np.random.default_rng(7)
    x0 = rng.normal(size=(2, 16)).astype(np.float32)
    eps = rng.normal(size=(2, 16)).astype(np.float32)
    sig = jnp.asarray(sigma_schedule(T, 3.0))
    det = jnp.asarray(deterministic_mask(T, [3, 4, 5]))
    cfg = SamplerConfig(num_steps_max=T, eta=0.7)
    fn = _exact_model_fn(x0, eps)
    key = jax.random.key(11)

    out = run_rollout(cfg, fn, jnp.asarray(eps), sigmas=sig,
                      deterministic=det, num_steps=n_valid, rng=key)

    z = jnp.asarray(eps, jnp.float32)
    st = dpm_mod.dpm_state_init(max(cfg.dpm_solver_order, 1), z.shape,
                                jnp.float32)
    last_sde = int(np.max(np.nonzero(~np.asarray(det))[0]))
    for i in range(n_valid):
        noise = jax.random.normal(
            jax.random.fold_in(key, i), z.shape, jnp.float32
        )
        z, lp, _, st = rollout_step(
            cfg, fn, z, st, sigmas=sig, step_index=jnp.int32(i),
            num_steps=jnp.int32(n_valid), deterministic=det[i],
            last_sde_index=jnp.int32(last_sde), noise=noise,
        )
        np.testing.assert_allclose(
            np.asarray(out.all_latents[:, i + 1]), np.asarray(z),
            rtol=1e-5, atol=1e-6, err_msg=f"latents step {i}",
        )
        np.testing.assert_allclose(
            np.asarray(out.all_log_probs[:, i]), np.asarray(lp),
            rtol=1e-5, atol=1e-6, err_msg=f"log_prob step {i}",
        )
    # padded tail: frozen latents, zero log-probs, valid mask correct
    lat = np.asarray(out.all_latents)
    for i in range(n_valid + 1, T + 1):
        np.testing.assert_array_equal(lat[:, i], lat[:, n_valid])
    np.testing.assert_array_equal(
        np.asarray(out.all_log_probs)[:, n_valid:], 0.0
    )
    np.testing.assert_array_equal(
        np.asarray(out.step_valid), np.arange(T) < n_valid
    )


# ---------------------------------------------------------------------------
# chunked group rollout (round 5: rollout at the measured B-knee)
# ---------------------------------------------------------------------------


def _tiny_sampler(T=6):
    from mixgrpo_tpu.models.flux import FluxConfig, init_flux
    from mixgrpo_tpu.sampler import FluxSampler

    cfg = FluxConfig.tiny()
    sampler = FluxSampler(
        cfg, SamplerConfig(num_steps_max=T, eta=0.7),
        height=64, width=64, text_len=4, dtype=jnp.float32, attn_impl="xla",
    )
    params = init_flux(jax.random.key(0), cfg)
    return cfg, sampler, params


def test_chunked_rollout_matches_unchunked_ode():
    """All-ODE rollout is rng-independent, so chunking must reproduce the
    single-call output INCLUDING row order (tight tolerance: the chunked
    program compiles at a different batch shape, so XLA may reassociate
    f32 reductions — bit-exactness is not guaranteed)."""
    T, B = 6, 8
    cfg, sampler, params = _tiny_sampler(T)
    key = jax.random.key(1)
    txt = jax.random.normal(key, (B, 4, cfg.context_dim))
    pooled = jax.random.normal(key, (B, cfg.pooled_dim))
    z0 = sampler.init_noise(jax.random.key(2), B)
    sig = sigma_schedule(T, 3.0)
    det = jnp.ones(T, bool)
    want = sampler.rollout(params, z0, txt, pooled, sig, det, T, jax.random.key(3))
    got = sampler.chunked_rollout(
        params, z0, txt, pooled, sig, det, T, jax.random.key(3), chunk=2
    )
    close = lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    close(got.final_latents, want.final_latents)
    close(got.all_latents, want.all_latents)
    close(got.all_log_probs, want.all_log_probs)
    np.testing.assert_array_equal(
        np.asarray(got.step_valid), np.asarray(want.step_valid))


def test_chunked_rollout_fallback_and_sde_shapes():
    """Non-dividing local batch falls back to one call; SDE chunked rollout
    produces per-row log-probs with the right shapes."""
    T, B = 6, 6
    cfg, sampler, params = _tiny_sampler(T)
    key = jax.random.key(1)
    txt = jax.random.normal(key, (B, 4, cfg.context_dim))
    pooled = jax.random.normal(key, (B, cfg.pooled_dim))
    z0 = sampler.init_noise(jax.random.key(2), B)
    sig = sigma_schedule(T, 3.0)
    det = deterministic_mask(T, [2, 3])
    # chunk=4 does not divide 6 -> identical to the plain call (same rng path)
    want = sampler.rollout(params, z0, txt, pooled, sig, det, T, jax.random.key(3))
    got = sampler.chunked_rollout(
        params, z0, txt, pooled, sig, det, T, jax.random.key(3), chunk=4
    )
    np.testing.assert_array_equal(
        np.asarray(got.final_latents), np.asarray(want.final_latents))
    # chunk=2 divides: SDE noise stream differs by design; check shapes +
    # that the SDE window produced nonzero log-probs per row
    got2 = sampler.chunked_rollout(
        params, z0, txt, pooled, sig, det, T, jax.random.key(3), chunk=2
    )
    assert got2.all_log_probs.shape == (B, T)
    assert np.abs(np.asarray(got2.all_log_probs)[:, 2:4]).min() > 0


def test_chunked_rollout_sharded_mesh():
    """dp/fsdp-sharded batch: chunk selection/merge are shard-local and
    preserve global row order (ODE equality vs the one-call path)."""
    from mixgrpo_tpu.parallel.mesh import MeshConfig, make_mesh
    from mixgrpo_tpu.parallel.sharding import data_spec

    T, B = 6, 16
    cfg, sampler, params = _tiny_sampler(T)
    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, sp=1, tp=2))
    key = jax.random.key(1)
    txt = jax.device_put(
        jax.random.normal(key, (B, 4, cfg.context_dim)), data_spec(mesh, 3))
    pooled = jax.device_put(
        jax.random.normal(key, (B, cfg.pooled_dim)), data_spec(mesh, 2))
    z0 = jax.device_put(sampler.init_noise(jax.random.key(2), B),
                        data_spec(mesh, 3))
    sig = sigma_schedule(T, 3.0)
    det = jnp.ones(T, bool)
    with mesh:
        want = sampler.rollout(
            params, z0, txt, pooled, sig, det, T, jax.random.key(3))
        got = sampler.chunked_rollout(
            params, z0, txt, pooled, sig, det, T, jax.random.key(3),
            chunk=2, mesh=mesh,
        )
    np.testing.assert_allclose(
        np.asarray(got.final_latents), np.asarray(want.final_latents),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.all_latents), np.asarray(want.all_latents),
        rtol=1e-4, atol=1e-6)
