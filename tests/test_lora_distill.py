"""LoRA adapters, distillation solver, discriminator, EMA, optimizer factory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.lora import apply_lora, init_lora, load_lora, save_lora
from mixgrpo_tpu.models.discriminator import (
    DiscriminatorConfig, discriminator_forward, init_discriminator,
)
from mixgrpo_tpu.models.flux import FluxConfig, flux_forward, init_flux
from mixgrpo_tpu.solvers.distill import (
    EulerSolver, linear_quadratic_schedule, pcm_scheduler_step,
    pcm_sigma_schedule,
)
from mixgrpo_tpu.trainer import get_optimizer
from mixgrpo_tpu.utils.ema import ema_init, ema_update


pytestmark = pytest.mark.slow


def test_lora_zero_init_is_identity_then_trains():
    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    lora = init_lora(jax.random.key(1), params, rank=4)
    assert len(lora["factors"]) > 0
    # stacked block weights got per-depth factors
    qkv = lora["factors"]["double/img_qkv/w"]
    assert qkv["a"].shape == (cfg.depth_double, cfg.hidden_size, 4)

    merged = apply_lora(params, lora)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))  # b zero-init

    # gradient flows into adapters only
    from mixgrpo_tpu.models.flux import make_image_ids, make_text_ids, rope_tables

    ids = np.concatenate([make_text_ids(4), make_image_ids(8, 8)])
    cos, sin = rope_tables(ids, cfg.axes_dims)
    img = jax.random.normal(jax.random.key(2), (1, 16, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(3), (1, 4, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(4), (1, cfg.pooled_dim))

    def loss(factors):
        out = flux_forward(
            apply_lora(params, {**lora, "factors": factors}), cfg, img, txt,
            pooled, jnp.full((1,), 0.5), jnp.full((1,), 3.5), cos, sin,
            dtype=jnp.float32, attn_impl="xla", remat=False,
        )
        return jnp.mean(out**2)

    g = jax.grad(loss)(lora["factors"])
    ga = g["double/img_qkv/w"]["a"]
    gb = g["double/img_qkv/w"]["b"]
    # b is zero so dL/da = 0 but dL/db != 0 (standard LoRA first step)
    assert float(jnp.abs(gb).sum()) > 0
    assert float(jnp.abs(ga).sum()) == 0


def test_lora_save_load_roundtrip(tmp_path):
    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    lora = init_lora(jax.random.key(1), params, rank=2, alpha=8.0)
    # make factors nonzero
    lora["factors"] = jax.tree.map(
        lambda x: x + 0.1, lora["factors"]
    )
    p = str(tmp_path / "lora.safetensors")
    save_lora(lora, p)
    back = load_lora(p)
    assert back["rank"] == 2 and back["alpha"] == 8.0
    m1 = apply_lora(params, lora)
    m2 = apply_lora(params, back)
    for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pcm_schedule_and_euler_solver():
    sig = pcm_sigma_schedule(1000, shift=3.0)
    assert sig.shape == (1000,)
    assert sig[0] > sig[-1] > 0
    solver = EulerSolver.build(sig, 1000, euler_timesteps=50)
    assert solver.sigmas.shape == (50,)
    assert solver.sigmas_prev[0] == sig[0]

    # exact linear path: euler_step from point k to k-1 stays on the path
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(2, 8)).astype(np.float32)
    eps = rng.normal(size=(2, 8)).astype(np.float32)
    t_idx = np.asarray([10, 30])
    sample = (1 - solver.sigmas[t_idx, None]) * x0 + solver.sigmas[t_idx, None] * eps
    stepped = solver.euler_step(jnp.asarray(sample), jnp.asarray(eps - x0), t_idx)
    want = (1 - solver.sigmas_prev[t_idx, None]) * x0 + solver.sigmas_prev[
        t_idx, None
    ] * eps
    np.testing.assert_allclose(np.asarray(stepped), want, rtol=1e-5)

    # multiphase jump lands on a phase boundary sigma
    jumped, t_end = solver.multiphase_pred(
        jnp.asarray(sample), jnp.asarray(eps - x0), t_idx, multiphase=4
    )
    te = np.asarray(t_end)
    assert (te <= t_idx).all()
    want = (1 - solver.sigmas_prev[te, None]) * x0 + solver.sigmas_prev[
        te, None
    ] * eps
    np.testing.assert_allclose(np.asarray(jumped), want, rtol=1e-5)


def test_linear_quadratic_schedule():
    s = linear_quadratic_schedule(100, 0.025, 50)
    assert s.shape == (100,)
    assert s[0] == 1.0 and 0 <= s[-1] < 0.1


def test_pcm_scheduler_step_exact():
    sig = np.asarray([0.8, 0.5, 0.2, 0.0], np.float32)
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(1, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4)).astype(np.float32)
    z = (1 - sig[0]) * x0 + sig[0] * eps
    for i in range(3):
        z = pcm_scheduler_step(sig, i, jnp.asarray(eps - x0), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(z), x0, rtol=1e-5)


def test_discriminator_forward():
    cfg = DiscriminatorConfig(stride=2, adapter_channels=(32,), total_layers=4,
                              inner_channels=64, groups=8)
    params = init_discriminator(jax.random.key(0), cfg)
    feats = [jax.random.normal(jax.random.key(i), (2, 12, 32)) for i in range(2)]
    outs = discriminator_forward(params, cfg, feats)
    assert len(outs) == 2
    assert outs[0].shape == (2, 12, 1)
    assert np.isfinite(np.asarray(outs[0])).all()


def test_ema_update():
    p = {"w": jnp.ones((4,))}
    e = ema_init(p)
    p2 = {"w": jnp.zeros((4,))}
    e = ema_update(e, p2, decay=0.9)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.9)
    # before start_step: no-op
    e2 = ema_update(e, p2, decay=0.9, step=3, start_step=10)
    np.testing.assert_allclose(np.asarray(e2["w"]), np.asarray(e["w"]))


def test_optimizer_factory():
    for name in ("adam", "adamw"):
        opt = get_optimizer(name, learning_rate=1e-3)
        p = {"w": jnp.ones((2, 2))}
        st = opt.init(p)
        up, _ = opt.update({"w": jnp.ones((2, 2))}, st, p)
        assert np.isfinite(np.asarray(up["w"])).all()
    with pytest.raises(ValueError):
        get_optimizer("prodigy")
