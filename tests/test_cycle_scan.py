"""cycle_scan custom VJP: value/grad parity vs plain autodiff.

The hand-written VJP (utils/cycle_scan.py) replaces the nested-scan
transpose's DUS-materialize + whole-stack-add gradient accumulation with
dense per-block adds (see its module docstring).  These tests pin:
  - exact value parity with a hand loop and with autodiff's nested scan;
  - gradient parity in carry, stack, AND closed-over tracer consts
    (closure_convert path), including a bool closure (float0 cotangent);
  - integration parity inside flux_forward(virtual_depth=...) against
    the autodiff nested-scan path it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.utils.cycle_scan import cycle_scan


def _toy(n=6, k=2, d=8):
    key = jax.random.key(0)
    ks = jax.random.split(key, 4)
    stack = {
        "w": jax.random.normal(ks[0], (k, d, d)) * 0.3,
        "b": jax.random.normal(ks[1], (k, d)) * 0.1,
    }
    carry = jax.random.normal(ks[2], (3, d))
    vec = jax.random.normal(ks[3], (d,))  # closed-over tracer const
    return carry, stack, vec


def _body_factory(vec, mask=None):
    def body(c, p):
        h = jnp.tanh(c @ p["w"] + p["b"] + vec)
        if mask is not None:
            h = jnp.where(mask, h, c)
        return c + h, None

    return body


def _reference(carry, stack, vec, n, k, mask=None):
    body = _body_factory(vec, mask)
    for i in range(n):
        carry, _ = body(carry, jax.tree.map(lambda w: w[i % k], stack))
    return carry


def test_value_matches_hand_loop():
    carry, stack, vec = _toy()
    out = cycle_scan(_body_factory(vec), carry, stack, 6, 2)
    ref = _reference(carry, stack, vec, 6, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_k_must_divide_n():
    carry, stack, vec = _toy()
    with pytest.raises(ValueError):
        cycle_scan(_body_factory(vec), carry, stack, 5, 2)


def test_grads_match_autodiff_in_carry_stack_and_consts():
    carry, stack, vec = _toy()

    def loss_vjp(carry, stack, vec):
        out = cycle_scan(_body_factory(vec), carry, stack, 6, 2)
        return jnp.sum(out**2)

    def loss_ref(carry, stack, vec):
        return jnp.sum(_reference(carry, stack, vec, 6, 2) ** 2)

    g_vjp = jax.grad(loss_vjp, argnums=(0, 1, 2))(carry, stack, vec)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(carry, stack, vec)
    for a, b in zip(jax.tree.leaves(g_vjp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_bool_closure_gets_float0_not_crash():
    carry, stack, vec = _toy()
    mask = jnp.arange(8) % 2 == 0  # bool tracer const under jit

    @jax.jit
    def loss(carry, stack, vec, mask):
        out = cycle_scan(_body_factory(vec, mask), carry, stack, 4, 2)
        return jnp.sum(out**2)

    g = jax.grad(loss, argnums=(0, 1))(carry, stack, vec, mask)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_jit_value_and_grad():
    carry, stack, vec = _toy()

    @jax.jit
    def loss(carry, stack, vec):
        return jnp.sum(cycle_scan(_body_factory(vec), carry, stack, 6, 2) ** 2)

    v = float(loss(carry, stack, vec))
    ref = float(jnp.sum(_reference(carry, stack, vec, 6, 2) ** 2))
    assert np.isclose(v, ref, rtol=1e-6)
    g = jax.jit(jax.grad(loss, argnums=1))(carry, stack, vec)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


# ---------------------------------------------------------------------------
# integration: flux_forward virtual-depth grads, VJP path vs autodiff nested
# ---------------------------------------------------------------------------


def _flux_setup():
    from mixgrpo_tpu.models.flux import (
        FluxConfig, init_flux, make_image_ids, make_text_ids, rope_tables,
    )

    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    B, lh, lw, lt = 2, 8, 8, 6
    key = jax.random.key(1)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), cfg.in_channels))
    txt = jax.random.normal(key, (B, lt, cfg.context_dim))
    pooled = jax.random.normal(key, (B, cfg.pooled_dim))
    t = jnp.full((B,), 0.5)
    g = jnp.full((B,), 3.5)
    ids = np.concatenate([make_text_ids(lt), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims, cfg.theta)
    return cfg, params, (img, txt, pooled, t, g, cos, sin)


def test_flux_virtual_depth_vjp_matches_autodiff(monkeypatch):
    from mixgrpo_tpu.models.flux import model as M
    from mixgrpo_tpu.models.flux import flux_forward

    cfg, params, args = _flux_setup()

    def loss(p):
        out = flux_forward(p, cfg, *args, dtype=jnp.float32, attn_impl="xla",
                           remat=True, virtual_depth=(6, 8))
        return jnp.mean(out**2)

    monkeypatch.setattr(M, "_CYCLE_VJP", True)
    v_new, g_new = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(M, "_CYCLE_VJP", False)
    v_old, g_old = jax.value_and_grad(loss)(params)

    np.testing.assert_allclose(float(v_new), float(v_old), rtol=1e-6)
    flat_new, tdef_new = jax.tree.flatten(g_new)
    flat_old, tdef_old = jax.tree.flatten(g_old)
    assert tdef_new == tdef_old
    for a, b in zip(flat_new, flat_old):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )
