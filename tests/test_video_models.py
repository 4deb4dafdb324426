"""HunyuanVideo + Mochi video DiTs: shapes, grads, scheduler, rope ids."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.hunyuan import (
    FlowMatchDiscreteScheduler,
    HunyuanVideoConfig,
    hunyuan_video_forward,
    init_hunyuan_video,
    make_video_ids,
)
from mixgrpo_tpu.models.mochi import MochiConfig, init_mochi, mochi_forward


pytestmark = pytest.mark.slow


def test_video_ids_layout():
    ids = make_video_ids(2, 4, 4)  # packed grid 2x2x2
    assert ids.shape == (2 * 2 * 2, 3)
    np.testing.assert_allclose(ids[0], [0, 0, 0])
    np.testing.assert_allclose(ids[1], [0, 0, 1])
    np.testing.assert_allclose(ids[4], [1, 0, 0])
    # sp scaling extends the temporal axis
    assert make_video_ids(2, 4, 4, sp_size=2).shape == (16, 3)


def test_hunyuan_forward_and_grad():
    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)
    B, T, H, W = 2, 3, 8, 8
    lat = jax.random.normal(jax.random.key(1), (B, T, H, W, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(2), (B, 6, cfg.text_states_dim))
    pooled = jax.random.normal(jax.random.key(3), (B, cfg.text_states_dim_2))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0], [1, 1, 0, 0, 0, 0]]))
    t = jnp.full((B,), 0.4)
    g = jnp.full((B,), 6.0)

    out = hunyuan_video_forward(
        params, cfg, lat, txt, pooled, t, g, mask,
        dtype=jnp.float32, attn_impl="xla", remat=False,
    )
    assert out.shape == (B, T, H, W, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        o = hunyuan_video_forward(p, cfg, lat, txt, pooled, t, g, mask,
                                  dtype=jnp.float32, attn_impl="xla", remat=True)
        return jnp.mean(o**2)

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(grads))


def test_hunyuan_text_mask_matters():
    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)
    B, T, H, W = 1, 2, 8, 8
    lat = jax.random.normal(jax.random.key(1), (B, T, H, W, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(2), (B, 6, cfg.text_states_dim))
    pooled = jax.random.normal(jax.random.key(3), (B, cfg.text_states_dim_2))
    t = jnp.full((B,), 0.4)
    g = jnp.full((B,), 6.0)
    m1 = jnp.asarray([[1, 1, 1, 1, 1, 1]])
    m2 = jnp.asarray([[1, 1, 1, 0, 0, 0]])
    o1 = hunyuan_video_forward(params, cfg, lat, txt, pooled, t, g, m1,
                               dtype=jnp.float32, attn_impl="xla", remat=False)
    o2 = hunyuan_video_forward(params, cfg, lat, txt, pooled, t, g, m2,
                               dtype=jnp.float32, attn_impl="xla", remat=False)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_flow_match_discrete_scheduler():
    s = FlowMatchDiscreteScheduler(shift=7.0)
    ts = s.set_timesteps(10)
    assert ts.shape == (10,)
    assert s.sigmas[0] == 1.0 and s.sigmas[-1] == 0.0
    # exact Euler on a linear path lands on x0
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(1, 4)).astype(np.float32)
    eps = rng.normal(size=(1, 4)).astype(np.float32)
    z = jnp.asarray(eps)
    for i in range(10):
        z = s.step(jnp.asarray(eps - x0), i, z)
    np.testing.assert_allclose(np.asarray(z), x0, rtol=1e-4, atol=1e-5)


def test_mochi_forward_and_grad():
    cfg = MochiConfig.tiny()
    params = init_mochi(jax.random.key(0), cfg)
    B, T, H, W = 1, 2, 8, 8
    lat = jax.random.normal(jax.random.key(1), (B, T, H, W, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(2), (B, 8, cfg.text_embed_dim))
    mask = jnp.ones((B, 8), jnp.int32)
    t = jnp.full((B,), 0.3)

    out = mochi_forward(params, cfg, lat, txt, t, mask,
                        dtype=jnp.float32, remat=False)
    assert out.shape == (B, T, H, W, cfg.in_channels)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return jnp.mean(
            mochi_forward(p, cfg, lat, txt, t, mask, dtype=jnp.float32,
                          remat=True) ** 2
        )

    grads = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(grads))


def test_mochi_caption_affects_output():
    cfg = MochiConfig.tiny()
    params = init_mochi(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 2, 8, 8, cfg.in_channels))
    t = jnp.full((1,), 0.3)
    txt1 = jax.random.normal(jax.random.key(2), (1, 8, cfg.text_embed_dim))
    txt2 = jax.random.normal(jax.random.key(3), (1, 8, cfg.text_embed_dim))
    o1 = mochi_forward(params, cfg, lat, txt1, t, dtype=jnp.float32, remat=False)
    o2 = mochi_forward(params, cfg, lat, txt2, t, dtype=jnp.float32, remat=False)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_hunyuan_pallas_masked_attention_matches_xla():
    """The joint text-mask path through the Pallas kernel (interpret mode)."""
    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)
    B, T, H, W = 1, 2, 8, 8
    lat = jax.random.normal(jax.random.key(1), (B, T, H, W, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(2), (B, 6, cfg.text_states_dim))
    pooled = jax.random.normal(jax.random.key(3), (B, cfg.text_states_dim_2))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0]])
    t = jnp.full((B,), 0.4)
    g = jnp.full((B,), 6.0)
    want = hunyuan_video_forward(params, cfg, lat, txt, pooled, t, g, mask,
                                 dtype=jnp.float32, attn_impl="xla", remat=False)
    got = hunyuan_video_forward(params, cfg, lat, txt, pooled, t, g, mask,
                                dtype=jnp.float32, attn_impl="pallas",
                                remat=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
