"""Mochi T2V pipeline: CFG sampling over the linear-quadratic schedule."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.mochi import MochiConfig, init_mochi
from mixgrpo_tpu.models.mochi.pipeline import MochiPipeline


pytestmark = pytest.mark.slow


def test_mochi_pipeline_cfg():
    cfg = MochiConfig.tiny()
    params = init_mochi(jax.random.key(0), cfg)
    pipe = MochiPipeline(cfg, params, num_steps=4, guidance_scale=4.5,
                         dtype=jnp.float32)
    txt = jax.random.normal(jax.random.key(1), (1, 6, cfg.text_embed_dim))
    lat = pipe(txt, num_frames=7, height=16, width=16, rng=jax.random.key(2))
    assert lat.shape == (1, 2, 2, 2, cfg.in_channels)
    assert np.isfinite(np.asarray(lat)).all()

    # guidance scale changes the trajectory
    pipe2 = MochiPipeline(cfg, params, num_steps=4, guidance_scale=1.0,
                          dtype=jnp.float32)
    lat2 = pipe2(txt, num_frames=7, height=16, width=16, rng=jax.random.key(2))
    assert not np.allclose(np.asarray(lat), np.asarray(lat2))


def test_mochi_tiled_decode_matches_fused_passthrough_and_shapes():
    from mixgrpo_tpu.models.mochi.vae import (
        MochiVAEConfig, init_mochi_vae_decoder, mochi_vae_decode,
        mochi_vae_decode_tiled)

    cfg = MochiVAEConfig.tiny()
    params = init_mochi_vae_decoder(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1),
                            (1, 3, 6, 6, cfg.latent_channels)) * 0.5
    full = np.asarray(mochi_vae_decode(params, cfg, lat, dtype=jnp.float32))
    same = np.asarray(mochi_vae_decode_tiled(params, cfg, lat,
                                             dtype=jnp.float32))
    np.testing.assert_array_equal(same, full)  # single-tile passthrough
    # multi-tile: shape + finiteness (rt=6 mapping: T_out = 1+(T-1)*6)
    lat2 = jax.random.normal(jax.random.key(2),
                             (1, 5, 8, 8, cfg.latent_channels)) * 0.5
    out = np.asarray(mochi_vae_decode_tiled(
        params, cfg, lat2, dtype=jnp.float32, tile_latent=4,
        tile_latent_t=2))
    assert out.shape == (1, 25, 64, 64, 3)
    assert np.isfinite(out).all()
