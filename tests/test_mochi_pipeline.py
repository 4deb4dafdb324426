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
