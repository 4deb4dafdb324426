"""HunyuanVideo end-to-end T2V pipeline on tiny configs."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.hunyuan.model import HunyuanVideoConfig, init_hunyuan_video
from mixgrpo_tpu.models.hunyuan.pipeline import HunyuanVideoPipeline
from mixgrpo_tpu.models.hunyuan.vae3d import CausalVAEConfig, init_causal_vae_decoder


pytestmark = pytest.mark.slow


def test_t2v_pipeline_end_to_end():
    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)
    vae_cfg = CausalVAEConfig.tiny()
    vae_params = init_causal_vae_decoder(jax.random.key(1), vae_cfg)

    pipe = HunyuanVideoPipeline(
        cfg, params, vae_cfg=vae_cfg, vae_params=vae_params,
        num_steps=4, dtype=jnp.float32, attn_impl="xla",
    )
    txt = jax.random.normal(jax.random.key(2), (1, 6, cfg.text_states_dim))
    pooled = jax.random.normal(jax.random.key(3), (1, cfg.text_states_dim_2))

    video = pipe(txt, pooled, video_length=5, height=32, width=32,
                 rng=jax.random.key(4))
    # latent T = (5-1)/4+1 = 2 -> decoded T = 1+(2-1)*4 = 5 frames
    assert video.shape == (1, 5, 32, 32, 3)
    v = np.asarray(video)
    assert np.isfinite(v).all()
    assert v.min() >= 0.0 and v.max() <= 1.0


def test_t2v_latents_only():
    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)
    pipe = HunyuanVideoPipeline(cfg, params, num_steps=3, dtype=jnp.float32,
                                attn_impl="xla")
    txt = jax.random.normal(jax.random.key(2), (2, 4, cfg.text_states_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.text_states_dim_2))
    lat = pipe(txt, pooled, video_length=5, height=16, width=16,
               rng=jax.random.key(4))
    assert lat.shape == (2, 2, 2, 2, cfg.in_channels)
    assert np.isfinite(np.asarray(lat)).all()
