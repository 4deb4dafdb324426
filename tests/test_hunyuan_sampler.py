"""HunyuanVideoSampler predict() wrapper (models/hunyuan/sampler.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.models.hunyuan.sampler import HunyuanVideoSampler, _resolve_seeds


def test_resolve_seeds_reference_semantics():
    # int seed: seed+i per video, repeated per prompt (inference.py:399-403)
    assert _resolve_seeds(7, 2, 2) == [7, 8, 7, 8]
    # per-prompt list: each fans out over videos
    assert _resolve_seeds([3, 9], 2, 2) == [3, 4, 9, 10]
    # full list passes through
    assert _resolve_seeds([1, 2, 3, 4], 2, 2) == [1, 2, 3, 4]
    # None -> random, right count
    assert len(_resolve_seeds(None, 3, 2)) == 6
    with pytest.raises(ValueError):
        _resolve_seeds([1, 2, 3], 2, 2)


def _fake_pipeline():
    from mixgrpo_tpu.models.hunyuan.model import (
        HunyuanVideoConfig, init_hunyuan_video,
    )
    from mixgrpo_tpu.models.hunyuan.pipeline import HunyuanVideoPipeline

    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)

    class FakeTextEncoder:
        def __call__(self, prompts, data_type="video"):
            k = jax.random.key(abs(hash(tuple(prompts))) % (2**31))
            txt = jax.random.normal(k, (len(prompts), 4, cfg.text_states_dim))
            return txt, jnp.ones((len(prompts), 4), jnp.int32)

    class FakePooler:
        def __call__(self, prompts):
            return jnp.zeros((len(prompts), cfg.text_states_dim_2))

    return HunyuanVideoPipeline(
        cfg, params, num_steps=2, dtype=jnp.float32, attn_impl="xla",
        text_encoder=FakeTextEncoder(), clip_pooler=FakePooler(),
    ), cfg


@pytest.mark.slow
def test_predict_smoke_and_validation():
    pipe, cfg = _fake_pipeline()
    sampler = HunyuanVideoSampler(pipe)
    with pytest.raises(ValueError):
        sampler.predict("a cat", video_length=6)  # (6-1) % 4 != 0
    with pytest.raises(ValueError):
        sampler.predict("a cat", height=0)

    out = sampler.predict("a cat", height=16, width=16, video_length=5,
                          seed=11, num_videos_per_prompt=2)
    assert len(out["samples"]) == 2 and out["seeds"] == [11, 12]
    assert out["negative_prompt"]  # default applied
    for s in out["samples"]:
        assert s.shape == (2, 2, 2, cfg.in_channels)  # latents (no VAE)
        assert np.isfinite(s).all()
    # different seeds -> different samples
    assert not np.allclose(out["samples"][0], out["samples"][1])
