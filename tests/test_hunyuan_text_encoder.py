"""HunyuanVideo LLM text encoder: templates, crop_start, pipeline wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.hunyuan.text_encoder import (
    HUNYUAN_PROMPT_TEMPLATES, LLMTextEncoder,
)
from mixgrpo_tpu.models.text.llama import (
    LlamaConfig, init_llama, llama_hidden_states,
)


def _char_tokenize(texts, max_length):
    """Deterministic fake tokenizer: bytes mod vocab, right padding."""
    ids = np.zeros((len(texts), max_length), np.int32)
    mask = np.zeros((len(texts), max_length), np.int32)
    for i, t in enumerate(texts):
        bs = [1 + (b % 120) for b in t.encode()][:max_length]
        ids[i, : len(bs)] = bs
        mask[i, : len(bs)] = 1
    return ids, mask


def _encoder(crop=5, **kw):
    cfg = LlamaConfig.tiny()
    params = init_llama(jax.random.key(0), cfg)
    tpl = {"template": "instruction: {}", "crop_start": crop}
    return LLMTextEncoder(
        params=params, cfg=cfg, tokenize_fn=_char_tokenize, max_length=16,
        hidden_state_skip_layer=2, prompt_template=tpl,
        prompt_template_video=tpl, dtype=jnp.float32, **kw,
    ), cfg, params


def test_template_applied_and_crop():
    enc, cfg, params = _encoder(crop=5)
    hidden, mask = enc(["a cat"], data_type="image")
    # tokenized to max_length + crop, then crop rows removed
    assert hidden.shape == (1, 16, cfg.d_model)
    assert mask.shape == (1, 16)

    # cropping is a pure slice of the full hidden states (causal model:
    # suffix states already condition on the template prefix)
    ids, m = enc.text2tokens(["a cat"], data_type="image")
    assert ids.shape[1] == 21
    full = llama_hidden_states(
        params, cfg, jnp.asarray(ids), jnp.asarray(m),
        hidden_state_skip_layer=2, dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(hidden), np.asarray(full[:, 5:]), rtol=1e-6
    )


def test_official_templates_contain_placeholder():
    for name, tpl in HUNYUAN_PROMPT_TEMPLATES.items():
        assert "{}" in tpl["template"], name
        assert tpl["crop_start"] > 0, name
    assert HUNYUAN_PROMPT_TEMPLATES["dit-llm-encode"]["crop_start"] == 36
    assert HUNYUAN_PROMPT_TEMPLATES["dit-llm-encode-video"]["crop_start"] == 95


def test_no_template_no_crop():
    enc, cfg, _ = _encoder()
    enc.prompt_template = None
    hidden, mask = enc(["hello"], data_type="image")
    assert hidden.shape == (1, 16, cfg.d_model)


def test_pipeline_encode_prompt_end_to_end():
    from mixgrpo_tpu.models.hunyuan.model import (
        HunyuanVideoConfig, init_hunyuan_video,
    )
    from mixgrpo_tpu.models.hunyuan.pipeline import HunyuanVideoPipeline

    enc, _, _ = _encoder(crop=3)
    hv_cfg = HunyuanVideoConfig.tiny()
    assert hv_cfg.text_states_dim == enc.cfg.d_model
    pipe = HunyuanVideoPipeline(
        hv_cfg, init_hunyuan_video(jax.random.key(1), hv_cfg),
        num_steps=2, dtype=jnp.float32, attn_impl="xla", text_encoder=enc,
    )
    txt, mask, pooled = pipe.encode_prompt(["a dog runs"], data_type="video")
    assert txt.shape[0] == 1 and txt.shape[2] == hv_cfg.text_states_dim
    assert pooled.shape == (1, hv_cfg.text_states_dim_2)
    lat = pipe(
        txt, pooled, video_length=5, height=16, width=16, text_mask=mask,
        rng=jax.random.key(2),
    )
    assert lat.shape[0] == 1
    assert np.isfinite(np.asarray(lat)).all()
