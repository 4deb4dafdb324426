"""Llama hidden-state encoder parity vs transformers (synthetic weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.models.text.llama import (
    LlamaConfig, init_llama, llama_hidden_states, load_llama_hf,
)

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _hf_tiny():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, rms_norm_eps=1e-5, attention_bias=False,
        mlp_bias=False, tie_word_embeddings=False, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    return transformers.LlamaModel(cfg).eval()


@pytest.fixture(scope="module")
def setup():
    hf = _hf_tiny()
    cfg = LlamaConfig.tiny()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = load_llama_hf(state, cfg)
    ids = np.array(
        [[5, 17, 99, 3, 42, 0, 0, 0], [8, 1, 2, 3, 4, 5, 6, 7]], np.int64
    )
    mask = np.array(
        [[1, 1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 1]], np.int64
    )
    return hf, cfg, params, ids, mask


def test_last_hidden_state_matches_hf(setup):
    hf, cfg, params, ids, mask = setup
    with torch.no_grad():
        want = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    got = np.asarray(
        llama_hidden_states(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask), dtype=jnp.float32
        )
    )
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)


def test_skip_layer_matches_hf_hidden_states(setup):
    """hidden_state_skip_layer=2 == HF hidden_states[-3]
    (HunyuanVideo's LLM read point, text_encoder/__init__.py:303-307)."""
    hf, cfg, params, ids, mask = setup
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask),
            output_hidden_states=True,
        )
    want = out.hidden_states[-3].numpy()
    got = np.asarray(
        llama_hidden_states(
            params, cfg, jnp.asarray(ids), jnp.asarray(mask),
            hidden_state_skip_layer=2, dtype=jnp.float32,
        )
    )
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(got[valid], want[valid], rtol=2e-4, atol=2e-4)


def test_init_shapes_jit():
    cfg = LlamaConfig.tiny()
    params = init_llama(jax.random.key(0), cfg)
    ids = jnp.zeros((1, 6), jnp.int32)
    out = jax.jit(
        lambda p, i: llama_hidden_states(p, cfg, i, dtype=jnp.float32)
    )(params, ids)
    assert out.shape == (1, 6, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()
