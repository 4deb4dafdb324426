"""T5 encoder parity against transformers T5EncoderModel (tiny random)."""

import numpy as np
import pytest

from mixgrpo_tpu.models.text.t5 import T5Config, init_t5, load_t5_hf, t5_encode


@pytest.fixture(scope="module")
def hf_t5():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    cfg = HFT5Config(
        vocab_size=128, d_model=32, d_kv=16, d_ff=64, num_layers=2,
        num_heads=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        dropout_rate=0.0, use_cache=False,
    )
    torch.manual_seed(0)
    return T5EncoderModel(cfg).eval()


def _our_cfg():
    return T5Config.tiny()


def test_t5_matches_hf(hf_t5):
    import jax.numpy as jnp
    import torch

    cfg = _our_cfg()
    st = {k: v.numpy() for k, v in hf_t5.state_dict().items()}
    params = load_t5_hf(st, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 10)).astype(np.int64)
    with torch.no_grad():
        want = hf_t5(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()

    got = np.asarray(
        t5_encode(params, cfg, jnp.asarray(ids, jnp.int32), dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_t5_attention_mask_matches_hf(hf_t5):
    import jax.numpy as jnp
    import torch

    cfg = _our_cfg()
    st = {k: v.numpy() for k, v in hf_t5.state_dict().items()}
    params = load_t5_hf(st, cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, size=(2, 8)).astype(np.int64)
    mask = np.ones((2, 8), np.int64)
    mask[0, 5:] = 0
    mask[1, 3:] = 0
    with torch.no_grad():
        want = hf_t5(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    got = np.asarray(
        t5_encode(
            params, cfg, jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, bool), dtype=jnp.float32,
        )
    )
    # compare only unmasked positions (masked outputs are unspecified)
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], want[b, :n], rtol=1e-4, atol=1e-4)


def test_t5_init_shapes():
    import jax

    cfg = _our_cfg()
    params = init_t5(jax.random.key(0), cfg)
    out = t5_encode(
        params, cfg, np.zeros((1, 6), np.int32) + 3, dtype=np.float32
    )
    assert out.shape == (1, 6, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()
