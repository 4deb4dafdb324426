"""BLIP towers vs transformers BlipTextModel/BlipVisionModel (tiny random)."""

import numpy as np
import pytest

from mixgrpo_tpu.models.text.blip import (
    BlipTextConfig, BlipVisionConfig, blip_text_encode, blip_vision_encode,
    load_blip_text, load_blip_vision,
)


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def test_blip_text_matches_hf(torch):
    from transformers.models.blip.configuration_blip import BlipTextConfig as HFCfg
    from transformers.models.blip.modeling_blip_text import BlipTextModel

    # config.is_decoder=True materializes the crossattention layers (HF
    # port of BLIP med); bidirectional masking is selected at forward time
    # via the separate is_decoder=False argument, matching BLIP's
    # multimodal-encoder mode.
    hcfg = HFCfg(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=32,
        encoder_hidden_size=48, is_decoder=True,
    )
    torch.manual_seed(0)
    model = BlipTextModel(hcfg, add_pooling_layer=False).eval()
    st = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = BlipTextConfig(vocab=64, hidden=32, layers=2, heads=2,
                         intermediate=64, max_position=32, encoder_width=48)
    params = load_blip_text(st, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 64, size=(2, 7)).astype(np.int64)
    mask = np.ones((2, 7), np.int64)
    mask[1, 4:] = 0
    img = rng.normal(size=(2, 5, 48)).astype(np.float32)

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(img),
            is_decoder=False,
        ).last_hidden_state.numpy()

    import jax.numpy as jnp

    got = np.asarray(
        blip_text_encode(
            params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, bool),
            jnp.asarray(img), dtype=jnp.float32,
        )
    )
    # compare unmasked positions
    for b in range(2):
        n = int(mask[b].sum())
        np.testing.assert_allclose(got[b, :n], want[b, :n], rtol=1e-4, atol=1e-4)


def test_blip_vision_matches_hf(torch):
    from transformers.models.blip.configuration_blip import BlipVisionConfig as HFCfg
    from transformers.models.blip.modeling_blip import BlipVisionModel

    hcfg = HFCfg(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        layer_norm_eps=1e-5,
    )
    torch.manual_seed(1)
    model = BlipVisionModel(hcfg).eval()
    st = {k: v.numpy() for k, v in model.state_dict().items()}

    # adapt HF Blip vision names -> original BLIP/timm names
    adapted = {
        "patch_embed.proj.weight": st["embeddings.patch_embedding.weight"],
        "patch_embed.proj.bias": st["embeddings.patch_embedding.bias"],
        "cls_token": st["embeddings.class_embedding"],
        "pos_embed": st["embeddings.position_embedding"],
        "norm.weight": st["post_layernorm.weight"],
        "norm.bias": st["post_layernorm.bias"],
    }
    for i in range(2):
        s, d = f"encoder.layers.{i}", f"blocks.{i}"
        adapted[f"{d}.norm1.weight"] = st[f"{s}.layer_norm1.weight"]
        adapted[f"{d}.norm1.bias"] = st[f"{s}.layer_norm1.bias"]
        adapted[f"{d}.attn.qkv.weight"] = st[f"{s}.self_attn.qkv.weight"]
        adapted[f"{d}.attn.qkv.bias"] = st[f"{s}.self_attn.qkv.bias"]
        adapted[f"{d}.attn.proj.weight"] = st[f"{s}.self_attn.projection.weight"]
        adapted[f"{d}.attn.proj.bias"] = st[f"{s}.self_attn.projection.bias"]
        adapted[f"{d}.norm2.weight"] = st[f"{s}.layer_norm2.weight"]
        adapted[f"{d}.norm2.bias"] = st[f"{s}.layer_norm2.bias"]
        adapted[f"{d}.mlp.fc1.weight"] = st[f"{s}.mlp.fc1.weight"]
        adapted[f"{d}.mlp.fc1.bias"] = st[f"{s}.mlp.fc1.bias"]
        adapted[f"{d}.mlp.fc2.weight"] = st[f"{s}.mlp.fc2.weight"]
        adapted[f"{d}.mlp.fc2.bias"] = st[f"{s}.mlp.fc2.bias"]

    cfg = BlipVisionConfig(width=32, layers=2, heads=2, patch=8, image_size=32,
                           eps=1e-5)
    params = load_blip_vision(adapted, cfg)

    rng = np.random.default_rng(2)
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()

    import jax.numpy as jnp

    got = np.asarray(blip_vision_encode(params, cfg, jnp.asarray(imgs),
                                        dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_image_reward_scoring_pipeline():
    """End-to-end ImageReward scoring with tiny random towers."""
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.text.blip import init_blip_text, init_blip_vision
    from mixgrpo_tpu.rewards.image_reward import IR_MEAN, IR_STD, ImageRewardModel

    vcfg = BlipVisionConfig.tiny()
    tcfg = BlipTextConfig.tiny(encoder_width=vcfg.width)
    vp = init_blip_vision(jax.random.key(0), vcfg)
    tp = init_blip_text(jax.random.key(1), tcfg)
    rng = np.random.default_rng(3)
    dims = [(tcfg.hidden, 1024), (1024, 128), (128, 64), (64, 16), (16, 1)]
    mlp = {"layers": [
        {"w": jnp.asarray(rng.normal(size=d).astype(np.float32) * 0.05),
         "b": jnp.zeros((d[1],), jnp.float32)} for d in dims
    ]}
    model = ImageRewardModel(vp, vcfg, tp, tcfg, mlp, dtype=jnp.float32)

    imgs = rng.uniform(size=(2, 40, 48, 3)).astype(np.float32)
    ids = rng.integers(0, tcfg.vocab, size=(2, 10))
    mask = np.ones((2, 10))
    s = np.asarray(model.score(imgs, ids, mask))
    assert s.shape == (2,)
    assert np.isfinite(s).all()
    # different images -> different scores
    assert s[0] != s[1]
