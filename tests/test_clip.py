"""CLIP tower parity against transformers CLIPModel (random tiny weights).

This is the strongest offline correctness check available: build an HF
CLIPModel with a tiny config, export its state dict, load through our HF
mapper, and require feature-level agreement on both towers.
"""

import numpy as np
import pytest

from mixgrpo_tpu.models.text.clip import (
    CLIPConfig, CLIPTowerConfig, clip_image_features, clip_text_features,
    init_clip,
)
from mixgrpo_tpu.models.text.clip_load import load_clip_hf, load_clip_openclip


def _tiny_cfg():
    return CLIPConfig(
        embed_dim=16,
        vision=CLIPTowerConfig(width=32, layers=2, heads=2, patch=8, image_size=32),
        text=CLIPTowerConfig(width=32, layers=2, heads=2, vocab=64, context=16),
        quick_gelu=True,  # HF default act for CLIPConfig is quick_gelu
    )


@pytest.fixture(scope="module")
def hf_clip():
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel
    from transformers.models.clip import CLIPTextConfig, CLIPVisionConfig

    # real CLIP's EOT token is the max vocab id; align the tiny config so
    # HF's eos-position pooling matches our argmax-id pooling
    tcfg = CLIPTextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        hidden_act="quick_gelu", bos_token_id=62, eos_token_id=63,
    )
    vcfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        hidden_act="quick_gelu",
    )
    cfg = HFCLIPConfig(
        text_config=tcfg.to_dict(), vision_config=vcfg.to_dict(),
        projection_dim=16,
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


def test_image_features_match_hf(hf_clip):
    import torch

    cfg = _tiny_cfg()
    st = {k: v.numpy() for k, v in hf_clip.state_dict().items()}
    params = load_clip_hf(st, cfg)

    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        want = hf_clip.get_image_features(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)

    import jax.numpy as jnp

    got = np.asarray(clip_image_features(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_text_features_match_hf(hf_clip):
    import torch

    cfg = _tiny_cfg()
    st = {k: v.numpy() for k, v in hf_clip.state_dict().items()}
    params = load_clip_hf(st, cfg)

    rng = np.random.default_rng(1)
    # tokens ascending so argmax(ids) = true EOT position semantics hold;
    # put the max id (vocab-1 = EOT-like) at a known position
    ids = rng.integers(1, 40, size=(2, 16))
    ids[0, 5] = 63
    ids[1, 11] = 63

    with torch.no_grad():
        want = hf_clip.get_text_features(
            input_ids=torch.from_numpy(ids.astype(np.int64))
        ).numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)

    import jax.numpy as jnp

    got = np.asarray(clip_text_features(params, cfg, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_openclip_loader_roundtrip():
    """Synthesize an OpenCLIP-named state dict from our init and reload."""
    import jax

    cfg = _tiny_cfg()
    params = init_clip(jax.random.key(0), cfg)

    st = {}
    v = params["vision"]
    st["visual.conv1.weight"] = np.asarray(v["patch_embed"]["w"]).transpose(3, 2, 0, 1)
    st["visual.class_embedding"] = np.asarray(v["class_emb"])
    st["visual.positional_embedding"] = np.asarray(v["pos_emb"])
    st["visual.proj"] = np.asarray(v["proj"])
    for name, ln in (("visual.ln_pre", v["ln_pre"]), ("visual.ln_post", v["ln_post"])):
        st[f"{name}.weight"] = np.asarray(ln["scale"])
        st[f"{name}.bias"] = np.asarray(ln["bias"])
    t = params["text"]
    st["token_embedding.weight"] = np.asarray(t["token_emb"])
    st["positional_embedding"] = np.asarray(t["pos_emb"])
    st["text_projection"] = np.asarray(t["proj"])
    st["ln_final.weight"] = np.asarray(t["ln_final"]["scale"])
    st["ln_final.bias"] = np.asarray(t["ln_final"]["bias"])
    st["logit_scale"] = np.asarray(params["logit_scale"])

    def dump_blocks(prefix, blocks, n):
        for i in range(n):
            b = jax.tree.map(lambda x: np.asarray(x[i]), blocks)
            st[f"{prefix}.resblocks.{i}.attn.in_proj_weight"] = b["qkv"]["w"].T
            st[f"{prefix}.resblocks.{i}.attn.in_proj_bias"] = b["qkv"]["b"]
            st[f"{prefix}.resblocks.{i}.attn.out_proj.weight"] = b["out"]["w"].T
            st[f"{prefix}.resblocks.{i}.attn.out_proj.bias"] = b["out"]["b"]
            for ln in ("ln1", "ln2"):
                hf = {"ln1": "ln_1", "ln2": "ln_2"}[ln]
                st[f"{prefix}.resblocks.{i}.{hf}.weight"] = b[ln]["scale"]
                st[f"{prefix}.resblocks.{i}.{hf}.bias"] = b[ln]["bias"]
            st[f"{prefix}.resblocks.{i}.mlp.c_fc.weight"] = b["fc1"]["w"].T
            st[f"{prefix}.resblocks.{i}.mlp.c_fc.bias"] = b["fc1"]["b"]
            st[f"{prefix}.resblocks.{i}.mlp.c_proj.weight"] = b["fc2"]["w"].T
            st[f"{prefix}.resblocks.{i}.mlp.c_proj.bias"] = b["fc2"]["b"]

    dump_blocks("visual.transformer", v["blocks"], cfg.vision.layers)
    dump_blocks("transformer", t["blocks"], cfg.text.layers)

    reloaded = load_clip_openclip(st, cfg)
    for a, b in zip(jax.tree.leaves(reloaded), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
