"""Rewards: preprocessing, tokenizer, scoring formulas, aggregation, HTTP."""

import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.models.text.clip import CLIPConfig, CLIPTowerConfig, init_clip
from mixgrpo_tpu.rewards.base import compute_reward
from mixgrpo_tpu.rewards.clip_family import (
    CLIPScoreReward, HPSReward, PickScoreReward, _ClipRewardBase,
)
from mixgrpo_tpu.rewards.preprocess import CLIP_MEAN, CLIP_STD, clip_preprocess
from mixgrpo_tpu.rewards.tokenizer import CLIPTokenizer
from mixgrpo_tpu.rewards.unified_reward import (
    UnifiedReward, extract_alignment_score, extract_final_score,
)


def _tiny_cfg():
    return CLIPConfig(
        embed_dim=16,
        vision=CLIPTowerConfig(width=32, layers=2, heads=2, patch=8, image_size=32),
        text=CLIPTowerConfig(width=32, layers=2, heads=2, vocab=64, context=16),
    )


def test_preprocess_shapes_and_stats():
    imgs = jnp.ones((2, 64, 48, 3)) * 0.5
    out = clip_preprocess(imgs, 32)
    assert out.shape == (2, 32, 32, 3)
    want = (0.5 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], want, rtol=1e-5)


def test_preprocess_center_crop_landscape_portrait():
    # gradient along width: center crop must grab the middle columns
    img = jnp.broadcast_to(jnp.linspace(0, 1, 96)[None, None, :, None], (1, 32, 96, 3))
    out = clip_preprocess(img, 32)
    # middle of the gradient ~0.5 after normalization inversion
    mid = np.asarray(out)[0, :, 16, 0] * CLIP_STD[0] + CLIP_MEAN[0]
    np.testing.assert_allclose(mid, 0.5, atol=0.02)


@pytest.fixture()
def tiny_tokenizer(tmp_path):
    """Synthetic BPE merges covering a few words."""
    merges = ["#version: 0.2", "h e", "he l", "hel lo</w>", "w o", "wo rld</w>"]
    p = tmp_path / "merges.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))
    return CLIPTokenizer(str(p), context_length=12)


def test_tokenizer_bpe_merges(tiny_tokenizer):
    tok = tiny_tokenizer
    ids = tok(["hello world"])
    assert ids.shape == (1, 12)
    assert ids[0, 0] == tok.sot
    # "hello" fully merged into one token, "world" into "wo"+"rld</w>"... or
    # as merged by the synthetic table; at minimum: ends with EOT, then pad
    nonzero = ids[0][ids[0] != 0]
    assert nonzero[-1] == tok.eot
    # deterministic + case/whitespace insensitive
    np.testing.assert_array_equal(tok(["  HELLO   world "]), ids)


def test_tokenizer_truncation(tiny_tokenizer):
    tok = tiny_tokenizer
    long_text = "hello " * 50
    ids = tok([long_text])
    assert ids.shape == (1, 12)
    assert ids[0, -1] == tok.eot


def test_clip_reward_formulas():
    """PickScore applies exp(logit_scale) and (s-18)/8; cosine otherwise."""
    cfg = _tiny_cfg()
    params = init_clip(jax.random.key(0), cfg)
    imgs = jax.random.uniform(jax.random.key(1), (2, 40, 40, 3))
    ids = np.zeros((2, 16), np.int32)
    ids[:, 0] = 10
    ids[:, 1] = 63

    base = _ClipRewardBase(params, cfg, dtype=jnp.float32)
    cos = np.asarray(base.score(imgs, ids))
    assert cos.shape == (2,)
    assert (np.abs(cos) <= 1.0 + 1e-5).all()

    class _Pick(_ClipRewardBase):
        mean, std, use_logit_scale = 18.0, 8.0, True

    pick = _Pick(params, cfg, dtype=jnp.float32)
    got = np.asarray(pick.score(imgs, ids))
    scale = np.exp(float(params["logit_scale"]))
    np.testing.assert_allclose(got, (cos * scale - 18.0) / 8.0, rtol=1e-4)


def test_compute_reward_contract():
    class Fake:
        def __init__(self, name, vals):
            self.name, self.vals = name, vals

        def __call__(self, images, prompts):
            return list(self.vals), [1.0] * len(self.vals)

    models = {"a": Fake("a", [1.0, 2.0]), "b": Fake("b", [10.0, 20.0])}
    r, s, rd, sd = compute_reward(None, ["x", "y"], models, {"a": 1.0, "b": 0.5})
    assert r == [6.0, 12.0]
    assert s == [1.0, 1.0]
    assert rd["a"] == [1.0, 2.0] and sd["b"] == [1.0, 1.0]


def test_unified_reward_parsers():
    assert extract_final_score("blah\nFinal Score: 2.33") == 2.33
    assert extract_final_score("no score here") is None
    assert extract_alignment_score("Alignment Score (1-5): 4") == 4.0
    assert extract_alignment_score("Alignment Score (1-5): x") is None


class _FakeResponse:
    def __init__(self, content):
        self._c = content

    def raise_for_status(self):
        pass

    def json(self):
        return {"choices": [{"message": {"content": self._c}}]}


class _FakeSession:
    def __init__(self, outputs, fail_first=0):
        self.outputs = outputs
        self.fail_first = fail_first
        self.calls = 0
        self.payloads = []

    def post(self, url, json=None, timeout=None):
        self.calls += 1
        self.payloads.append(json)
        if self.calls <= self.fail_first:
            raise RuntimeError("boom")
        return _FakeResponse(self.outputs.pop(0))


def test_unified_reward_end_to_end_fake_http():
    sess = _FakeSession(["Final Score: 4.5", "garbage"])
    ur = UnifiedReward("http://fake", num_workers=1, session=sess)
    imgs = [np.full((8, 8, 3), 0.5, np.float32)] * 2
    scores, ok = ur(imgs, "a cat")
    assert scores == [4.5, None]
    assert ok == [True, False]
    # payload shape: question text + base64 PNG data url
    msg = sess.payloads[0]["messages"][0]["content"]
    assert msg[0]["type"] == "text" and "Final Score:" in msg[0]["text"]
    assert msg[1]["image_url"]["url"].startswith("data:image/png;base64,")


def test_unified_reward_retries_then_succeeds(monkeypatch):
    import mixgrpo_tpu.rewards.unified_reward as urmod

    monkeypatch.setattr(urmod.time, "sleep", lambda s: None)
    sess = _FakeSession(["Final Score: 3"], fail_first=2)
    ur = UnifiedReward("http://fake", num_workers=1, session=sess)
    scores, ok = ur([np.zeros((4, 4, 3), np.float32)], ["p"])
    assert scores == [3.0] and ok == [True]
    assert sess.calls == 3


def test_reward_loader_classes_exist():
    # constructors are exercised with real checkpoints at deploy time;
    # here just assert the registry surface matches the reference zoo
    assert HPSReward.name == "hpsv2"
    assert PickScoreReward.name == "pick_score"
    assert CLIPScoreReward.name == "clip_score"


# ---------------------------------------------------------------------------
# checkpoint-config introspection (VERDICT r2 #5: build CLIP towers from the
# checkpoint's own config like the reference's create_model_from_pretrained,
# clip_score.py:39 — not a hard-coded vit_h_14)
# ---------------------------------------------------------------------------


def test_clip_config_from_openclip_json():
    from mixgrpo_tpu.models.text.clip_load import clip_config_from_json

    cfg = clip_config_from_json({
        "model_cfg": {
            "embed_dim": 1024,
            "quick_gelu": True,
            "vision_cfg": {"image_size": 384, "layers": 32, "width": 1280,
                           "head_width": 80, "patch_size": 14},
            "text_cfg": {"context_length": 77, "vocab_size": 49408,
                         "width": 1024, "heads": 16, "layers": 24},
        },
        "preprocess_cfg": {"mean": [0.48145466, 0.4578275, 0.40821073]},
    })
    assert cfg.quick_gelu is True  # the DFN5B trap
    assert cfg.embed_dim == 1024
    assert cfg.vision.image_size == 384
    assert cfg.vision.heads == 16  # 1280 / head_width 80
    assert cfg.vision.layers == 32
    assert cfg.text.context == 77


def test_clip_config_from_hf_json():
    from mixgrpo_tpu.models.text.clip_load import clip_config_from_json

    cfg = clip_config_from_json({
        "projection_dim": 1024,
        "vision_config": {"hidden_size": 1280, "num_hidden_layers": 32,
                          "num_attention_heads": 16, "image_size": 224,
                          "patch_size": 14, "hidden_act": "gelu"},
        "text_config": {"hidden_size": 1024, "num_hidden_layers": 24,
                        "num_attention_heads": 16, "vocab_size": 49408,
                        "max_position_embeddings": 77, "hidden_act": "gelu"},
    })
    assert cfg.quick_gelu is False
    assert cfg.vision.width == 1280
    assert cfg.text.layers == 24

    quick = clip_config_from_json({
        "projection_dim": 512,
        "vision_config": {"hidden_size": 64, "num_hidden_layers": 2,
                          "num_attention_heads": 2, "hidden_act": "quick_gelu"},
        "text_config": {"hidden_size": 64, "num_hidden_layers": 2,
                        "num_attention_heads": 2},
    })
    assert quick.quick_gelu is True


def test_clip_config_from_checkpoint_dir(tmp_path):
    import json

    from mixgrpo_tpu.models.text.clip import CLIPConfig
    from mixgrpo_tpu.models.text.clip_load import clip_config_from_checkpoint

    with open(tmp_path / "open_clip_config.json", "w") as f:
        json.dump({
            "model_cfg": {
                "embed_dim": 16, "quick_gelu": True,
                "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                               "head_width": 16, "patch_size": 8},
                "text_cfg": {"context_length": 16, "vocab_size": 64,
                             "width": 32, "heads": 2, "layers": 2},
            },
        }, f)
    ckpt = tmp_path / "open_clip_pytorch_model.bin"
    ckpt.touch()
    # config found next to a weight *file*
    cfg = clip_config_from_checkpoint(str(ckpt))
    assert cfg.quick_gelu and cfg.vision.image_size == 32
    # explicit image_size overrides the config's
    cfg2 = clip_config_from_checkpoint(str(tmp_path), image_size=48)
    assert cfg2.vision.image_size == 48

    # no config anywhere -> warned fallback
    import warnings

    empty = tmp_path / "empty"
    empty.mkdir()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg3 = clip_config_from_checkpoint(str(empty / "x.pt"))
    assert cfg3 == CLIPConfig.vit_h_14(image_size=224)
    assert any("assuming" in str(x.message) for x in w)


def test_clip_score_reward_builds_from_introspected_config(tmp_path):
    """End-to-end: a quickgelu open_clip checkpoint dir -> CLIPScoreReward
    with the right tower geometry and activation."""
    import json

    import jax

    from mixgrpo_tpu.models.text.clip import (
        CLIPConfig, CLIPTowerConfig, init_clip,
    )

    cfg = CLIPConfig(
        embed_dim=16,
        vision=CLIPTowerConfig(width=32, layers=2, heads=2, patch=8,
                               image_size=32),
        text=CLIPTowerConfig(width=32, layers=2, heads=2, vocab=64, context=16),
        quick_gelu=True,
    )
    params = init_clip(jax.random.key(0), cfg)

    st = {}
    v, t = params["vision"], params["text"]
    st["visual.conv1.weight"] = np.asarray(
        v["patch_embed"]["w"]).transpose(3, 2, 0, 1)
    st["visual.class_embedding"] = np.asarray(v["class_emb"])
    st["visual.positional_embedding"] = np.asarray(v["pos_emb"])
    st["visual.ln_pre.weight"] = np.asarray(v["ln_pre"]["scale"])
    st["visual.ln_pre.bias"] = np.asarray(v["ln_pre"]["bias"])
    st["visual.ln_post.weight"] = np.asarray(v["ln_post"]["scale"])
    st["visual.ln_post.bias"] = np.asarray(v["ln_post"]["bias"])
    st["visual.proj"] = np.asarray(v["proj"])
    st["token_embedding.weight"] = np.asarray(t["token_emb"])
    st["positional_embedding"] = np.asarray(t["pos_emb"])
    st["text_projection"] = np.asarray(t["proj"])
    st["ln_final.weight"] = np.asarray(t["ln_final"]["scale"])
    st["ln_final.bias"] = np.asarray(t["ln_final"]["bias"])
    st["logit_scale"] = np.asarray(params["logit_scale"])

    def dump(prefix, blocks, n):
        for i in range(n):
            b = jax.tree.map(lambda x: np.asarray(x[i]), blocks)
            p = f"{prefix}.resblocks.{i}"
            st[f"{p}.attn.in_proj_weight"] = b["qkv"]["w"].T
            st[f"{p}.attn.in_proj_bias"] = b["qkv"]["b"]
            st[f"{p}.attn.out_proj.weight"] = b["out"]["w"].T
            st[f"{p}.attn.out_proj.bias"] = b["out"]["b"]
            st[f"{p}.ln_1.weight"] = b["ln1"]["scale"]
            st[f"{p}.ln_1.bias"] = b["ln1"]["bias"]
            st[f"{p}.ln_2.weight"] = b["ln2"]["scale"]
            st[f"{p}.ln_2.bias"] = b["ln2"]["bias"]
            st[f"{p}.mlp.c_fc.weight"] = b["fc1"]["w"].T
            st[f"{p}.mlp.c_fc.bias"] = b["fc1"]["b"]
            st[f"{p}.mlp.c_proj.weight"] = b["fc2"]["w"].T
            st[f"{p}.mlp.c_proj.bias"] = b["fc2"]["b"]

    dump("visual.transformer", v["blocks"], cfg.vision.layers)
    dump("transformer", t["blocks"], cfg.text.layers)

    from safetensors.numpy import save_file

    save_file({k: np.ascontiguousarray(x) for k, x in st.items()},
              tmp_path / "open_clip_model.safetensors")
    with open(tmp_path / "open_clip_config.json", "w") as f:
        json.dump({
            "model_cfg": {
                "embed_dim": 16, "quick_gelu": True,
                "vision_cfg": {"image_size": 32, "layers": 2, "width": 32,
                               "head_width": 16, "patch_size": 8},
                "text_cfg": {"context_length": 16, "vocab_size": 64,
                             "width": 32, "heads": 2, "layers": 2},
            },
        }, f)

    r = CLIPScoreReward.from_checkpoint(
        str(tmp_path / "open_clip_model.safetensors"), dtype=jnp.float32
    )
    assert r.cfg.quick_gelu is True
    assert r.cfg.vision.image_size == 32
    imgs = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 32, 32, 3)),
                       jnp.float32)
    ids = np.zeros((2, 16), np.int32)
    s = np.asarray(r.score(imgs, ids))
    assert s.shape == (2,) and np.isfinite(s).all()
