"""HunyuanVideo DiT checkpoint loader: export -> load round trip.

The reference loads released weights with a strict state-dict match
(fastvideo/utils/load.py:229-249); here the synthetic round trip proves
every parameter of the official layout lands in the pytree (and back)
bit-exactly, and that a loaded model computes the same forward.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.models.hunyuan.load import (
    convert_hunyuan_state_dict,
    export_hunyuan_state_dict,
    infer_hunyuan_config,
    load_hunyuan_video,
    resolve_checkpoint_path,
)
from mixgrpo_tpu.models.hunyuan.model import (
    HunyuanVideoConfig, hunyuan_video_forward, init_hunyuan_video,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)
    return cfg, params


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_round_trip_exact(tiny):
    cfg, params = tiny
    sd = export_hunyuan_state_dict(params, cfg)
    loaded, _ = convert_hunyuan_state_dict(sd, cfg)
    _tree_equal(params, loaded)


def test_config_inference(tiny):
    cfg, params = tiny
    sd = export_hunyuan_state_dict(params, cfg)
    got = infer_hunyuan_config(sd)
    assert got.hidden_size == cfg.hidden_size
    assert got.num_heads == cfg.num_heads
    assert got.in_channels == cfg.in_channels
    assert got.patch_size == cfg.patch_size
    assert got.depth_double == cfg.depth_double
    assert got.depth_single == cfg.depth_single
    assert got.refiner_depth == cfg.refiner_depth
    assert got.text_states_dim == cfg.text_states_dim
    assert got.text_states_dim_2 == cfg.text_states_dim_2
    assert got.guidance_embed == cfg.guidance_embed
    assert got.time_freq_dim == cfg.time_freq_dim
    assert sum(got.rope_dim_list) == cfg.head_dim


def test_state_dict_name_inventory(tiny):
    """Every name the official HYVideoDiffusionTransformer owns appears
    (spot-checked against modules/models.py, token_refiner.py)."""
    cfg, params = tiny
    sd = export_hunyuan_state_dict(params, cfg)
    for k in [
        "img_in.proj.weight",
        "txt_in.input_embedder.weight",
        "txt_in.t_embedder.mlp.0.weight",
        "txt_in.c_embedder.linear_1.weight",
        "txt_in.individual_token_refiner.blocks.0.self_attn_qkv.weight",
        "txt_in.individual_token_refiner.blocks.0.adaLN_modulation.1.weight",
        "time_in.mlp.2.bias",
        "vector_in.in_layer.weight",
        "vector_in.out_layer.bias",
        "guidance_in.mlp.0.weight",
        "double_blocks.0.img_mod.linear.weight",
        "double_blocks.0.img_attn_qkv.weight",
        "double_blocks.0.img_attn_q_norm.weight",
        "double_blocks.0.txt_mlp.fc2.bias",
        f"single_blocks.{cfg.depth_single - 1}.linear1.weight",
        "single_blocks.0.modulation.linear.weight",
        "single_blocks.0.q_norm.weight",
        "final_layer.linear.weight",
        "final_layer.adaLN_modulation.1.bias",
    ]:
        assert k in sd, k
    # conv layout: (h, C, pt, ph, pw)
    assert sd["img_in.proj.weight"].shape == (
        cfg.hidden_size, cfg.in_channels, *cfg.patch_size
    )


def test_torch_checkpoint_file_and_dir(tiny, tmp_path):
    torch = pytest.importorskip("torch")
    cfg, params = tiny
    sd = export_hunyuan_state_dict(params, cfg)
    tsd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    # nested-"module" file inside a directory (the released layout:
    # inference.py:174-234 resolves pytorch_model_module.pt)
    ckdir = tmp_path / "transformer"
    os.makedirs(ckdir)
    torch.save({"module": tsd}, ckdir / "pytorch_model_module.pt")
    assert resolve_checkpoint_path(str(ckdir)).endswith("pytorch_model_module.pt")
    loaded, got_cfg = load_hunyuan_video(str(ckdir), cfg)
    _tree_equal(params, loaded)
    assert got_cfg == cfg

    # flat single-file checkpoint
    f = tmp_path / "mp_rank_00_model_states.pt"
    torch.save(tsd, f)
    loaded2, _ = load_hunyuan_video(str(f), cfg)
    _tree_equal(params, loaded2)


def test_loaded_forward_matches(tiny):
    cfg, params = tiny
    sd = export_hunyuan_state_dict(params, cfg)
    loaded, _ = convert_hunyuan_state_dict(sd, cfg)

    key = jax.random.key(1)
    z = jax.random.normal(key, (1, 2, 8, 8, cfg.in_channels))
    txt = jax.random.normal(key, (1, 6, cfg.text_states_dim))
    pooled = jax.random.normal(key, (1, cfg.text_states_dim_2))
    mask = jnp.ones((1, 6), jnp.int32)
    t = jnp.full((1,), 0.5)
    g = jnp.full((1,), 6.0)
    want = hunyuan_video_forward(
        params, cfg, z, txt, pooled, t, g, text_mask=mask,
        dtype=jnp.float32, remat=False,
    )
    got = hunyuan_video_forward(
        loaded, cfg, z, txt, pooled, t, g, text_mask=mask,
        dtype=jnp.float32, remat=False,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_registry_exposes_loader():
    from mixgrpo_tpu.models.registry import get_model

    entry = get_model("hunyuan_video")
    from mixgrpo_tpu.models.hunyuan.load import load_hunyuan_video as f

    assert entry.load is f
