"""Mochi VAE decoder + diffusers-format loaders (DiT and VAE)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.mochi.model import (
    MochiConfig, init_mochi, mochi_forward,
)
from mixgrpo_tpu.models.mochi.vae import (
    MochiVAEConfig, init_mochi_vae_decoder, load_mochi_vae_decoder,
    mochi_vae_decode,
)


pytestmark = pytest.mark.slow


def test_mochi_vae_decode_shapes():
    cfg = MochiVAEConfig.tiny()
    params = init_mochi_vae_decoder(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 3, 4, 4, cfg.latent_channels))
    out = mochi_vae_decode(params, cfg, lat, dtype=jnp.float32)
    # time: 1 + (3-1)*6 = 13; space: 4*8 = 32
    assert out.shape == (1, 13, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_mochi_vae_single_frame():
    cfg = MochiVAEConfig.tiny()
    params = init_mochi_vae_decoder(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 1, 2, 2, cfg.latent_channels))
    out = mochi_vae_decode(params, cfg, lat, dtype=jnp.float32)
    assert out.shape == (1, 1, 16, 16, 3)


def test_mochi_vae_causality():
    """A perturbation of the last latent frame must not change early output
    frames (causal convs; per-frame group norm keeps stats frame-local)."""
    cfg = MochiVAEConfig.tiny()
    params = init_mochi_vae_decoder(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 3, 2, 2, cfg.latent_channels))
    y1 = np.asarray(mochi_vae_decode(params, cfg, lat, dtype=jnp.float32))
    y2 = np.asarray(
        mochi_vae_decode(params, cfg, lat.at[:, 2].add(5.0), dtype=jnp.float32)
    )
    # first latent frame decodes frames [0, 1+(2-1)*6) minus receptive
    # growth; frame 0 is safely early
    np.testing.assert_allclose(y1[:, 0], y2[:, 0], atol=1e-5)
    assert not np.allclose(y1[:, -1], y2[:, -1])


def test_mochi_vae_loader_round_trip(tmp_path):
    from safetensors.numpy import save_file

    cfg = MochiVAEConfig.tiny()
    params = init_mochi_vae_decoder(jax.random.key(0), cfg)

    st = {}

    def put_conv(name, p):
        w = np.asarray(p["w"])
        st[f"{name}.weight"] = np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2))
        st[f"{name}.bias"] = np.asarray(p["b"])

    def put_gn(name, p):
        st[f"{name}.weight"] = np.asarray(p["scale"])
        st[f"{name}.bias"] = np.asarray(p["bias"])

    def put_resnet(name, p):
        put_gn(f"{name}.norm1.norm_layer", p["norm1"])
        put_conv(f"{name}.conv1.conv", p["conv1"])
        put_gn(f"{name}.norm2.norm_layer", p["norm2"])
        put_conv(f"{name}.conv2.conv", p["conv2"])

    d = "decoder"
    put_conv(f"{d}.conv_in", params["conv_in"])
    put_conv(f"{d}.proj_out", params["proj_out"])
    for i, rp in enumerate(params["block_in"]):
        put_resnet(f"{d}.block_in.resnets.{i}", rp)
    for i, rp in enumerate(params["block_out"]):
        put_resnet(f"{d}.block_out.resnets.{i}", rp)
    for bi, blk in enumerate(params["up_blocks"]):
        for li, rp in enumerate(blk["resnets"]):
            put_resnet(f"{d}.up_blocks.{bi}.resnets.{li}", rp)
        st[f"{d}.up_blocks.{bi}.proj.weight"] = np.ascontiguousarray(
            np.asarray(blk["proj"]["w"]).T
        )
        st[f"{d}.up_blocks.{bi}.proj.bias"] = np.asarray(blk["proj"]["b"])

    save_file(st, str(tmp_path / "vae.safetensors"))
    loaded = load_mochi_vae_decoder(str(tmp_path / "vae.safetensors"), cfg)

    lat = jax.random.normal(jax.random.key(2), (1, 3, 2, 2, cfg.latent_channels))
    want = mochi_vae_decode(params, cfg, lat, dtype=jnp.float32)
    got = mochi_vae_decode(loaded, cfg, lat, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_mochi_dit_loader_round_trip():
    """Inverse-map our init to diffusers names, reload, identical forward."""
    from mixgrpo_tpu.models.mochi.load import load_mochi_hf

    cfg = MochiConfig.tiny()
    params = init_mochi(jax.random.key(0), cfg)

    st = {}

    def put_lin(name, p):
        st[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        if "b" in p:
            st[f"{name}.bias"] = np.asarray(p["b"])

    def put_block(prefix, p, last):
        put_lin(f"{prefix}.norm1.linear", p["mod_x"]["lin"])
        qkv = np.asarray(p["qkv"]["w"])  # (d, 3d)
        q, k, v = np.split(qkv, 3, axis=1)
        st[f"{prefix}.attn1.to_q.weight"] = np.ascontiguousarray(q.T)
        st[f"{prefix}.attn1.to_k.weight"] = np.ascontiguousarray(k.T)
        st[f"{prefix}.attn1.to_v.weight"] = np.ascontiguousarray(v.T)
        st[f"{prefix}.attn1.norm_q.weight"] = np.asarray(p["qnorm"])
        st[f"{prefix}.attn1.norm_k.weight"] = np.asarray(p["knorm"])
        kv = np.asarray(p["add_kv"]["w"])
        ck, cv = np.split(kv, 2, axis=1)
        st[f"{prefix}.attn1.add_k_proj.weight"] = np.ascontiguousarray(ck.T)
        st[f"{prefix}.attn1.add_v_proj.weight"] = np.ascontiguousarray(cv.T)
        st[f"{prefix}.attn1.norm_added_k.weight"] = np.asarray(p["add_knorm"])
        put_lin(f"{prefix}.attn1.to_out.0", p["attn_out"])
        put_lin(f"{prefix}.ff.net.0.proj", p["ff_in"])
        put_lin(f"{prefix}.ff.net.2", p["ff_out"])
        if last:
            put_lin(f"{prefix}.norm1_context.linear_1", p["mod_c"]["lin"])
        else:
            put_lin(f"{prefix}.norm1_context.linear", p["mod_c"]["lin"])
            put_lin(f"{prefix}.attn1.add_q_proj", p["add_q"])
            st[f"{prefix}.attn1.norm_added_q.weight"] = np.asarray(p["add_qnorm"])
            put_lin(f"{prefix}.attn1.to_add_out", p["attn_out_c"])
            put_lin(f"{prefix}.ff_context.net.0.proj", p["ff_c_in"])
            put_lin(f"{prefix}.ff_context.net.2", p["ff_c_out"])

    put_lin("patch_embed.proj", params["patch_embed"])
    put_lin("time_embed.timestep_embedder.linear_1", params["time_in"]["in"])
    put_lin("time_embed.timestep_embedder.linear_2", params["time_in"]["out"])
    for n in ("to_kv", "to_q", "to_out"):
        put_lin(f"time_embed.pooler.{n}", params["pooler"][n])
    put_lin("time_embed.caption_proj", params["caption_proj"])
    st["pos_frequencies"] = np.asarray(params["pos_frequencies"])
    put_lin("norm_out.linear", params["final_mod"]["lin"])
    put_lin("proj_out", params["proj_out"])
    n_body = cfg.num_layers - 1
    for i in range(n_body):
        bp = jax.tree.map(lambda x: np.asarray(x)[i], params["blocks"])
        put_block(f"transformer_blocks.{i}", bp, last=False)
    put_block(
        f"transformer_blocks.{cfg.num_layers - 1}", params["final_block"],
        last=True,
    )

    loaded = load_mochi_hf(st, cfg)

    z = jax.random.normal(jax.random.key(1), (1, 2, 4, 4, cfg.in_channels))
    txt = jax.random.normal(jax.random.key(2), (1, 6, cfg.text_embed_dim))
    mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]], np.int32))
    t = jnp.full((1,), 0.4)
    want = mochi_forward(params, cfg, z, txt, t, mask, dtype=jnp.float32,
                         remat=False)
    got = mochi_forward(loaded, cfg, z, txt, t, mask, dtype=jnp.float32,
                        remat=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_mochi_pipeline_emits_pixels():
    from mixgrpo_tpu.models.mochi.pipeline import MochiPipeline

    cfg = MochiConfig.tiny()
    vcfg = MochiVAEConfig.tiny()
    assert vcfg.latent_channels == cfg.in_channels
    params = init_mochi(jax.random.key(0), cfg)
    vae = init_mochi_vae_decoder(jax.random.key(1), vcfg)
    pipe = MochiPipeline(
        cfg, params, num_steps=2, guidance_scale=1.0, dtype=jnp.float32,
        vae_cfg=vcfg, vae_params=vae,
    )
    txt = jax.random.normal(jax.random.key(2), (1, 6, cfg.text_embed_dim))
    video = pipe(txt, num_frames=7, height=16, width=16, rng=jax.random.key(3))
    # latents: T = (7-1)/6+1 = 2 -> decoded 1+(2-1)*6 = 7 frames at 16x16
    assert video.shape == (1, 7, 16, 16, 3)
    assert float(jnp.min(video)) >= 0.0 and float(jnp.max(video)) <= 1.0
