"""Weight loader: synthetic HF-style checkpoints -> pytree round trip."""

import numpy as np
import jax
import pytest

from mixgrpo_tpu.models.flux.load import load_flux_params, load_vae_decoder_params
from mixgrpo_tpu.models.flux.model import FluxConfig, flux_forward, init_flux
from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder, vae_decode


def _synth_flux_state(cfg: FluxConfig, rng):
    """Random tensors with diffusers FluxTransformer2DModel names/shapes."""
    h, mh, hd = cfg.hidden_size, cfg.mlp_hidden, cfg.head_dim
    st = {}

    def lin(name, i, o, bias=True):
        st[f"{name}.weight"] = rng.normal(size=(o, i)).astype(np.float32) * 0.02
        if bias:
            st[f"{name}.bias"] = rng.normal(size=(o,)).astype(np.float32) * 0.02

    lin("x_embedder", cfg.in_channels, h)
    lin("context_embedder", cfg.context_dim, h)
    for emb in ("timestep_embedder", "guidance_embedder"):
        lin(f"time_text_embed.{emb}.linear_1", cfg.time_freq_dim, h)
        lin(f"time_text_embed.{emb}.linear_2", h, h)
    lin("time_text_embed.text_embedder.linear_1", cfg.pooled_dim, h)
    lin("time_text_embed.text_embedder.linear_2", h, h)
    lin("norm_out.linear", h, 2 * h)
    lin("proj_out", h, cfg.in_channels)

    for i in range(cfg.depth_double):
        b = f"transformer_blocks.{i}"
        lin(f"{b}.norm1.linear", h, 6 * h)
        lin(f"{b}.norm1_context.linear", h, 6 * h)
        for qkv in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            lin(f"{b}.attn.{qkv}", h, h)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            st[f"{b}.attn.{n}.weight"] = np.ones(hd, np.float32)
        lin(f"{b}.attn.to_out.0", h, h)
        lin(f"{b}.attn.to_add_out", h, h)
        lin(f"{b}.ff.net.0.proj", h, mh)
        lin(f"{b}.ff.net.2", mh, h)
        lin(f"{b}.ff_context.net.0.proj", h, mh)
        lin(f"{b}.ff_context.net.2", mh, h)

    for i in range(cfg.depth_single):
        b = f"single_transformer_blocks.{i}"
        lin(f"{b}.norm.linear", h, 3 * h)
        for qkv in ("to_q", "to_k", "to_v"):
            lin(f"{b}.attn.{qkv}", h, h)
        st[f"{b}.attn.norm_q.weight"] = np.ones(hd, np.float32)
        st[f"{b}.attn.norm_k.weight"] = np.ones(hd, np.float32)
        lin(f"{b}.proj_mlp", h, mh)
        lin(f"{b}.proj_out", h + mh, h)
    return st


def test_flux_loader_shapes_match_init(tmp_path, monkeypatch):
    cfg = FluxConfig.tiny()
    rng = np.random.default_rng(0)
    st = _synth_flux_state(cfg, rng)
    from safetensors.numpy import save_file

    f = tmp_path / "diffusion_pytorch_model.safetensors"
    save_file(st, str(f))

    params = load_flux_params(str(f), cfg)
    want = jax.eval_shape(lambda k: init_flux(k, cfg), jax.random.key(0))

    got_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    want_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(want)[0]
    }
    assert got_paths == want_paths


def test_flux_loader_transpose_semantics(tmp_path):
    """One-hot input through x_embedder must pick the HF weight column."""
    cfg = FluxConfig.tiny(depth_double=1, depth_single=1)
    rng = np.random.default_rng(1)
    st = _synth_flux_state(cfg, rng)
    from safetensors.numpy import save_file

    f = tmp_path / "w.safetensors"
    save_file(st, str(f))
    params = load_flux_params(str(f), cfg)

    w = st["x_embedder.weight"]  # (h, in)
    b = st["x_embedder.bias"]
    x = np.zeros((1, cfg.in_channels), np.float32)
    x[0, 3] = 1.0
    got = np.asarray(x @ np.asarray(params["x_embedder"]["w"]) + np.asarray(params["x_embedder"]["b"]))
    np.testing.assert_allclose(got[0], w[:, 3] + b, rtol=1e-6)


def test_flux_loader_forward_runs(tmp_path):
    import jax.numpy as jnp
    from mixgrpo_tpu.models.flux import make_image_ids, make_text_ids, rope_tables

    cfg = FluxConfig.tiny()
    st = _synth_flux_state(cfg, np.random.default_rng(2))
    from safetensors.numpy import save_file

    f = tmp_path / "w.safetensors"
    save_file(st, str(f))
    params = load_flux_params(str(f), cfg)

    ids = np.concatenate([make_text_ids(4), make_image_ids(8, 8)])
    cos, sin = rope_tables(ids, cfg.axes_dims)
    out = flux_forward(
        params, cfg,
        jnp.ones((1, 16, cfg.in_channels)), jnp.ones((1, 4, cfg.context_dim)),
        jnp.ones((1, cfg.pooled_dim)), jnp.full((1,), 0.5), jnp.full((1,), 3.5),
        cos, sin, dtype=jnp.float32, attn_impl="xla",
    )
    assert np.isfinite(np.asarray(out)).all()


def _synth_vae_state(cfg: VAEConfig, rng):
    st = {}

    def conv(name, cin, cout, k=3):
        st[f"{name}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
        st[f"{name}.bias"] = np.zeros(cout, np.float32)

    def gn(name, c):
        st[f"{name}.weight"] = np.ones(c, np.float32)
        st[f"{name}.bias"] = np.zeros(c, np.float32)

    def resnet(name, cin, cout):
        gn(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        gn(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, k=1)

    top = cfg.block_out_channels[-1]
    conv("decoder.conv_in", cfg.latent_channels, top)
    resnet("decoder.mid_block.resnets.0", top, top)
    resnet("decoder.mid_block.resnets.1", top, top)
    a = "decoder.mid_block.attentions.0"
    gn(f"{a}.group_norm", top)
    for n in ("to_q", "to_k", "to_v", "to_out.0"):
        st[f"{a}.{n}.weight"] = rng.normal(size=(top, top)).astype(np.float32) * 0.02
        st[f"{a}.{n}.bias"] = np.zeros(top, np.float32)
    cin = top
    rev = list(reversed(cfg.block_out_channels))
    for bi, cout in enumerate(rev):
        for li in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{bi}.resnets.{li}", cin, cout)
            cin = cout
        if bi < len(rev) - 1:
            conv(f"decoder.up_blocks.{bi}.upsamplers.0.conv", cout, cout)
    gn("decoder.conv_norm_out", cfg.block_out_channels[0])
    conv("decoder.conv_out", cfg.block_out_channels[0], cfg.out_channels)
    return st


def test_vae_loader_matches_init(tmp_path):
    import jax.numpy as jnp

    cfg = VAEConfig.tiny()
    st = _synth_vae_state(cfg, np.random.default_rng(3))
    from safetensors.numpy import save_file

    f = tmp_path / "vae.safetensors"
    save_file(st, str(f))
    params = load_vae_decoder_params(str(f), cfg)

    want = jax.eval_shape(lambda k: init_vae_decoder(k, cfg), jax.random.key(0))
    got_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    want_paths = {
        jax.tree_util.keystr(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(want)[0]
    }
    assert got_paths == want_paths

    img = vae_decode(params, cfg, jnp.ones((1, 4, 4, cfg.latent_channels)), dtype=jnp.float32)
    assert np.isfinite(np.asarray(img)).all()
