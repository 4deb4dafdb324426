"""Ulysses SP attention == dense attention; full FLUX forward under SP."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mixgrpo_tpu.models.flux import (
    FluxConfig, flux_forward, init_flux, make_image_ids, make_text_ids,
    rope_tables,
)
from mixgrpo_tpu.ops.attention import _xla_attention
from mixgrpo_tpu.parallel import MeshConfig, make_mesh, shard_params
from mixgrpo_tpu.parallel.ulysses import set_sp_context, ulysses_attention


pytestmark = pytest.mark.slow


def test_ulysses_matches_dense():
    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, sp=4, tp=1))
    B, H, S, D = 2, 8, 32, 16
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks)
    want = _xla_attention(q, k, v)

    spec = NamedSharding(mesh, P(None, None, "sp", None))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    got = jax.jit(lambda a, b, c: ulysses_attention(a, b, c, mesh))(qs, ks_, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ulysses_gradients_match_dense():
    mesh = make_mesh(MeshConfig(dp=4, fsdp=1, sp=2, tp=1))
    B, H, S, D = 1, 4, 16, 8
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks)

    g_dense = jax.grad(lambda q, k, v: jnp.sum(_xla_attention(q, k, v) ** 2),
                       argnums=(0, 1, 2))(q, k, v)
    g_sp = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ulysses_attention(q, k, v, mesh) ** 2),
        argnums=(0, 1, 2),
    ))(q, k, v)
    for a, b in zip(g_sp, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)


def test_flux_forward_under_sp_matches_dense():
    """Full MMDiT forward with impl='ulysses' and seq-sharded tokens."""
    cfg = FluxConfig.tiny()  # 4 heads, sp=2 -> 2 local heads
    params = init_flux(jax.random.key(0), cfg)
    B, lh, lw, lt = 2, 8, 8, 4  # joint seq = 4 + 16 = 20 ... needs % sp
    lt = 4
    # joint seq = lt + 16 = 20; sp=2 divides 20
    key = jax.random.key(1)
    img = jax.random.normal(key, (B, 16, cfg.in_channels))
    txt = jax.random.normal(key, (B, lt, cfg.context_dim))
    pooled = jax.random.normal(key, (B, cfg.pooled_dim))
    t = jnp.full((B,), 0.5)
    g = jnp.full((B,), 3.5)
    ids = np.concatenate([make_text_ids(lt), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)

    want = flux_forward(params, cfg, img, txt, pooled, t, g, cos, sin,
                        dtype=jnp.float32, attn_impl="xla")

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, sp=2, tp=1))
    set_sp_context(mesh, "sp")
    try:
        sharded = shard_params(params, mesh)

        @jax.jit
        def fwd(p, img, txt, pooled, t, g):
            return flux_forward(p, cfg, img, txt, pooled, t, g, cos, sin,
                                dtype=jnp.float32, attn_impl="ulysses")

        got = fwd(sharded, img, txt, pooled, t, g)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )
    finally:
        set_sp_context(None)


def test_grpo_trainer_under_sequence_parallelism(tmp_path):
    """Full GRPO iteration with sp=2 Ulysses attention end-to-end."""
    import jax.numpy as jnp

    from tests.test_train_app import _brightness_reward, _make_cache, _make_cfg
    from mixgrpo_tpu.data.dataset import LatentDataset, PromptLoader
    from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder
    from mixgrpo_tpu.train import GRPOTrainer

    cfg = _make_cfg(tmp_path, steps=1)
    cfg.mesh = MeshConfig(dp=2, fsdp=2, sp=2, tp=1)
    flux_cfg = FluxConfig.tiny()
    vae_cfg = VAEConfig.tiny(latent_channels=flux_cfg.in_channels // 4)
    vae_params = init_vae_decoder(jax.random.key(5), vae_cfg)
    trainer = GRPOTrainer(
        cfg, flux_cfg=flux_cfg, vae_cfg=vae_cfg, vae_params=vae_params,
        reward_fn=_brightness_reward, text_len=8,
        attn_impl="ulysses", dtype=jnp.float32,
    )
    trainer.reward_weights = {"synthetic": 1.0}
    set_sp_context(trainer.mesh, "sp")
    try:
        _make_cache(tmp_path, cfg, flux_cfg)
        loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)
        trainer.train(loader)
        assert trainer.global_step == 1
    finally:
        set_sp_context(None)


def test_ulysses_masked_matches_dense():
    """Key-side mask sharded alongside K/V (VERDICT r1 item 8): sp=2 masked
    attention must match dense masked attention."""
    mesh = make_mesh(MeshConfig(dp=4, fsdp=1, sp=2, tp=1))
    B, H, S, D = 2, 4, 24, 8
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, (B, H, S, D)) for kk in ks)
    # padded-text style mask: last tokens invalid, different per batch row
    mask = np.ones((B, S), bool)
    mask[0, 18:] = False
    mask[1, 10:] = False
    mask = jnp.asarray(mask)

    want = _xla_attention(q, k, v, mask=mask[:, None, None, :])
    got = jax.jit(
        lambda a, b, c, m: ulysses_attention(a, b, c, mesh, mask=m)
    )(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # gradients through the masked SP path
    g_dense = jax.grad(
        lambda q, k, v: jnp.sum(_xla_attention(q, k, v, mask=mask[:, None, None, :]) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_sp = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ulysses_attention(q, k, v, mesh, mask=mask) ** 2),
        argnums=(0, 1, 2),
    ))(q, k, v)
    for a, b in zip(g_sp, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)


def test_hunyuan_padded_text_under_sp_matches_dense():
    """HunyuanVideo with padded text (the reference's only live SP consumer,
    modeling_hunyuan.py:142-190) runs under sp=2 and matches dense."""
    from mixgrpo_tpu.models.hunyuan.model import (
        HunyuanVideoConfig, hunyuan_video_forward, init_hunyuan_video,
    )

    cfg = HunyuanVideoConfig.tiny()
    params = init_hunyuan_video(jax.random.key(0), cfg)
    B, T_, Hh, W_ = 1, 2, 4, 4
    lt = 6  # joint seq = 6 + 2*2*2 = 14, divisible by sp=2
    key = jax.random.key(1)
    x = jax.random.normal(key, (B, T_, Hh, W_, cfg.in_channels))
    txt = jax.random.normal(key, (B, lt, cfg.text_states_dim))
    pooled = jax.random.normal(key, (B, cfg.text_states_dim_2))
    t = jnp.full((B,), 0.5)
    guid = jnp.full((B,), 1.0) if cfg.guidance_embed else None
    text_mask = jnp.asarray(np.array([[1, 1, 1, 1, 0, 0]], np.int32))

    want = hunyuan_video_forward(
        params, cfg, x, txt, pooled, t, guidance=guid, text_mask=text_mask,
        attn_impl="xla", dtype=jnp.float32, remat=False,
    )

    mesh = make_mesh(MeshConfig(dp=2, fsdp=2, sp=2, tp=1))
    set_sp_context(mesh, "sp")
    try:
        got = jax.jit(
            lambda p, x, txt, pooled, t, m: hunyuan_video_forward(
                p, cfg, x, txt, pooled, t, guidance=guid, text_mask=m,
                attn_impl="ulysses", dtype=jnp.float32, remat=False,
            )
        )(shard_params(params, mesh), x, txt, pooled, t, text_mask)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
        )
    finally:
        set_sp_context(None)
