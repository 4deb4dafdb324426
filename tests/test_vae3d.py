"""Causal 3D VAE decoder: shapes, causality, first-frame temporal handling."""

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.hunyuan.vae3d import (
    CausalVAEConfig,
    causal_vae_decode,
    init_causal_vae_decoder,
)


def test_decode_shapes():
    cfg = CausalVAEConfig.tiny()
    params = init_causal_vae_decoder(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 3, 4, 4, cfg.latent_channels))
    out = causal_vae_decode(params, cfg, lat, dtype=jnp.float32)
    # time: 1 + (3-1)*4 = 9; space: 4*8 = 32
    assert out.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_single_frame_decode():
    """T=1 (image mode) stays a single frame."""
    cfg = CausalVAEConfig.tiny()
    params = init_causal_vae_decoder(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 1, 4, 4, cfg.latent_channels))
    out = causal_vae_decode(params, cfg, lat, dtype=jnp.float32)
    assert out.shape == (1, 1, 32, 32, 3)


def test_causal_conv_strict_causality():
    """The causal conv itself: frame t output depends only on frames <= t."""
    from mixgrpo_tpu.models.hunyuan.vae3d import _causal_conv3d, _conv3d_init

    p = _conv3d_init(jax.random.key(0), 3, 4, 4)
    x = jax.random.normal(jax.random.key(1), (1, 5, 4, 4, 4))
    y1 = np.asarray(_causal_conv3d(p, x))
    y2 = np.asarray(_causal_conv3d(p, x.at[:, 4].add(10.0)))
    np.testing.assert_allclose(y1[:, :4], y2[:, :4], atol=1e-6)
    assert not np.allclose(y1[:, 4], y2[:, 4])


def test_decoder_mostly_causal():
    """Full decoder: convs are causal but GroupNorm statistics span time
    (true of the reference too — nn.GroupNorm over (C, T, H, W)); a late
    perturbation must affect late frames far more than early ones."""
    cfg = CausalVAEConfig.tiny()
    params = init_causal_vae_decoder(jax.random.key(0), cfg)
    lat = jax.random.normal(jax.random.key(1), (1, 4, 4, 4, cfg.latent_channels))
    out1 = np.asarray(causal_vae_decode(params, cfg, lat, dtype=jnp.float32))
    lat2 = lat.at[:, 3].add(5.0)  # perturb the LAST latent frame
    out2 = np.asarray(causal_vae_decode(params, cfg, lat2, dtype=jnp.float32))
    d_first = np.abs(out1[:, 0] - out2[:, 0]).mean()
    d_last = np.abs(out1[:, -1] - out2[:, -1]).mean()
    # GroupNorm's global statistics spread the perturbation everywhere
    # (matching the reference); the causal convs still make late frames
    # strictly more affected than the first
    assert d_last > 1.05 * d_first
