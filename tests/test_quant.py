"""Int8 rollout quantization (ops/quant.py): numerics + trainer wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.models.flux import layers as L
from mixgrpo_tpu.models.flux.model import FluxConfig, flux_forward, init_flux
from mixgrpo_tpu.models.flux.rope import make_image_ids, make_text_ids, rope_tables
from mixgrpo_tpu.ops.quant import (
    qlinear, quantize_flux_params, quantize_linear_params, quantize_weight,
)


def test_quantize_weight_roundtrip():
    w = jax.random.normal(jax.random.key(0), (64, 96)) * 0.07
    w_q, w_s = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and w_s.shape == (1, 96)
    err = np.abs(np.asarray(w_q, np.float32) * np.asarray(w_s) - np.asarray(w))
    # symmetric per-channel: error bounded by half a quantization step
    assert float(err.max()) <= float(np.abs(np.asarray(w)).max()) / 127.0 * 0.51


def test_qlinear_close_to_linear():
    k1, k2 = jax.random.split(jax.random.key(1))
    p = {"w": jax.random.normal(k1, (256, 512)) * 0.05,
         "b": jax.random.normal(k2, (512,)) * 0.01}
    x = jax.random.normal(jax.random.key(2), (4, 32, 256))
    y = L.linear(p, x, jnp.float32)
    yq = qlinear(quantize_linear_params(p), x, jnp.float32)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.02, rel


def test_linear_dispatches_on_quantized_params():
    p = {"w": jax.random.normal(jax.random.key(3), (32, 48)) * 0.1}
    x = jax.random.normal(jax.random.key(4), (2, 8, 32))
    pq = quantize_linear_params(p)
    assert "w_q" in pq
    np.testing.assert_allclose(
        np.asarray(L.linear(pq, x, jnp.float32)),
        np.asarray(qlinear(pq, x, jnp.float32)),
    )


def test_quantized_flux_forward_close():
    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    qparams = jax.jit(quantize_flux_params)(params)
    # stacked block weights quantize with per-layer scales
    assert qparams["double"]["img_qkv"]["w_q"].dtype == jnp.int8
    assert qparams["double"]["img_qkv"]["w_s"].shape == (cfg.depth_double, 1, 3 * cfg.hidden_size)

    lh = lw = 8
    ids = np.concatenate([make_text_ids(6), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)
    img = jax.random.normal(jax.random.key(1), (2, (lh // 2) * (lw // 2), cfg.in_channels))
    txt = jax.random.normal(jax.random.key(2), (2, 6, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, cfg.pooled_dim))
    t = jnp.full((2,), 0.5)
    g = jnp.full((2,), 3.5)

    args = (cfg, img, txt, pooled, t, g, cos, sin)
    y = flux_forward(params, *args, dtype=jnp.float32, attn_impl="xla", remat=False)
    yq = flux_forward(qparams, *args, dtype=jnp.float32, attn_impl="xla", remat=False)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.05, rel
    cos_sim = float(
        jnp.vdot(y, yq) / (jnp.linalg.norm(y) * jnp.linalg.norm(yq))
    )
    assert cos_sim > 0.995, cos_sim


@pytest.mark.slow
def test_trainer_int8_rollout_smoke(tmp_path):
    from tests.test_train_app import _build_trainer, _make_cache, _make_cfg

    cfg = _make_cfg(tmp_path, steps=1)
    cfg.grpo.rollout_quant = "int8"
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    from mixgrpo_tpu.data.dataset import LatentDataset, PromptLoader

    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)
    trainer.train(loader)
    import glob
    import json

    mfiles = glob.glob(f"{trainer.run_dir}/*metrics.jsonl")
    assert mfiles, "no metrics logged"
    m = json.loads(open(mfiles[0]).readlines()[-1])
    assert np.isfinite(m["loss"]) and np.isfinite(m["reward"])
