"""GRPO training in LoRA mode: base frozen, adapters move, resume works."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_train_app import _brightness_reward, _make_cache, _make_cfg
from mixgrpo_tpu.data.dataset import LatentDataset, PromptLoader
from mixgrpo_tpu.models.flux.model import FluxConfig
from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder
from mixgrpo_tpu.train import GRPOTrainer


pytestmark = pytest.mark.slow


def test_lora_training_moves_adapters_only(tmp_path):
    cfg = _make_cfg(tmp_path, steps=2)
    flux_cfg = FluxConfig.tiny()
    vae_cfg = VAEConfig.tiny(latent_channels=flux_cfg.in_channels // 4)
    vae_params = init_vae_decoder(jax.random.key(5), vae_cfg)
    trainer = GRPOTrainer(
        cfg, flux_cfg=flux_cfg, vae_cfg=vae_cfg, vae_params=vae_params,
        reward_fn=_brightness_reward, text_len=8,
        attn_impl="xla", dtype=jnp.float32,
        use_lora=True, lora_rank=2, lora_alpha=4.0,
    )
    trainer.reward_weights = {"synthetic": 1.0}
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)

    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
    factors_before = jax.tree.map(
        lambda x: np.asarray(x).copy(), trainer.lora_factors
    )
    trainer.train(loader)

    # base params untouched
    for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(base_before)):
        np.testing.assert_array_equal(np.asarray(a), b)
    # adapter B factors moved (A grads are zero on the first step only)
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(
            jax.tree.leaves(trainer.lora_factors), jax.tree.leaves(factors_before)
        )
    )
    assert moved
    assert trainer.global_step == 2

    # resume restores adapters
    cfg2 = _make_cfg(tmp_path, steps=2)
    cfg2.run.resume_from_checkpoint = "latest"
    trainer2 = GRPOTrainer(
        cfg2, flux_cfg=flux_cfg, vae_cfg=vae_cfg, vae_params=vae_params,
        reward_fn=_brightness_reward, text_len=8,
        attn_impl="xla", dtype=jnp.float32,
        use_lora=True, lora_rank=2, lora_alpha=4.0,
    )
    assert trainer2.global_step == 2
    for a, b in zip(
        jax.tree.leaves(trainer2.lora_factors), jax.tree.leaves(trainer.lora_factors)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
