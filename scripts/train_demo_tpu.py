"""On-hardware GRPO training demo: the full MixGRPO loop on the real TPU.

The CPU learning-signal validation (scripts/validate_learning.py) proves
the rollout -> group-advantage -> clipped-PPO mechanism optimizes its
reward; this script proves the same loop *on the chip* — bf16 params,
Pallas flash attention, full FLUX width (hidden 3072, 24 heads x 128) at
512px with a reduced block count so the fp32-master AdamW state fits one
v5e (~15.75 GB HBM; see PERF.md memory bounds), against a synthetic
brightness reward computed from the decoded VAE images.

Mirrors the reference recipe shape (zqqqqz2000/MixGRPO
fastvideo/train_grpo_flux.py:184-316 rollout->reward->advantage->update)
at small step count.  Run: python scripts/train_demo_tpu.py
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--tmp", default="/tmp/train_demo_tpu")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--steps", type=int, default=8, help="rollout steps")
    ap.add_argument("--attn", default="pallas", choices=["pallas", "xla"])
    args = ap.parse_args()

    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mixgrpo_tpu.config import (
        DataConfig, GRPOConfig, OptimConfig, RunConfig, TrainConfig,
        WindowConfig,
    )
    from mixgrpo_tpu.data.dataset import (
        EmbeddingCacheWriter, LatentDataset, PromptLoader,
    )
    from mixgrpo_tpu.models.flux.model import FluxConfig
    from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder
    from mixgrpo_tpu.parallel.mesh import MeshConfig
    from mixgrpo_tpu.train import GRPOTrainer

    platform = jax.devices()[0].platform
    # Full FLUX width; depth (1, 2) keeps fp32 master + AdamW moments
    # (~12 bytes/param) plus the bf16 rollout copy inside one v5e.
    flux_cfg = FluxConfig(in_channels=64, hidden_size=3072, num_heads=24,
                          depth_double=1, depth_single=2, pooled_dim=768,
                          context_dim=4096)
    vae_cfg = VAEConfig.flux_dev()
    vae_params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_vae_decoder(k, vae_cfg))
    )(jax.random.key(5))

    cfg = TrainConfig(
        data=DataConfig(data_json_path=f"{args.tmp}/cache", train_batch_size=1),
        optim=OptimConfig(max_train_steps=args.iters,
                          gradient_accumulation_steps=4,
                          learning_rate=args.lr, gradient_checkpointing=True),
        grpo=GRPOConfig(h=512, w=512, sampling_steps=args.steps,
                        num_generations=4, use_group=True,
                        init_same_noise=True, training_strategy="part",
                        advantage_rerange_strategy="balance",
                        clip_range=0.2, eta=0.7, seed=714, sampler_seed=7144),
        window=WindowConfig(iters_per_group=4, group_size=3, roll_back=True),
        run=RunConfig(output_dir=f"{args.tmp}/out",
                      checkpointing_steps=10_000),
        mesh=MeshConfig(dp=1, fsdp=1, sp=1, tp=1),
    )
    cfg.reward.reward_model = "multi_reward"

    def brightness(images01, captions):
        r = np.asarray(images01, np.float64).mean(axis=(1, 2, 3))
        return {"synthetic": r}, {"synthetic": np.ones_like(r)}

    trainer = GRPOTrainer(
        cfg, flux_cfg=flux_cfg, vae_cfg=vae_cfg, vae_params=vae_params,
        reward_fn=brightness, text_len=512, attn_impl=args.attn,
        dtype=jnp.bfloat16,
    )
    trainer.reward_weights = {"synthetic": 1.0}

    import os

    if not os.path.exists(f"{args.tmp}/cache/manifest.json"):
        w = EmbeddingCacheWriter(f"{args.tmp}/cache")
        rng = np.random.default_rng(0)
        for i in range(4):
            w.add(rng.normal(size=(512, flux_cfg.context_dim)).astype(np.float32),
                  rng.normal(size=(flux_cfg.pooled_dim,)).astype(np.float32),
                  f"p{i}")
        w.finish()
    loader = iter(PromptLoader(LatentDataset(f"{args.tmp}/cache"), 1, seed=0))

    rewards, times = [], []
    for it in range(args.iters):
        ts = trainer.window.get_current_timesteps()
        trainer.window.update_iteration(rng=cfg.grpo.seed + trainer.global_step)
        t0 = time.time()
        m = trainer.train_one_step(next(loader), ts)
        dt = time.time() - t0
        trainer.global_step += 1
        rewards.append(float(m["reward"]))
        times.append(dt)
        print(f"iter {it}: reward={m['reward']:.5f} "
              f"grad_norm={m.get('grad_norm', float('nan')):.4f} {dt:.1f}s",
              flush=True)

    k = max(args.iters // 4, 1)
    print(json.dumps({
        "platform": platform,
        "attn": args.attn,
        "iters": args.iters,
        "reward_first_k": round(float(np.mean(rewards[:k])), 5),
        "reward_last_k": round(float(np.mean(rewards[-k:])), 5),
        "improvement": round(float(np.mean(rewards[-k:]) - np.mean(rewards[:k])), 5),
        "steady_iter_seconds": round(float(np.median(times[2:])), 2)
        if len(times) > 2 else None,
    }))


if __name__ == "__main__":
    main()
