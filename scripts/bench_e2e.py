"""Full-depth end-to-end GRPO iteration benchmark on one real TPU chip.

Measures every phase of a MixGRPO iteration at FLUX-dev full width AND
full depth (19 double + 38 single block applications, executed on-chip by
weight-cycling — see flux_forward ``virtual_depth``), 512px, 25 steps,
window size 4, exactly the reference per-rank workload shape
(fastvideo/train_grpo_flux.py:184-329 rollout, :536-615 update):

  - rollout: generation group in one jitted scan, SDE inside the window;
  - VAE decode at full FLUX VAE size;
  - reward scoring with a full ViT-H/14 CLIP tower (random weights — the
    compute, not the score, is what is being timed);
  - PPO update: one fused fwd+bwd accumulation group + optimizer apply.

Composes the measured phases into seconds/iteration for the recipe's
num_generations=12, 48-pair update, grad-accum 3, and prints one JSON
line.  Run: ``timeout 590 python scripts/bench_e2e.py [--quant int8]``.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

GROUP = 2            # generations measured per rollout program (kept small:
                     # the 25-step x 57-block rollout is the largest program
                     # the remote compile service handles; B scales linearly
                     # past B=1 anyway — PERF.md batched-forward row)
RECIPE_GROUP = 12    # the recipe's num_generations
STEPS = 25
WINDOW = (10, 14)
HEIGHT = 512
TEXT_LEN = 512
PAIRS = 4            # (sample, timestep) pairs per fused update microbatch
RECIPE_PAIRS = 48    # 12 samples x window 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="none", choices=["none", "int8"])
    args = ap.parse_args()

    import bench  # repo-root bench.py: compile cache + timing conventions

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
    from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder, vae_decode
    from mixgrpo_tpu.models.flux.latents import denormalize_latents, unpack_latents
    from mixgrpo_tpu.models.text.clip import CLIPConfig, init_clip, clip_image_features
    from mixgrpo_tpu.rl.ppo import PPOConfig
    from mixgrpo_tpu.sampler import FluxSampler
    from mixgrpo_tpu.solvers.rollout import SamplerConfig
    from mixgrpo_tpu.trainer import UpdateBatch, make_optimizer, make_update_fns

    VD = (19, 38)
    cfg = FluxConfig(in_channels=64, hidden_size=3072, num_heads=24,
                     depth_double=2, depth_single=4, pooled_dim=768,
                     context_dim=4096)
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_flux(k, cfg)))(jax.random.key(0))
    scfg = SamplerConfig(num_steps_max=STEPS, eta=0.7)
    sampler = FluxSampler(cfg, scfg, height=HEIGHT, width=HEIGHT,
                          text_len=TEXT_LEN, virtual_depth=VD)
    rollout_params = params
    if args.quant == "int8":
        from mixgrpo_tpu.ops.quant import quantize_flux_params

        rollout_params = jax.jit(quantize_flux_params)(params)

    key = jax.random.key(1)
    txt = jax.random.normal(key, (GROUP, TEXT_LEN, 4096), jnp.bfloat16)
    pooled = jax.random.normal(key, (GROUP, 768), jnp.bfloat16)
    z0 = sampler.init_noise(key, GROUP, same_noise_groups=GROUP)
    sigmas = np.linspace(1.0, 0.0, STEPS + 1) * 3 / (1 + 2 * np.linspace(1.0, 0.0, STEPS + 1))
    det = np.ones(STEPS, bool)
    det[WINDOW[0]:WINDOW[1]] = False

    def run_rollout():
        out = sampler.rollout(rollout_params, z0, txt, pooled, sigmas, det,
                              STEPS, jax.random.key(2))
        return out

    out = run_rollout()  # compile + warm
    float(out.final_latents.sum())
    t0 = time.time()
    out = run_rollout()
    float(out.final_latents.sum())
    t_rollout = time.time() - t0

    # ---- VAE decode at full size
    vae_cfg = VAEConfig.flux_dev()
    vae_params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_vae_decoder(k, vae_cfg))
    )(jax.random.key(3))

    @jax.jit
    def decode(latents_packed):
        lat = unpack_latents(latents_packed, HEIGHT, HEIGHT)
        return vae_decode(vae_params, vae_cfg, denormalize_latents(lat),
                          dtype=jnp.bfloat16)

    img = decode(out.final_latents)
    float(img.sum())
    t0 = time.time()
    img = decode(out.final_latents)
    float(img.sum())
    t_vae = time.time() - t0

    # ---- reward scoring compute (ViT-H/14 image tower at 224px)
    ccfg = CLIPConfig.vit_h_14()
    cparams = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_clip(k, ccfg)))(jax.random.key(4))

    @jax.jit
    def score(images):
        x = jax.image.resize(images, (GROUP, 224, 224, 3), "bilinear")
        return clip_image_features(cparams, ccfg, x, dtype=jnp.bfloat16)

    f = score(img)
    float(f.sum())
    t0 = time.time()
    f = score(img)
    float(f.sum())
    t_reward = time.time() - t0

    # ---- PPO update: one fused PAIRS-row fwd+bwd + apply
    opt = make_optimizer(learning_rate=1e-5)
    opt_state = opt.init(params)
    update_step, _, _ = make_update_fns(
        cfg, scfg, PPOConfig(clip_range=1e-4, adv_clip_max=5.0), opt,
        sampler.rope_cos, sampler.rope_sin, remat="dots", virtual_depth=VD,
    )
    # PAIRS (sample, timestep) rows drawn from the GROUP rollouts
    s_idx = np.arange(PAIRS) % GROUP
    t_idx = WINDOW[0] + (np.arange(PAIRS) // GROUP) % (WINDOW[1] - WINDOW[0])
    batch = UpdateBatch(
        latents=out.all_latents[s_idx, t_idx],
        next_latents=out.all_latents[s_idx, t_idx + 1],
        t_index=jnp.asarray(t_idx, jnp.int32),
        old_log_probs=out.all_log_probs[s_idx, t_idx],
        advantages=jnp.ones((PAIRS,), jnp.float32),
        txt=txt[s_idx], pooled=pooled[s_idx],
    )
    sig_dev = jnp.asarray(sigmas, jnp.float32)
    p2, o2, m = update_step(params, opt_state, batch, sig_dev)
    float(m["loss"])
    t0 = time.time()
    p2, o2, m = update_step(p2, o2, batch, sig_dev)
    float(m["loss"])
    t_update = time.time() - t0

    recipe_s = (
        t_rollout * (RECIPE_GROUP / GROUP)
        + t_vae * (RECIPE_GROUP / GROUP)
        + t_reward * (RECIPE_GROUP / GROUP)
        + t_update * (RECIPE_PAIRS / PAIRS)
    )
    print(json.dumps({
        "metric": "grpo_iteration_seconds_per_chip_512px_fluxdev_fulldepth",
        "quant": args.quant,
        "rollout_s_group4": round(t_rollout, 2),
        "vae_decode_s_x4": round(t_vae, 3),
        "reward_vith_s_x4": round(t_reward, 3),
        "update_s_4pairs": round(t_update, 2),
        "recipe_iteration_s": round(recipe_s, 1),
        "recipe": "G=12, 25 steps, window 4, 48-pair update — composed from"
                  " measured phases (rollout/VAE/reward x3, update x12)",
    }))


if __name__ == "__main__":
    main()
