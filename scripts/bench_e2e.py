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
line.  Run: ``python scripts/bench_e2e.py [--quant int8]``.

Phases run independently (``--phases rollout,vae,reward,update``) and a
phase whose remote compile fails is reported as null rather than killing
the run — the tunnel's compile service intermittently drops very large
programs, and the persistent compile cache makes re-runs incremental.
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
REWARD_B = 4         # ViT-H scoring batch (B=4 is the shape the compile
                     # service has handled; B=2 reproducibly breaks it)
RECIPE_GROUP = 12    # the recipe's num_generations
STEPS = 25
WINDOW = (10, 14)
HEIGHT = 512
TEXT_LEN = 512
PAIRS = 4            # (sample, timestep) pairs per fused update microbatch
RECIPE_PAIRS = 48    # 12 samples x window 4


def main():
    global HEIGHT, GROUP
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="none", choices=["none", "int8"])
    ap.add_argument("--height", type=int, default=HEIGHT,
                    help="image size (512 default; 720 = the recipe shape)")
    ap.add_argument("--phases", default="rollout,vae,reward,update",
                    help="comma list: rollout,vae,reward,update")
    ap.add_argument("--update_vd", default="19,38",
                    help="virtual depth (double,single) for the update "
                         "phase.  Default = FULL depth: with the (1,2) "
                         "weight stack the cycle counts divide the stack "
                         "depths, so flux_forward uses nested scans (no "
                         "per-step weight gather) and the rematerialized "
                         "full-depth backward compiles — the round-2 "
                         "crash was the modular gather inside the grad "
                         "scan (PERF.md)")
    ap.add_argument("--pairs", type=int, default=PAIRS,
                    help="(sample,timestep) pairs per fused update "
                         "microbatch — the MFU lever: more rows amortize "
                         "optimizer + per-block overhead")
    ap.add_argument("--remat", default="dots",
                    choices=["dots", "full", "none"],
                    help="update-phase checkpoint policy: dots = keep "
                         "profitable dot results, full = recompute "
                         "everything, none = no remat (slice depths only)")
    ap.add_argument("--group", type=int, default=GROUP,
                    help="generations per rollout program (B).  B=2 "
                         "measured faster per image than B=1 (133 vs 141 "
                         "ms/fwd @512px); larger B probes whether the "
                         "trend continues before the compile service or "
                         "HBM gives out")
    args = ap.parse_args()
    HEIGHT = args.height
    GROUP = args.group
    # "none": run the update at the model's REAL (2,4) depth with no
    # weight-cycling — the cycling gather inside the rematerialized
    # backward is what overwhelms the compile helper — and compose.
    upd_vd = (
        None if args.update_vd == "none"
        else tuple(int(x) for x in args.update_vd.split(","))
    )
    phases = set(args.phases.split(","))

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
    # stack (1,2): both full-depth cycle counts (19, 38) divide the stack
    # depths -> nested-scan weight cycling in rollout AND update (the
    # differentiable path).  Per-application compute and HBM weight
    # streaming are identical to the earlier (2,4) stack.
    cfg = FluxConfig(in_channels=64, hidden_size=3072, num_heads=24,
                     depth_double=1, depth_single=2, pooled_dim=768,
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

    timings = {}
    failures = {}
    out = None

    def phase(name, fn):
        if name not in phases:
            return None
        t_label = time.strftime("%H:%M:%S")
        print(f"[{t_label}] phase {name}...", file=sys.stderr, flush=True)
        try:
            dt = fn()
            timings[name] = dt
            return dt
        except Exception as e:  # remote-compile service drop, OOM, ...
            failures[name] = f"{type(e).__name__}: {e}"[:200]
            print(f"[{name}] FAILED: {failures[name]}",
                  file=sys.stderr, flush=True)
            return None

    # ---- rollout (warm + timed)
    def run_rollout():
        nonlocal out
        o = sampler.rollout(rollout_params, z0, txt, pooled, sigmas, det,
                            STEPS, jax.random.key(2))
        float(o.final_latents.sum())
        out = o
        t0 = time.time()
        o = sampler.rollout(rollout_params, z0, txt, pooled, sigmas, det,
                            STEPS, jax.random.key(2))
        float(o.final_latents.sum())
        out = o
        return time.time() - t0

    phase("rollout", run_rollout)
    if out is None:  # rollout skipped/failed: synthesize shapes for later phases
        S_img = sampler.num_image_tokens
        lat = jax.random.normal(key, (GROUP, S_img, 64), jnp.float32)

        class _O:
            final_latents = lat
            all_latents = jnp.broadcast_to(
                lat[:, None], (GROUP, STEPS + 1, S_img, 64))
            all_log_probs = jnp.zeros((GROUP, STEPS), jnp.float32)

        out = _O()

    # ---- VAE decode at full size
    def run_vae():
        vae_cfg = VAEConfig.flux_dev()
        vae_params = jax.jit(lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_vae_decoder(k, vae_cfg))
        )(jax.random.key(3))

        @jax.jit
        def decode(vae_params, latents_packed):
            lat = unpack_latents(latents_packed, HEIGHT, HEIGHT)
            return vae_decode(vae_params, vae_cfg, denormalize_latents(lat),
                              dtype=jnp.bfloat16)

        img = decode(vae_params, out.final_latents)
        float(img.sum())
        t0 = time.time()
        img = decode(vae_params, out.final_latents)
        float(img.sum())
        return time.time() - t0

    phase("vae", run_vae)

    # ---- reward scoring compute (ViT-H/14 image tower at 224px)
    def run_reward():
        ccfg = CLIPConfig.vit_h_14()
        cparams = jax.jit(lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_clip(k, ccfg)))(jax.random.key(4))
        images = jax.random.uniform(
            jax.random.key(6), (REWARD_B, HEIGHT, HEIGHT, 3), jnp.float32)

        # cparams MUST be a jit argument: closed-over, the 630M-param
        # tower is embedded in the program as constants and the ~1.3 GB
        # remote-compile upload breaks the tunnel pipe deterministically
        @jax.jit
        def score(cparams, images):
            x = jax.image.resize(images, (REWARD_B, 224, 224, 3), "bilinear")
            return clip_image_features(cparams, ccfg, x, dtype=jnp.bfloat16)

        f = score(cparams, images)
        float(f.sum())
        t0 = time.time()
        f = score(cparams, images)
        float(f.sum())
        return time.time() - t0

    phase("reward", run_reward)

    # ---- PPO update: one fused PAIRS-row fwd+bwd + apply
    pairs = args.pairs
    remat = {"dots": "dots", "full": True, "none": False}[args.remat]

    def run_update():
        opt = make_optimizer(learning_rate=1e-5)
        opt_state = opt.init(params)
        update_step, _, _ = make_update_fns(
            cfg, scfg, PPOConfig(clip_range=1e-4, adv_clip_max=5.0), opt,
            sampler.rope_cos, sampler.rope_sin, remat=remat,
            virtual_depth=upd_vd,
        )
        # pairs (sample, timestep) rows drawn from the GROUP rollouts
        s_idx = np.arange(pairs) % GROUP
        t_idx = WINDOW[0] + (np.arange(pairs) // GROUP) % (WINDOW[1] - WINDOW[0])
        batch = UpdateBatch(
            latents=out.all_latents[s_idx, t_idx],
            next_latents=out.all_latents[s_idx, t_idx + 1],
            t_index=jnp.asarray(t_idx, jnp.int32),
            old_log_probs=out.all_log_probs[s_idx, t_idx],
            advantages=jnp.ones((pairs,), jnp.float32),
            txt=txt[s_idx], pooled=pooled[s_idx],
        )
        sig_dev = jnp.asarray(sigmas, jnp.float32)
        p2, o2, m = update_step(params, opt_state, batch, sig_dev)
        float(m["loss"])
        t0 = time.time()
        p2, o2, m = update_step(p2, o2, batch, sig_dev)
        float(m["loss"])
        return time.time() - t0

    phase("update", run_update)

    t_rollout = timings.get("rollout")
    t_vae = timings.get("vae")
    t_reward = timings.get("reward")
    t_update = timings.get("update")
    # Per-block-application cost is uniform across block types (per-token
    # matmul params 113.25M double vs 113.3M single — bench.py flops
    # model), so full-depth update = measured x 57/(dd+ds).  The same
    # scaling applied to the forward *underestimates* the measured
    # full-depth MFU (75% measured vs 70% at the slice), so this compose
    # is conservative.
    upd_blocks = (
        cfg.depth_double + cfg.depth_single if upd_vd is None
        else upd_vd[0] + upd_vd[1]
    )
    t_update_full = (
        None if t_update is None else t_update * (19 + 38) / upd_blocks
    )
    recipe_s = None
    if None not in (t_rollout, t_vae, t_reward, t_update_full):
        recipe_s = (
            t_rollout * (RECIPE_GROUP / GROUP)
            + t_vae * (RECIPE_GROUP / GROUP)
            + t_reward * (RECIPE_GROUP / REWARD_B)
            + t_update_full * (RECIPE_PAIRS / pairs)
        )
    rnd = lambda v, p: None if v is None else round(v, p)
    print(json.dumps({
        "metric": (
            f"grpo_iteration_seconds_per_chip_{HEIGHT}px_fluxdev_fulldepth"
        ),
        "quant": args.quant,
        f"rollout_s_group{GROUP}": rnd(t_rollout, 2),
        f"vae_decode_s_x{GROUP}": rnd(t_vae, 3),
        f"reward_vith_s_x{REWARD_B}": rnd(t_reward, 3),
        f"update_s_{pairs}pairs": rnd(t_update, 2),
        "update_vd": list(upd_vd) if upd_vd else
                     f"real-depth-({cfg.depth_double},{cfg.depth_single})",
        "update_remat": args.remat,
        f"update_s_{pairs}pairs_fulldepth_composed": rnd(t_update_full, 2),
        "recipe_iteration_s": rnd(recipe_s, 1),
        "failed_phases": failures or None,
        "recipe": "G=12, 25 steps, window 4, 48-pair update — composed from"
                  " measured phases (rollout/VAE x6, reward x3, update x12)",
    }))


if __name__ == "__main__":
    main()
