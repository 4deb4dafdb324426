"""TPU wall-clock comparison: DanceGRPO vs MixGRPO vs MixGRPO-Flash.

The paper's core efficiency claim (SURVEY.md §6: ~50% training-overhead
reduction for MixGRPO, ~71% for MixGRPO-Flash) decomposes per iteration as

    iteration = rollout(T model calls) + update(N_pairs fwd+bwd)

with, per sample: DanceGRPO ("all", timestep_fraction 0.6) trains 15 of 25
steps; MixGRPO trains the window (4); MixGRPO-Flash additionally
compresses the post-window schedule with DPM-Solver++ (ratio 0.4 ->
~13 rollout calls).  This script measures each piece on the real chip at
512px (full width, reduced depth; the depth slice cancels in the ratios)
and prints the per-iteration table.

Run on a box with the tunneled TPU: python scripts/bench_strategies.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from bench import _enable_compile_cache  # noqa: E402

ROLLOUT_DD, ROLLOUT_DS = 2, 4
UPDATE_DD, UPDATE_DS = 1, 2
HEIGHT, TEXT_LEN = 512, 512
STEPS_FULL = 25
WINDOW = 4
FLASH_STEPS = WINDOW + int(np.ceil((STEPS_FULL - WINDOW) * 0.4))  # 13
PAIRS_DANCE = int(STEPS_FULL * 0.6)  # 15
PAIRS_MIX = WINDOW  # 4


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux import FluxConfig, init_flux
    from mixgrpo_tpu.rl.ppo import PPOConfig
    from mixgrpo_tpu.sampler import FluxSampler
    from mixgrpo_tpu.solvers.rollout import SamplerConfig
    from mixgrpo_tpu.solvers.schedule import deterministic_mask, sigma_schedule
    from mixgrpo_tpu.trainer import (
        build_update_batch, make_optimizer, make_update_fns,
    )

    # ---- rollout timing (bf16, depth (2,4)) ------------------------------
    rcfg = FluxConfig(
        in_channels=64, hidden_size=3072, num_heads=24,
        depth_double=ROLLOUT_DD, depth_single=ROLLOUT_DS,
        pooled_dim=768, context_dim=4096,
    )
    scfg = SamplerConfig(num_steps_max=STEPS_FULL, eta=0.7)
    sampler = FluxSampler(rcfg, scfg, height=HEIGHT, width=HEIGHT,
                          text_len=TEXT_LEN, dtype=jnp.bfloat16,
                          attn_impl="auto")
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_flux(k, rcfg)
    ))(jax.random.key(0))
    key = jax.random.key(1)
    txt = jax.random.normal(key, (1, TEXT_LEN, 4096), jnp.bfloat16)
    pooled = jax.random.normal(key, (1, 768), jnp.bfloat16)
    z0 = sampler.init_noise(jax.random.key(2), 1)
    sig = sigma_schedule(STEPS_FULL, 3.0)
    det = deterministic_mask(STEPS_FULL, list(range(WINDOW)))

    def time_rollout(n_steps):
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = sampler.rollout(params, z0, txt, pooled, sig, det,
                                  n_steps, jax.random.key(3))
            float(out.final_latents.sum())  # axon: force host fetch to sync
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t_roll_full = time_rollout(STEPS_FULL)
    t_roll_flash = time_rollout(FLASH_STEPS)

    # free the rollout model's device buffers before the update phase —
    # the fp32 AdamW update at depth (1,2) needs nearly all of HBM
    for leaf in jax.tree.leaves(params):
        leaf.delete()
    del params

    # ---- update timing (fp32 + AdamW, depth (1,2)) -----------------------
    ucfg = FluxConfig(
        in_channels=64, hidden_size=3072, num_heads=24,
        depth_double=UPDATE_DD, depth_single=UPDATE_DS,
        pooled_dim=768, context_dim=4096,
    )
    usampler = FluxSampler(ucfg, scfg, height=HEIGHT, width=HEIGHT,
                           text_len=TEXT_LEN, dtype=jnp.bfloat16,
                           attn_impl="auto")
    # staged host-side: the device holds exactly ONE params copy at a time
    # (update_step donates its inputs)
    uparams = jax.tree.map(np.asarray, init_flux(jax.random.key(4), ucfg))
    opt = make_optimizer(learning_rate=1e-5)
    update_step, _, _ = make_update_fns(
        ucfg, scfg, PPOConfig(), opt, usampler.rope_cos, usampler.rope_sin,
        dtype=jnp.bfloat16, attn_impl="auto", remat="dots",
    )
    n_img = usampler.num_image_tokens
    lat = jax.random.normal(key, (1, STEPS_FULL + 1, n_img, 64))
    lp = jax.random.normal(key, (1, STEPS_FULL))
    adv = jnp.ones((1,))
    txt32 = txt.astype(jnp.bfloat16)

    def time_update(n_pairs, accum=1):
        si = np.zeros(n_pairs, np.int32)
        ti = (np.arange(n_pairs) % STEPS_FULL).astype(np.int32)
        ub = build_update_batch(lat, lp, adv, txt32, pooled, si, ti)
        # update_step donates params/opt_state; stage a fresh device copy
        # from the host so repeated calls don't touch deleted buffers
        p = jax.device_put(uparams)
        ostate = opt.init(p)
        ts = []
        for _ in range(3):
            t0 = time.time()
            p, ostate, m = update_step(p, ostate, ub, jnp.asarray(sig))
            float(m["loss"])
            ts.append(time.time() - t0)
        return float(np.median(ts))

    # per-pair cost from two pair counts (subtracts fixed optimizer cost).
    # 8 pairs is the largest fused row count that fits HBM next to the
    # fp32 AdamW state at this depth (15 rows OOMs: 17.49G > 15.75G);
    # DanceGRPO's 15 pairs/sample is composed from the linear fit below.
    t_upd_4 = time_update(4)
    t_upd_8 = time_update(8)
    per_pair = (t_upd_8 - t_upd_4) / 4.0
    fixed = t_upd_4 - 4 * per_pair

    G = 12  # generations per prompt per rank (the recipe)

    def iteration(rollout_t, pairs):
        # G rollouts (batched here as 1; scale linearly) + G*pairs update
        return G * rollout_t + G * (fixed / 4.0 + pairs * per_pair)

    it_dance = iteration(t_roll_full, PAIRS_DANCE)
    it_mix = iteration(t_roll_full, PAIRS_MIX)
    it_flash = iteration(t_roll_flash, PAIRS_MIX)

    print(json.dumps({
        "rollout_25_steps_s": round(t_roll_full, 3),
        "rollout_flash_13_steps_s": round(t_roll_flash, 3),
        "update_4_pairs_s": round(t_upd_4, 3),
        "update_8_pairs_s": round(t_upd_8, 3),
        "per_pair_s": round(per_pair, 4),
        "iteration_dancegrpo_s": round(it_dance, 2),
        "iteration_mixgrpo_s": round(it_mix, 2),
        "iteration_mixgrpo_flash_s": round(it_flash, 2),
        "mixgrpo_vs_dance_speedup": round(it_dance / it_mix, 3),
        "flash_vs_dance_speedup": round(it_dance / it_flash, 3),
    }, indent=1))


if __name__ == "__main__":
    main()
