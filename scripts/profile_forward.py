"""Capture a jax.profiler trace of the FLUX forward (or fused PPO update)
at a given image size, then attribute device time per op class.

Round-4 lever (VERDICT r3 item 2): the 720px forward floor — 289 ms/fwd
(~68% MFU) vs 75% at 512px.  The attention kernel is already at 99.7%
kernel MFU after lane alignment, so the residual sits in the fusion mix;
this tool captures 512px and 720px programs under identical conditions so
`scripts/analyze_profile.py` can diff the per-fusion device time.

Run (real chip):
    python scripts/profile_forward.py --height 720 --out /tmp/prof720
    python scripts/profile_forward.py --height 512 --out /tmp/prof512
    python scripts/analyze_profile.py /tmp/prof720 --top 40
Phases: --phase forward (default) | update.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

TEXT_LEN = 512


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--phase", default="forward", choices=["forward", "update"])
    ap.add_argument("--out", default=None, help="trace dir (default /tmp/prof<h>)")
    ap.add_argument("--iters", type=int, default=3, help="iterations inside the trace")
    ap.add_argument("--virtual_depth", default="19,38")
    ap.add_argument("--pad_seq", type=int, default=128,
                    help="pad_seq_multiple for the model (0 = ragged)")
    ap.add_argument("--remat", default="full", choices=["dots", "full", "none"])
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--analyze", action="store_true",
                    help="run analyze_profile on the capture afterwards")
    args = ap.parse_args()
    out = args.out or f"/tmp/prof{args.height}_{args.phase}"
    vd = tuple(int(x) for x in args.virtual_depth.split(","))

    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mixgrpo_tpu.models.flux import (
        FluxConfig, flux_forward, init_flux, make_image_ids, make_text_ids,
        rope_tables,
    )

    H = args.height
    cfg = FluxConfig(in_channels=64, hidden_size=3072, num_heads=24,
                     depth_double=1, depth_single=2, pooled_dim=768,
                     context_dim=4096)
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_flux(k, cfg)))(jax.random.key(0))
    lh = lw = H // 8
    B = 1
    key = jax.random.key(1)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), 64), jnp.bfloat16)
    txt = jax.random.normal(key, (B, TEXT_LEN, 4096), jnp.bfloat16)
    pooled = jax.random.normal(key, (B, 768), jnp.bfloat16)
    ids = np.concatenate([make_text_ids(TEXT_LEN), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)

    if args.phase == "forward":
        @jax.jit
        def run(params, z, m):
            def body(i, z):
                t = jnp.full((z.shape[0],), 0.5) + 1e-6 * i
                o = flux_forward(
                    params, cfg, z, txt, pooled, t, jnp.full((B,), 3.5),
                    cos, sin, dtype=jnp.bfloat16, attn_impl="auto",
                    remat=False, virtual_depth=vd,
                    pad_seq_multiple=args.pad_seq,
                )
                return z + o.astype(z.dtype) * jnp.bfloat16(1e-6)
            return jax.lax.fori_loop(0, m, body, z).astype(jnp.float32).mean()

        def step():
            return float(run(params, img, 1))
    else:
        from mixgrpo_tpu.rl.ppo import PPOConfig
        from mixgrpo_tpu.sampler import FluxSampler
        from mixgrpo_tpu.solvers.rollout import SamplerConfig
        from mixgrpo_tpu.trainer import (
            UpdateBatch, make_optimizer, make_update_fns,
        )

        STEPS = 25
        scfg = SamplerConfig(num_steps_max=STEPS, eta=0.7)
        sampler = FluxSampler(cfg, scfg, height=H, width=H, text_len=TEXT_LEN,
                              virtual_depth=vd)
        S_img = sampler.num_image_tokens
        pairs = args.pairs
        remat = {"dots": "dots", "full": True, "none": False}[args.remat]
        opt = make_optimizer(learning_rate=1e-5)
        opt_state = opt.init(params)
        update_step, _, _ = make_update_fns(
            cfg, scfg, PPOConfig(clip_range=1e-4, adv_clip_max=5.0), opt,
            sampler.rope_cos, sampler.rope_sin, remat=remat, virtual_depth=vd,
        )
        lat = jax.random.normal(key, (pairs, S_img, 64), jnp.float32)
        batch = UpdateBatch(
            latents=lat, next_latents=lat + 0.01,
            t_index=jnp.asarray(np.arange(pairs) % STEPS, jnp.int32),
            old_log_probs=jnp.zeros((pairs,), jnp.float32),
            advantages=jnp.ones((pairs,), jnp.float32),
            txt=jnp.broadcast_to(txt[:1], (pairs, TEXT_LEN, 4096)).astype(jnp.bfloat16),
            pooled=jnp.broadcast_to(pooled[:1], (pairs, 768)).astype(jnp.bfloat16),
        )
        sig = jnp.asarray(np.linspace(1.0, 0.0, STEPS + 1), jnp.float32)
        state = {"params": params, "opt": opt_state}

        def step():
            p, o, m = update_step(state["params"], state["opt"], batch, sig)
            state["params"], state["opt"] = p, o
            return float(m["loss"])

    t0 = time.time()
    step()  # compile + warm
    t_compile = time.time() - t0

    with jax.profiler.trace(out):
        t0 = time.time()
        for _ in range(args.iters):
            step()
        t_iter = (time.time() - t0) / args.iters

    print(json.dumps({
        "metric": f"profile_capture_{args.phase}_{H}px",
        "out": out,
        "iters": args.iters,
        "compile_s": round(t_compile, 1),
        "per_iter_s": round(t_iter, 3),
        "pad_seq_multiple": args.pad_seq,
        "virtual_depth": list(vd),
    }))
    if args.analyze:
        import subprocess

        subprocess.run([sys.executable, "scripts/analyze_profile.py", out,
                        "--top", "40"], check=False)


if __name__ == "__main__":
    main()
