"""Isolate the bf16 serve-recipe TPU worker crash (1024px, S=4608).

The serve recipe bench (`bench_serve.py --mode recipe`) crashed the TPU
worker 3x in bf16 while int8 passed.  This probe runs the suspect
sub-programs standalone, hardest-first, printing a JSON line per phase so
the campaign log shows exactly which one kills the worker:

  1. flash attention fwd, B=4 H=24 S=4608, full-K block (the serve batch
     shape — the prior microbench that passed was B=1)
  2. same, chunked block_k=1024 (the post-fix auto selection)
  3. one full-width virtual-depth (19,38) forward at 1024px, bf16
  4. a 3-step segment rollout at 1024px (the serve seg program, short)

Run: python scripts/probe_serve_crash.py
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    results = {}

    def phase(name, fn):
        t0 = time.time()
        try:
            out = fn()
            results[name] = {"ok": True, "s": round(time.time() - t0, 2),
                             **(out or {})}
        except Exception as e:  # noqa: BLE001 - report and continue
            results[name] = {"ok": False, "s": round(time.time() - t0, 2),
                             "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: results[name]}), flush=True)

    B, H, S, D = 4, 24, 4608, 128

    def attn(block_k):
        from mixgrpo_tpu.ops.flash_attention import flash_attention

        q = jax.random.normal(jax.random.key(0), (B, H, S, D), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.bfloat16)
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, block_q=512,
                                                    block_k=block_k))
        o = f(q, k, v)
        float(o.sum())  # axon: force host fetch (block_until_ready no-op)
        t0 = time.time()
        for _ in range(4):
            o = f(q, k, v)
        float(o.sum())
        return {"ms": round((time.time() - t0) / 4 * 1e3, 2)}

    phase("attn_fullk_b4", lambda: attn(S))
    phase("attn_bk1024_b4", lambda: attn(1024))

    from mixgrpo_tpu.models.flux.model import FluxConfig, flux_forward, init_flux

    cfg = FluxConfig(in_channels=64, hidden_size=3072, num_heads=24,
                     depth_double=1, depth_single=2, pooled_dim=768,
                     context_dim=4096)
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_flux(k, cfg)))(jax.random.key(0))
    HEIGHT = 1024
    S_img = (HEIGHT // 16) ** 2
    TEXT = 512

    def fwd():
        from mixgrpo_tpu.models.flux.rope import (
            make_image_ids, make_text_ids, rope_tables)

        ids = np.concatenate(
            [make_text_ids(TEXT), make_image_ids(HEIGHT // 8, HEIGHT // 8)])
        cos, sin = rope_tables(ids, cfg.axes_dims, cfg.theta)
        z = jax.random.normal(jax.random.key(3), (B, S_img, 64), jnp.bfloat16)
        txt = jax.random.normal(jax.random.key(4), (B, TEXT, 4096), jnp.bfloat16)
        pooled = jax.random.normal(jax.random.key(5), (B, 768), jnp.bfloat16)
        t = jnp.full((B,), 0.5, jnp.float32)
        g = jnp.full((B,), 3.5, jnp.float32)

        f = jax.jit(lambda p, z, txt, pooled: flux_forward(
            p, cfg, z, txt, pooled, t, g, cos, sin, dtype=jnp.bfloat16,
            attn_impl="pallas", remat=False, virtual_depth=(19, 38)))
        o = f(params, z, txt, pooled)
        float(o.sum())
        t0 = time.time()
        o = f(params, z, txt, pooled)
        float(o.sum())
        return {"ms": round((time.time() - t0) * 1e3, 1)}

    phase("fwd_1024_fulldepth", fwd)

    def seg_rollout():
        # EXACT program shape of the serve recipe's segment-1 rollout
        # (num_steps_max=31 like DualFluxPipeline's 30-step tuned segment;
        # the executed step count is data, so running 3 steps exercises
        # the same compiled program the serve warmup dies in)
        from mixgrpo_tpu.sampler import FluxSampler, SamplerConfig

        scfg = SamplerConfig(num_steps_max=31, eta=0.0)
        sampler = FluxSampler(cfg, scfg, height=HEIGHT, width=HEIGHT,
                              text_len=TEXT, guidance_scale=3.5,
                              dtype=jnp.bfloat16, attn_impl="auto",
                              virtual_depth=(19, 38))
        z0 = sampler.init_noise(jax.random.key(6), B)
        txt = jax.random.normal(jax.random.key(4), (B, TEXT, 4096), jnp.float32)
        pooled = jax.random.normal(jax.random.key(5), (B, 768), jnp.float32)
        sig = np.linspace(1.0, 0.0, 32).astype(np.float32)
        det = jnp.ones(31, bool)
        out = sampler.rollout(params, z0, txt, pooled, jnp.asarray(sig), det,
                              3, jax.random.key(7))
        float(out.final_latents.sum())
        return {}

    phase("seg_rollout_3step_1024", seg_rollout)

    print(json.dumps({"metric": "probe_serve_crash_1024px", **results}))


if __name__ == "__main__":
    main()
