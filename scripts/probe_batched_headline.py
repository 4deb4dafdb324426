"""Probe: does batching the full-depth rollout forward beat B=1 per image?

Round-4 in-rollout measurements showed 133 ms/img-fwd at B=2 (512px,
full 19/38 weight-cycled depth) vs bench.py's B=1 145.6 ms — the
per-block HBM weight stream amortizes over the batch.  This probe
re-measures the bench.py program itself at B in {1, 2, 4} so the
headline can honestly adopt the recipe's batched rollout shape
(the MixGRPO recipe generates G=12 images per iteration; batched
generation is the production path, reference:
/root/reference/fastvideo/train_grpo_flux.py sampling loop).

Usage: python scripts/probe_batched_headline.py [--height 512] [--n 4]
Writes one JSON line per batch size.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import DD, DS, FULL_DD, FULL_DS, TEXT_LEN, _enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--batches", type=str, default="1,2,4")
    ap.add_argument("--quant", type=str, default="none",
                    help="'int8' measures the quantized rollout forward")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux import (
        FluxConfig, flux_forward, init_flux, make_image_ids, make_text_ids,
        rope_tables,
    )
    from mixgrpo_tpu.utils.timing import backend_smoke, robust_slope

    print(f"smoke {backend_smoke():.2f}s", file=sys.stderr, flush=True)

    cfg = FluxConfig(
        in_channels=64, hidden_size=3072, num_heads=24,
        depth_double=DD, depth_single=DS, pooled_dim=768, context_dim=4096,
    )
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_flux(k, cfg)
        )
    )(jax.random.key(0))
    if args.quant == "int8":
        from mixgrpo_tpu.ops.quant import quantize_flux_params

        params = jax.jit(quantize_flux_params)(params)
    lh = lw = args.height // 8
    ids = np.concatenate([make_text_ids(TEXT_LEN), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)

    for B in [int(b) for b in args.batches.split(",")]:
        key = jax.random.key(1)
        img = jax.random.normal(
            key, (B, (lh // 2) * (lw // 2), 64), jnp.bfloat16)
        txt = jax.random.normal(key, (B, TEXT_LEN, 4096), jnp.bfloat16)
        pooled = jax.random.normal(key, (B, 768), jnp.bfloat16)

        def step(params, z, t):
            return flux_forward(
                params, cfg, z, txt, pooled, t, jnp.full((B,), 3.5), cos,
                sin, dtype=jnp.bfloat16, attn_impl="auto", remat=False,
                virtual_depth=(FULL_DD, FULL_DS),
            )

        @jax.jit
        def run(params, z, m):
            def body(i, z):
                t = jnp.full((z.shape[0],), 0.5) + 1e-6 * i
                out = step(params, z, t)
                return z + out.astype(z.dtype) * jnp.bfloat16(1e-6)
            return jax.lax.fori_loop(0, m, body, z).astype(jnp.float32).mean()

        float(run(params, img, 1))

        def timed(m):
            t0 = time.time()
            float(run(params, img, m))
            return time.time() - t0

        res = robust_slope(timed, args.n, retries=4)
        if not res.valid:
            print(json.dumps({"B": B, "valid": False, "reason": res.reason}),
                  flush=True)
            continue
        per_img_ms = res.per_iter_s / B * 1e3
        print(json.dumps({
            "B": B, "valid": True,
            "fwd_ms_per_call": round(res.per_iter_s * 1e3, 1),
            "fwd_ms_per_img": round(per_img_ms, 1),
            "img_per_s_25step": round(1.0 / (25 * per_img_ms / 1e3), 4),
        }), flush=True)

    print(f"post-smoke {backend_smoke():.2f}s", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
