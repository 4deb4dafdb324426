"""Round-5 probe: the weight-cycling scan's per-application fixed cost.

VERDICT r4 item 1 asks for (at least) two fresh attacks on the measured
w ~= 0.39 ms batch-independent cost per block application (~22 ms per
full-depth forward) that the round-4 prefetch probe did not cover.  The
full-depth bench runs 19 double applications over a 2-deep resident
stack and 38 single applications over a 4-deep stack; since 2 does not
divide 19 (and 4 does not divide 38), ``flux_forward``'s cycle_scan
takes the ``w[i % k]`` modular dynamic-tree-gather branch
(models/flux/model.py gather_body).  Two mechanisms it never A/B'd:

  1. **Static-slice cycling** — resident depths (1, 2) DIVIDE (19, 38),
     so cycle_scan takes the custom-VJP path whose no-grad forward is a
     scan over cycles with the k block applications Python-unrolled on
     STATIC slices: no per-step dynamic gather at all.  Weight values
     repeat more often, but per application the MXU compute and the HBM
     weight stream are unchanged (the stacks exceed VMEM either way, so
     every application re-streams its block from HBM — the bench.py
     honesty argument verbatim).
  2. **Gather-scan unrolling** (``MIXGRPO_GATHER_UNROLL``) — unroll=2/4
     lets XLA software-pipeline application i+1's weight gather against
     application i's compute without the manual double-buffer the
     round-4 prefetch probe rejected (25% slower).

Variants (same session, same input data, B and height from flags):
  stacks24            gather path, unroll 1   (the current headline)
  stacks24_unroll2    gather path, unroll 2
  stacks24_unroll4    gather path, unroll 4
  stacks12            static-slice cycle path (19 x 1, 19 x (2-unrolled))
  stacks12_gather     gather path FORCED at depths (1,2): isolates the
                      dynamic-gather overhead at matched residency

Output: one JSON line per variant ({variant, fwd_ms_per_call,
fwd_ms_per_img}), plus a trailing summary line.  Reference counterpart:
none (the reference holds all weights resident on an 80 GB GPU and has
no cycling scan; fastvideo/train_grpo_flux.py:677-701).

Usage:
  python scripts/probe_cycle_layout.py --height 720 --batch 2 --n 4 \
      --variants stacks24,stacks12
(one or two variants per invocation keeps remote compile time bounded)
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import FULL_DD, FULL_DS, TEXT_LEN, _enable_compile_cache

VARIANTS = {
    # name: (depth_double, depth_single, force_gather, unroll)
    "stacks24": (2, 4, False, 1),
    "stacks24_unroll2": (2, 4, False, 2),
    "stacks24_unroll4": (2, 4, False, 4),
    "stacks12": (1, 2, False, 1),
    "stacks12_gather": (1, 2, True, 1),
}


def run_variant(name: str, height: int, batch: int, n: int):
    dd, ds, force_gather, unroll = VARIANTS[name]
    os.environ["MIXGRPO_GATHER_UNROLL"] = str(unroll)

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux import (
        FluxConfig, flux_forward, init_flux, make_image_ids, make_text_ids,
        rope_tables,
    )
    from mixgrpo_tpu.models.flux import model as flux_model
    from mixgrpo_tpu.utils.timing import backend_smoke, robust_slope

    flux_model._FORCE_GATHER = force_gather

    print(f"smoke {backend_smoke():.2f}s", file=sys.stderr, flush=True)

    cfg = FluxConfig(
        in_channels=64, hidden_size=3072, num_heads=24,
        depth_double=dd, depth_single=ds, pooled_dim=768, context_dim=4096,
    )
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_flux(k, cfg)
        )
    )(jax.random.key(0))
    lh = lw = height // 8
    ids = np.concatenate([make_text_ids(TEXT_LEN), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)

    B = batch
    key = jax.random.key(1)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), 64), jnp.bfloat16)
    txt = jax.random.normal(key, (B, TEXT_LEN, 4096), jnp.bfloat16)
    pooled = jax.random.normal(key, (B, 768), jnp.bfloat16)

    def step(params, z, t):
        return flux_forward(
            params, cfg, z, txt, pooled, t, jnp.full((B,), 3.5), cos, sin,
            dtype=jnp.bfloat16, attn_impl="auto", remat=False,
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

    res = robust_slope(timed, n, retries=4)
    if not res.valid:
        print(json.dumps({"variant": name, "valid": False,
                          "reason": res.reason}), flush=True)
        return
    per_img_ms = res.per_iter_s / B * 1e3
    print(json.dumps({
        "variant": name, "valid": True, "B": B, "height": height,
        "stacks": [dd, ds], "force_gather": force_gather, "unroll": unroll,
        "fwd_ms_per_call": round(res.per_iter_s * 1e3, 1),
        "fwd_ms_per_img": round(per_img_ms, 1),
        "img_per_s_25step": round(1.0 / (25 * per_img_ms / 1e3), 4),
    }), flush=True)
    print(f"post-smoke {backend_smoke():.2f}s", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--variants", type=str, default="stacks24,stacks12")
    ap.add_argument("--one", type=str, default=None,
                    help="(internal) run exactly one variant in-process")
    args = ap.parse_args()

    if args.one:
        run_variant(args.one, args.height, args.batch, args.n)
        return

    # each variant in a fresh process: env-var layout knobs are read at
    # import time, and a wedged tunnel must not poison later variants
    for name in args.variants.split(","):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one", name, "--height", str(args.height),
               "--batch", str(args.batch), "--n", str(args.n)]
        try:
            proc = subprocess.run(cmd, timeout=2400, text=True,
                                  capture_output=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"variant": name, "valid": False,
                              "reason": "timeout"}), flush=True)
            continue
        for line in proc.stdout.splitlines():
            if line.strip().startswith("{"):
                print(line.strip(), flush=True)
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()[-2:]
            print(json.dumps({"variant": name, "valid": False,
                              "reason": f"rc={proc.returncode} " + " | ".join(tail)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
