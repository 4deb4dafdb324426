#!/usr/bin/env python
"""Dump the optimized HLO of an isolated cycle_scan backward at FLUX width.

The round-4b profile (bench_results/round4b/prof512_upd_vjp) shows the
cycle_scan VJP's per-visit block-gradient adds landing as standalone
``%bitcast_add_fusion`` ops (~300 ms/iter total) instead of fusing into
the wgrad convolutions, and running at ~130 GB/s effective — far below
HBM peak.  This probe compiles just the single-stream stack's
cycle_scan gradient at the real update shape (B*pairs=4, S=1536,
hidden 3072) and prints every fusion containing a stacked-gradient add,
with its operand layouts, so the blocker (layout mismatch vs missed
output fusion) can be identified.

Usage: python scripts/probe_accum_hlo.py [--mode hlo|time] [--dtype bf16]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import _enable_compile_cache

_enable_compile_cache()


def build(dtype, n=4, k=2, B=4, S=1536):
    from mixgrpo_tpu.models.flux.model import (
        FluxConfig, _single_block, _single_block_init,
    )
    from mixgrpo_tpu.models.flux.rope import rope_tables
    from mixgrpo_tpu.models.flux import make_image_ids, make_text_ids
    import numpy as np

    cfg = FluxConfig(in_channels=64, hidden_size=3072, num_heads=24,
                     depth_double=1, depth_single=k, pooled_dim=768,
                     context_dim=4096)
    ks = jax.random.split(jax.random.key(0), k)
    stack = jax.tree.map(
        lambda *xs: jnp.stack(xs).astype(dtype),
        *[_single_block_init(kk, cfg) for kk in ks])
    x = jax.random.normal(jax.random.key(1), (B, S, 3072), dtype)
    vec = jax.random.normal(jax.random.key(2), (B, 3072), dtype)
    ids = np.concatenate([make_text_ids(512), make_image_ids(64, 64)])
    cos, sin = rope_tables(ids, cfg.axes_dims, cfg.theta)
    cos = jnp.asarray(cos[:S], jnp.float32)
    sin = jnp.asarray(sin[:S], jnp.float32)

    def body(c, p):
        return _single_block(p, cfg, c, vec, cos, sin, "auto", dtype), None

    return body, x, stack


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="hlo", choices=["hlo", "time"])
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32acc"])
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--full", action="store_true",
                    help="print full HLO to stdout instead of grepping")
    args = ap.parse_args()
    dtype = jnp.bfloat16
    from mixgrpo_tpu.utils.cycle_scan import cycle_scan

    body, x, stack = build(dtype, n=args.n)

    def loss(x, stack):
        out = cycle_scan(body, x, stack, args.n, 2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=1))
    lowered = g.lower(x, stack)
    compiled = lowered.compile()
    txt = compiled.as_text()
    if args.full:
        print(txt)
        return
    print(f"# HLO chars: {len(txt)}", file=sys.stderr)
    # print fusions whose name mentions add and convolution, with layouts
    pat = re.compile(r"^\s*%?(\S*(?:bitcast_add|convolution_add|"
                     r"dynamic-update-slice)\S*fusion\S*) = (.*)$")
    for line in txt.splitlines():
        m = pat.match(line)
        if m:
            print(line.strip()[:400])
    # and the fused computations' rough contents
    for name in re.findall(r"%(fused_computation[.\w]*)", txt)[:0]:
        pass


if __name__ == "__main__":
    main()
