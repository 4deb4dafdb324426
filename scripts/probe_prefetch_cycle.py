"""Probe: can double-buffer prefetch hide the weight-cycle slice cost?

The batched-headline fit (PERF.md) shows a batch-independent ~22 ms per
full-depth forward — the serialized portion of per-block weight-stack
slicing inside the cycle scan (each scan iteration dynamic-slices one
block's ~453/227 MB of weights from the stacked HBM buffer).  This probe
times the full-depth rollout forward (inference path, no grad) in three
weight-delivery variants at B=2/512px:

  scan      — the production path: lax.scan with the stack as xs
  prefetch  — fori_loop double buffer: block i+1's weights are sliced
              while block i computes (independent ops in one iteration;
              the latency-hiding scheduler may overlap the copy)
  gather    — lax.scan over indices, w[i % k] tree-gather per step

Usage: python scripts/probe_prefetch_cycle.py [--height 512] [--batch 2]
One JSON line per variant.
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--variants", type=str, default="scan,prefetch")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux import (
        FluxConfig, flux_forward, init_flux, make_image_ids, make_text_ids,
        rope_tables,
    )
    from mixgrpo_tpu.models.flux import model as M
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
    lh = lw = args.height // 8
    B = args.batch
    key = jax.random.key(1)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), 64), jnp.bfloat16)
    txt = jax.random.normal(key, (B, TEXT_LEN, 4096), jnp.bfloat16)
    pooled = jax.random.normal(key, (B, 768), jnp.bfloat16)
    ids = np.concatenate([make_text_ids(TEXT_LEN), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)

    def fwd_variant(variant, params, z, t):
        """flux_forward at virtual depth with a chosen weight-cycle impl."""
        if variant == "scan":
            # pad_seq_multiple=0: the reimplemented trunks below run the
            # joint sequence unpadded, so the production padding (applied
            # at e.g. 720px -> S=2537) would confound the weight-delivery
            # timing comparison with a different sequence layout
            return flux_forward(
                params, cfg, z, txt, pooled, t, jnp.full((B,), 3.5), cos,
                sin, dtype=jnp.bfloat16, attn_impl="auto", remat=False,
                virtual_depth=(FULL_DD, FULL_DS), pad_seq_multiple=0,
            )
        # reimplement the trunk with alternate cycle delivery (embedders /
        # final layer identical to flux_forward, model.py:307-409)
        L = M.L
        x = L.linear(params["x_embedder"], z, jnp.bfloat16)
        c = L.linear(params["context_embedder"], txt, jnp.bfloat16)
        vec = L.mlp_embedder(
            params["time_in"],
            L.timestep_embedding(t * 1000.0, cfg.time_freq_dim),
            jnp.bfloat16,
        )
        vec = vec + L.mlp_embedder(
            params["guidance_in"],
            L.timestep_embedding(jnp.full((B,), 3.5) * 1000.0,
                                 cfg.time_freq_dim),
            jnp.bfloat16,
        )
        vec = vec + L.mlp_embedder(params["vector_in"], pooled, jnp.bfloat16)
        rc, rs = cos.astype(jnp.float32), sin.astype(jnp.float32)

        def double_body(carry, p):
            ih, th = M._double_block(
                p, cfg, carry[0], carry[1], vec, rc, rs, "auto",
                jnp.bfloat16)
            return (M.constrain_residual(ih), M.constrain_residual(th)), None

        def single_body(xh, p):
            out = M._single_block(
                p, cfg, xh, vec, rc, rs, "auto", jnp.bfloat16)
            return M.constrain_residual(out), None

        def prefetch_cycle(body, carry, stack, n, k):
            w0 = jax.tree.map(lambda s: s[0], stack)

            def loop_body(j, state):
                carry, w_cur = state
                w_next = jax.tree.map(
                    lambda s: jax.lax.dynamic_index_in_dim(
                        s, (j + 1) % k, axis=0, keepdims=False),
                    stack,
                )
                carry, _ = body(carry, w_cur)
                return (carry, w_next)

            carry, _ = jax.lax.fori_loop(0, n, loop_body, (carry, w0))
            return carry

        def gather_cycle(body, carry, stack, n, k):
            def gb(c2, i):
                p = jax.tree.map(lambda w: w[i % k], stack)
                return body(c2, p)
            carry, _ = jax.lax.scan(gb, carry, jnp.arange(n))
            return carry

        def gather_unroll2(body, carry, stack, n, k):
            """gather_cycle with unroll=2: half the scan iterations, two
            block applications (and two modular gathers) per iteration."""
            def gb(c2, i):
                p = jax.tree.map(lambda w: w[i % k], stack)
                return body(c2, p)
            carry, _ = jax.lax.scan(gb, carry, jnp.arange(n), unroll=2)
            return carry

        def static_cycle(body, carry, stack, n, k):
            """No dynamic weight gathers at all: floor(n/k) cycles of the
            k statically-sliced blocks (Python-unrolled inside one scan
            iteration, as cycle_scan's VJP forward does) + the n%k
            remainder applications unrolled at the end."""
            cyc, rem = divmod(n, k)
            blocks = [
                jax.tree.map(lambda w, j=j: w[j], stack) for j in range(k)
            ]

            def cycle(c2, _):
                for j in range(k):
                    c2, _ = body(c2, blocks[j])
                return c2, None

            carry, _ = jax.lax.scan(cycle, carry, None, length=cyc)
            for j in range(rem):
                carry, _ = body(carry, blocks[j])
            return carry

        cyc = {"prefetch": prefetch_cycle, "unroll2": gather_unroll2,
               "staticcycle": static_cycle}.get(variant, gather_cycle)
        kd = jax.tree.leaves(params["double"])[0].shape[0]
        ks = jax.tree.leaves(params["single"])[0].shape[0]
        (x, c) = cyc(double_body, (x, c), params["double"], FULL_DD, kd)
        joint = jnp.concatenate([c, x], axis=1)
        joint = cyc(single_body, joint, params["single"], FULL_DS, ks)
        x = joint[:, c.shape[1]:]
        scale, shift = L.modulation(params["final_mod"], vec, 2, jnp.bfloat16)
        x = L.modulate(L.layer_norm(x, cfg.eps), shift, scale)
        return L.linear(params["proj_out"], x, jnp.bfloat16).astype(
            jnp.float32)

    # correctness reference: ONE raw forward of the production 'scan'
    # variant (pinned explicitly — not whichever variant runs first), and
    # each variant's raw output compared by max|diff| scaled to the
    # reference magnitude.  (The earlier check compared chained .mean()
    # scalars where variant outputs entered at ~1e-6 scale against a 1e-2
    # tolerance — vacuously true for any weight-delivery bug.)
    t_probe = jnp.full((B,), 0.5)
    raw = jax.jit(lambda p, z, v=None: fwd_variant("scan", p, z, t_probe))
    out_scan = np.asarray(raw(params, img), np.float32)
    ref_scale = float(np.abs(out_scan).max())

    for variant in args.variants.split(","):
        @jax.jit
        def run(params, z, m, variant=variant):
            def body(i, z):
                t = jnp.full((z.shape[0],), 0.5) + 1e-6 * i
                out = fwd_variant(variant, params, z, t)
                return z + out.astype(z.dtype) * jnp.bfloat16(1e-6)
            return jax.lax.fori_loop(0, m, body, z).astype(jnp.float32).mean()

        out_v = np.asarray(
            jax.jit(
                lambda p, z, variant=variant: fwd_variant(
                    variant, p, z, t_probe)
            )(params, img),
            np.float32,
        )
        max_diff = float(np.abs(out_v - out_scan).max())
        float(run(params, img, 1))  # compile + warm the timed program
        def timed(m, run=run):
            t0 = time.time()
            float(run(params, img, m))
            return time.time() - t0

        res = robust_slope(timed, args.n, retries=4)
        out = {"variant": variant, "valid": res.valid,
               # bf16 forward at depth 57: allow ~1% of mean |out|
               "match_scan": bool(max_diff < 1e-2 * ref_scale + 1e-6),
               "max_diff_vs_scan": max_diff}
        if res.valid:
            out["fwd_ms_per_img"] = round(res.per_iter_s / B * 1e3, 1)
        else:
            out["reason"] = res.reason
        print(json.dumps(out), flush=True)

    print(f"post-smoke {backend_smoke():.2f}s", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
