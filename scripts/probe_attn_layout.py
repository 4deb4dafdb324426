"""Probe: flash attention bshd (head-minor) vs bhsd layout on-chip.

Two questions (round 5, VERDICT item 2):
  1. kernel-only: does the strided per-head block DMA of the bshd layout
     cost kernel throughput vs the dense bhsd rows?
  2. end-to-end block: does bshd win once the surrounding program drops
     the (B,S,H*D)->(B,H,S,D) head-split transposes?  (Measured at the
     single-block level here; full-model numbers come from bench_e2e.)

Usage: python scripts/probe_attn_layout.py [--S 1536] [--B 1]
"""
import argparse, json, sys, time
sys.path.insert(0, ".")
from bench import _enable_compile_cache

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=1536)
    ap.add_argument("--B", type=int, default=1)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--bwd", action="store_true")
    args = ap.parse_args()
    _enable_compile_cache()
    import jax, jax.numpy as jnp
    from mixgrpo_tpu.ops.flash_attention import flash_attention
    from mixgrpo_tpu.utils.timing import backend_smoke, robust_slope
    print(f"smoke {backend_smoke():.2f}s", file=sys.stderr, flush=True)

    B, H, S, D = args.B, 24, args.S, 128
    ks = jax.random.split(jax.random.key(0), 3)
    flops = 4 * B * H * S * S * D * (3.5 if args.bwd else 1.0)

    for layout in ("bhsd", "bshd"):
        shape = (B, S, H, D) if layout == "bshd" else (B, H, S, D)
        q, k, v = (jax.random.normal(kk, shape, jnp.bfloat16) for kk in ks)

        if args.bwd:
            def one(q, k, v, layout=layout):
                def f(q):
                    return (flash_attention(q, k, v, layout=layout)
                            .astype(jnp.float32) ** 2).sum()
                return jax.grad(f)(q)
        else:
            def one(q, k, v, layout=layout):
                return flash_attention(q, k, v, layout=layout)

        @jax.jit
        def run(q, k, v, m, one=one):
            def body(i, q):
                out = one(q + jnp.bfloat16(1e-6) * i, k, v)
                return q + out.astype(q.dtype) * jnp.bfloat16(1e-6)
            return jax.lax.fori_loop(0, m, body, q).astype(jnp.float32).mean()

        float(run(q, k, v, 1))
        def timed(m):
            t0 = time.time(); float(run(q, k, v, m)); return time.time() - t0
        res = robust_slope(timed, args.n, retries=4)
        out = {"layout": layout, "S": S, "B": B, "bwd": args.bwd,
               "valid": res.valid}
        if res.valid:
            out["ms"] = round(res.per_iter_s * 1e3, 3)
            out["tf_s"] = round(flops / res.per_iter_s / 1e12, 1)
        else:
            out["reason"] = res.reason
        print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
