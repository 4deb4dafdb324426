"""Pallas flash-attention block-size sweep on the real chip.

Round-3 (VERDICT r2 item 3): retune block_q / block_k at the recipe
shapes — S=1536 (512px), S=2537 (720px, lane-UNALIGNED joint sequence),
S=2560 (the 128-aligned target), S=4608 (1024px) — after the kernel
started rounding the full-K block up to a 128-lane multiple.  Measures
forward and forward+backward per (S, block_q, block_k) and the XLA
reference, using bench.py timing conventions (chained fori_loop +
scalar fetch; slope over two loop lengths cancels tunnel overhead).

Run: python scripts/bench_attention.py [--seqs 1536,2537,2560] [--bwd]
Prints one JSON line per configuration.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqs", default="1536,2537,2560,4608")
    ap.add_argument("--block_q", default="256,512,1024")
    ap.add_argument("--block_k", default="full,1024",
                    help="'full' = auto single-pass full-K")
    ap.add_argument("--bwd", action="store_true", help="also time fwd+bwd")
    ap.add_argument("--xla", action="store_true", help="also time XLA attention")
    ap.add_argument("--n", type=int, default=8, help="timing loop length")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--valid", type=int, default=None,
                    help="valid key count < S: run with the model's padded "
                         "key mask (e.g. 2537 of 2560 at the 720px recipe)")
    ap.add_argument("--valid_mode", choices=["mask", "kv_valid", "all"],
                    default="kv_valid",
                    help="how --valid is applied: explicit (B,1,1,S) bool "
                         "mask (bias-add path) or the static kv_valid "
                         "prefix count (folds into the alignment mask; "
                         "the model's path since round 5)")
    args = ap.parse_args()

    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.ops.attention import _xla_attention
    from mixgrpo_tpu.ops.flash_attention import flash_attention
    from mixgrpo_tpu.utils.timing import robust_slope

    B, H, D = args.batch, 24, 128
    peak = 197e12

    # robust_slope validates the (0, n, 2n) triple and retries — round 3
    # recorded fwd_ms=-1.425 under tunnel jitter; an invalid measurement
    # now lands in the row as {"valid": false} instead of a garbage number
    def timed(fn, q, k, v, n):
        @jax.jit
        def run(q, k, v, m):
            def body(i, q):
                o = fn(q, k, v)
                return q + o.astype(q.dtype) * jnp.bfloat16(1e-6)
            return jax.lax.fori_loop(0, m, body, q).astype(jnp.float32).mean()

        float(run(q, k, v, 1))  # compile + warm

        def once(m):
            t0 = time.time()
            float(run(q, k, v, m))
            return time.time() - t0

        return robust_slope(once, n, retries=3)

    def timed_bwd(fn, q, k, v, n):
        g = jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v) ** 2), (0, 1, 2))

        @jax.jit
        def run(q, k, v, m):
            # the carry must consume ALL THREE grads: dk/dv come from a
            # separate pallas_call than dq in the two-kernel path, and a
            # dq-only carry lets XLA dead-code-eliminate the whole dkv
            # kernel (measured round 4: fwdbwd "223 TF/s" > chip peak)
            def body(i, q):
                dq, dk, dv = g(q, k, v)
                return q + (dq + dk + dv).astype(q.dtype) * jnp.bfloat16(1e-6)
            return jax.lax.fori_loop(0, m, body, q).astype(jnp.float32).mean()

        float(run(q, k, v, 1))

        def once(m):
            t0 = time.time()
            float(run(q, k, v, m))
            return time.time() - t0

        return robust_slope(once, n, retries=3)

    for S in (int(s) for s in args.seqs.split(",")):
        ks = jax.random.split(jax.random.key(S), 3)
        q, k, v = (jax.random.normal(kk, (B, H, S, D), jnp.bfloat16)
                   for kk in ks)
        def mk_mask(valid):
            # the model's padded-sequence key mask shape: (B, 1, 1, S)
            m = (jnp.arange(S) < valid)[None, None, None, :]
            return jnp.broadcast_to(m, (B, 1, 1, S))

        # (label, mask, kv_valid) variants measured in THIS session —
        # "all" runs the three masking modes back-to-back so the
        # comparison is immune to session-to-session tunnel drift
        if args.valid is None:
            modes = [("", None, None)]
        elif args.valid_mode == "kv_valid":
            modes = [("", None, args.valid)]
        elif args.valid_mode == "mask":
            modes = [("", mk_mask(args.valid), None)]
        else:  # all
            modes = [("nomask ", None, None),
                     ("mask ", mk_mask(args.valid), None),
                     ("kv_valid ", None, args.valid)]
        flops_fwd = 4 * B * H * S * S * D  # qk^T + pv
        rows = []

        def fwd_fields(res):
            if not res.valid:
                return {"valid": False, "invalid_reason": res.reason,
                        "fwd_ms": None}
            t = res.per_iter_s
            return {"valid": True, "fwd_ms": round(t * 1e3, 3),
                    "fwd_tfs": round(flops_fwd / t / 1e12, 1),
                    "fwd_mfu": round(flops_fwd / t / peak, 3)}

        def bwd_fields(res):
            if not res.valid:
                return {"fwdbwd_ms": None, "fwdbwd_valid": False,
                        "fwdbwd_invalid_reason": res.reason}
            tb = res.per_iter_s
            return {"fwdbwd_ms": round(tb * 1e3, 3),
                    "fwdbwd_tfs": round(3.5 * flops_fwd / tb / 1e12, 1)}

        if args.xla:
            row = {"impl": "xla"}
            row.update(fwd_fields(
                timed(lambda q, k, v: _xla_attention(q, k, v), q, k, v, args.n)
            ))
            row.pop("fwd_mfu", None)
            if args.bwd:
                row.update(bwd_fields(timed_bwd(
                    lambda q, k, v: _xla_attention(q, k, v), q, k, v, args.n)))
            rows.append(row)
        for bq_s in args.block_q.split(","):
            # "auto" = joint (block_q, block_k) selection (round 4):
            # full-K with the largest budget-fitting q block
            bq = None if bq_s == "auto" else int(bq_s)
            for bk_s in (("auto",) if bq is None else args.block_k.split(",")):
                bk = None if bk_s in ("full", "auto") else int(bk_s)
                for label, mask, kv_valid in modes:
                    fn = lambda q, k, v, bq=bq, bk=bk, mask=mask, \
                        kv_valid=kv_valid: flash_attention(
                        q, k, v, mask=mask, kv_valid=kv_valid,
                        block_q=bq, block_k=bk)
                    row = {"impl": f"pallas {label}bq={bq_s} bk={bk_s}"}
                    row.update(fwd_fields(timed(fn, q, k, v, args.n)))
                    if args.bwd:
                        row.update(bwd_fields(timed_bwd(fn, q, k, v, args.n)))
                    rows.append(row)
        print(json.dumps({"S": S, "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
