#!/usr/bin/env python
"""Round-5 wgrad/dgrad MFU probe: batch-vs-M reshapes and dot orderings.

The round-4b update re-profile (`bench_results/round4b/prof512_upd_vjp`)
left the wgrad/dgrad matmul fusions themselves at 67-85% MFU as the
largest unexplained update-path cost (VERDICT r4 item 9).  This probe
times the SAME contractions the 4-pair update runs, in the same
scan-over-stacked-operands structure the trainer uses (see
probe_wgrad.py's probe-design note on hoisting), across the knobs JAX
actually exposes:

  wgrad (dL/dW = x^T dy, contracting over tokens):
    - flat        : (M,K) x (M,N) one dot, M = pairs*S  (what AD emits
                    when the forward flattened (B,S,K) -> (M,K))
    - multidim    : (B,S,K) x (B,S,N), TWO contracting dims (B and S) —
                    what AD emits when the forward kept the batch axis
    - bmm+sum     : B as a dot BATCH dim -> (B,K,N), then sum over B —
                    the layout torch/cuBLAS-style per-sample grads force
  dgrad (dL/dx = dy W^T, contracting over the weight's OUT dim):
    - wt_cotract  : (M,N) x (K,N) contracting N against N (what AD
                    emits: the weight is NOT materialized transposed)
    - wt_pre      : (M,N) x (N,K) against a pre-transposed weight copy
  epilogue:
    - flat+add    : wgrad + dense add into a resident f32 accumulator
                    (the cycle_scan VJP's real epilogue) with the HBM
                    roofline for the accumulator traffic printed next to
                    the measured cost.

Reference counterpart: none (torch autograd + cuBLAS heuristics choose
this silently).  Here the result decides whether the update path leaves
matmul MFU on the table at the JAX level — or closes VERDICT r4 #9 as
"XLA already at the shape roofline" with numbers.

Run (one shape per invocation to bound remote compile time):
  python scripts/probe_wgrad2.py --shape linear1 --pairs 4 --seq 1536
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from bench import _enable_compile_cache
from mixgrpo_tpu.utils.timing import robust_slope

_enable_compile_cache()


def _make_timer(step, init_carry, operand0):
    """Traced-bound fori_loop timer: ONE compile per case (the remote
    compile service takes minutes per program — a scan whose xs length
    is the loop count would recompile at every timing length).  The
    operand is chained through the loop with a negligible elementwise
    nudge (~0.1 ms HBM pass vs the ~4 ms dot) to defeat hoisting."""

    @jax.jit
    def run(carry, x, m):
        def body(i, state):
            c, x = state
            c = step(c, x)
            return c, x * (1 + 1e-12) + jnp.bfloat16(1e-9) * i
        c, _ = jax.lax.fori_loop(0, m, body, (carry, x))
        return jax.tree.map(lambda t: t.ravel()[0].astype(jnp.float32), c)

    def timed(m):
        t0 = time.time()
        res = run(init_carry, operand0, m)
        jax.tree.map(float, res)
        return time.time() - t0

    timed(1)  # compile + warm
    return timed


def probe(B: int, S: int, K: int, N: int, n: int = 8):
    key = jax.random.key(0)
    M = B * S
    dy_flat = jax.random.normal(key, (M, N), jnp.bfloat16)
    dy_b = dy_flat.reshape(B, S, N)
    w = jax.random.normal(key, (K, N), jnp.bfloat16)
    wt = jnp.swapaxes(w, 0, 1)
    acc = jnp.zeros((K, N), jnp.float32)
    flops_w = 2.0 * M * K * N
    flops_d = 2.0 * M * K * N

    x_flat = jax.random.normal(jax.random.key(1), (M, K), jnp.bfloat16)
    x_b = x_flat.reshape(B, S, K)
    dy_op = jax.random.normal(jax.random.key(2), (M, N), jnp.bfloat16)

    f32 = jnp.float32

    # Every variant accumulates its FULL gradient into a resident f32
    # accumulator — both because that is the real program's epilogue (the
    # cycle_scan VJP accumulates per-block dw with a dense add; dx is
    # written to HBM as the upstream cotangent either way) and because a
    # scalar-probe consume (``dw.ravel()[0]``) lets XLA slice-simplify
    # the dot down to one output element (first attempt "measured"
    # 52 PF/s).  The accumulator's read+write roofline is reported per
    # row so the bare-matmul share can be separated.

    # --- wgrad variants (dL/dW = x^T dy; the loop operand is x) ---
    def w_flat(a, x):
        dw = jax.lax.dot_general(x, dy_flat, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        return a + dw

    def w_multidim(a, x):
        dw = jax.lax.dot_general(x, dy_b, (((0, 1), (0, 1)), ((), ())),
                                 preferred_element_type=f32)
        return a + dw

    def w_bmm_sum(a, x):
        dw = jax.lax.dot_general(x, dy_b, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=f32).sum(0)
        return a + dw

    # --- dgrad variants (dL/dx = dy W^T; the loop operand is dy; the
    # weight is the same every step in the real program too, so its
    # residency is faithful) ---
    def d_contract(a, dy):
        dx = jax.lax.dot_general(dy, w, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        return a + dx

    def d_pre(a, dy):
        dx = jax.lax.dot_general(dy, wt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        return a + dx

    acc_x = jnp.zeros((M, K), jnp.float32)
    cases = [
        ("wgrad flat", w_flat, acc, x_flat, flops_w, K * N),
        ("wgrad multidim", w_multidim, acc, x_b, flops_w, K * N),
        ("wgrad bmm+sum", w_bmm_sum, acc, x_b, flops_w, K * N),
        ("dgrad contractN", d_contract, acc_x, dy_op, flops_d, M * K),
        ("dgrad pre-T", d_pre, acc_x, dy_op, flops_d, M * K),
    ]
    rows = []
    for name, step, carry, operand, flops, acc_elems in cases:
        st = robust_slope(_make_timer(step, carry, operand), n=n)
        ms = st.per_iter_ms
        row = {
            "variant": name,
            "valid": st.valid,
            "ms": None if ms is None else round(ms, 3),
            "tfs": None if ms is None else round(flops / (ms * 1e-3) / 1e12, 1),
            "mfu": None if ms is None else round(
                flops / (ms * 1e-3) / 197e12, 3),
        }
        if ms is not None:
            # HBM roofline for the epilogue: f32 accumulator read+write at
            # the v5e's ~819 GB/s, on top of the bare matmul time
            row["acc_roofline_ms"] = round(acc_elems * 8 / 819e9 * 1e3, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=4,
                    help="update batch B (4-pair recipe update)")
    ap.add_argument("--seq", type=int, default=1536,
                    help="joint tokens per pair (512px: 1536; 720px: 2560)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--shape",
                    choices=["linear1", "linear2", "qkv", "attnout"],
                    default="linear1")
    args = ap.parse_args()
    shapes = {
        "linear1": (3072, 21504),  # single-stream fused in+mlp
        "linear2": (15360, 3072),  # single-stream fused out
        "qkv": (3072, 9216),
        "attnout": (3072, 3072),
    }
    K, N = shapes[args.shape]
    print(f"# {args.shape} B={args.pairs} S={args.seq} K={K} N={N}",
          flush=True)
    rows = probe(args.pairs, args.seq, K, N, n=args.steps)
    print(json.dumps({
        "metric": "wgrad_dot_orderings",
        "shape": args.shape, "pairs": args.pairs, "seq": args.seq,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
