#!/usr/bin/env python
"""Isolate the update path's wgrad cost: matmul vs accumulation structure.

The 512px update profile (bench_results/round4/prof512_upd) shows the
wgrad convolutions (`%convolution_add_fusion.29/.30`, 328 ms/iter
combined) and the stacked-grad accumulation DUS
(`%bitcast_dynamic-update-slice_fusion.21`, 195 ms/iter) as the two
largest non-attention costs.  This probe times the same shapes in the
same program structure the trainer uses — a `lax.scan` over stacked
per-step operands accumulating into a carry — so the round-5 attack
knows whether the time is (a) the bare x^T@dy matmul, (b) the dense add
into a resident f32 accumulator, or (c) the dynamic-update-slice into a
stacked (k, ...) grad buffer (the cycle-scan transpose pattern).

Probe-design note (first two attempts, kept as a warning): fori_loop
microbenches with loop-invariant operands are unusable here — a scalar
multiply commutes out of the dot and the whole matmul hoists
(`532 TF/s` readings), and carry buffers whose layout the compiler
cannot co-design with the dot produce pathological fused scatters
(24-45 ms for a 2.5 ms matmul).  Scanning over *stacked distinct
inputs*, like the real trainer, avoids both.

Single-block FLUX wgrad shapes (hidden 3072): linear1 (3072 -> 21504),
linear2 (15360 -> 3072).  Reference counterpart: none — torch autograd
fuses this; the measurement matters here because the nested-scan
virtual-depth transpose is the TPU-specific structure that produces (c).

Bounded-duration device calls; validated slope timing (utils/timing.py).
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

_enable_compile_cache()  # 9 scan programs per shape; cache across runs


def _time_scan(make_step, init_carry, xs_for, m):
    """Compile a scan of ``m`` steps over stacked inputs; time one call."""

    @functools.partial(jax.jit, static_argnums=())
    def run(carry, xs):
        carry, _ = jax.lax.scan(make_step, carry, xs)
        return jax.tree.map(lambda x: x.ravel()[0].astype(jnp.float32), carry)

    xs = xs_for(m)
    t0 = time.time()
    res = run(init_carry, xs)
    jax.tree.map(float, res)
    return time.time() - t0


def probe(M: int, K: int, N: int, stack_k: int = 2, n: int = 8):
    key = jax.random.key(0)
    dy = jax.random.normal(key, (M, N), jnp.bfloat16)
    acc = jnp.zeros((K, N), jnp.float32)
    stack = jnp.zeros((stack_k, K, N), jnp.float32)
    flops = 2.0 * M * K * N

    def xs_for(m):
        # distinct per-step x operands, like the trainer's per-step
        # activations — nothing is loop-invariant enough to hoist
        return jax.random.normal(jax.random.key(m + 1), (m, M, K), jnp.bfloat16)

    def _dw(x):
        return jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # (a) bare wgrad matmul: carry only a scalar checksum
    def mm(s, x):
        return s + _dw(x).ravel()[0] * 1e-20 + 1, None

    # (b) wgrad + dense add into a resident f32 accumulator
    def mm_add(acc, x):
        return acc + _dw(x), None

    # (c) wgrad + DUS-accumulate into the stacked grad buffer
    def mm_dus(carry, x):
        stack, i = carry
        dw = _dw(x)
        sl = jax.lax.dynamic_slice_in_dim(stack, i % stack_k, 1, 0)
        upd = sl + dw[None]
        return (
            jax.lax.dynamic_update_slice_in_dim(stack, upd, i % stack_k, 0),
            i + 1,
        ), None

    rows = []
    for name, step, carry in (
        ("matmul", mm, jnp.float32(0)),
        ("matmul+add", mm_add, acc),
        ("matmul+dus", mm_dus, (stack, jnp.int32(0))),
    ):
        st = robust_slope(
            lambda m, s=step, c=carry: _time_scan(s, c, xs_for, m), n=n
        )
        ms = st.per_iter_ms
        acc_bytes = 2.0 * K * N * 4  # accumulator read + write per step
        rows.append({
            "variant": name,
            "valid": st.valid,
            "ms": None if ms is None else round(ms, 3),
            "tfs": None if ms is None else round(flops / (ms * 1e-3) / 1e12, 1),
            "acc_gbs": None if ms is None else round(
                acc_bytes / (ms * 1e-3) / 1e9, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=3072,
                    help="M = B*S rows feeding the wgrad (512px 2-pair: 3072)")
    ap.add_argument("--steps", type=int, default=8, help="scan length n")
    ap.add_argument("--shape", choices=["linear1", "linear2", "both"],
                    default="both", help="probe one shape per run to bound "
                    "remote-compile time per invocation")
    args = ap.parse_args()
    shapes = {
        "linear1": (3072, 21504),
        "linear2": (15360, 3072),
    }
    if args.shape != "both":
        shapes = {args.shape: shapes[args.shape]}
    out = {"metric": "wgrad_probe", "tokens": args.tokens, "shapes": {}}
    for label, (K, N) in shapes.items():
        print(f"# {label} M={args.tokens} K={K} N={N}", flush=True)
        out["shapes"][label] = probe(args.tokens, K, N, n=args.steps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
