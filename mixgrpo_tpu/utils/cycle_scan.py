"""Weight-cycling scan with a hand-written VJP that accumulates block
gradients with dense in-place adds.

``cycle_scan(body, carry, stack, n, k)`` applies ``body`` ``n`` times,
cycling a ``k``-deep stacked weight pytree (``k`` must divide ``n``).  It
is the differentiable engine behind ``flux_forward(virtual_depth=...)``
(models/flux/model.py) — the single-chip emulation of a full-depth FLUX
update when the full parameter set exceeds one chip's HBM.

Why not plain autodiff of the nested scan: the scan-transpose of the
(outer cycles x inner stack) nesting accumulates the stack cotangent in
two stages — the inner transpose DUS-materializes a per-cycle ``(k, ...)``
gradient buffer, then the outer transpose adds the whole buffer into the
carried accumulator.  XLA cannot fuse across the two scans, so every
block visit pays a materialize + whole-stack read-modify-write: at FLUX
width that is ~450 MB of extra HBM traffic per visit, measured at
195 ms/update-iter as ``%bitcast_dynamic-update-slice_fusion`` in the
512px profile (PERF.md, bench_results/round4/prof512_upd).

This VJP instead:
  - forward: saves only the per-visit *input carries* (exactly what the
    checkpointed nested scan saved — no memory delta) and recomputes
    block internals in the backward (full per-block rematerialization);
  - backward: one reverse scan over cycles; the ``k`` inner visits are
    Python-unrolled so every block gradient lands in its own dense
    accumulator with a plain ``acc + dw`` add — no dynamic-update-slice
    anywhere, which XLA fuses into the wgrad matmul's epilogue (the
    ``convolution_add`` fusion).  The ``(k, ...)`` stacked gradient is
    assembled once at the end.

No dynamic weight gathers appear in the differentiated program (the
round-2 remote-compile blowup was the scan-transpose of ``w[i % k]``
gathers — see flux_forward's docstring), and ``i % k`` block selection
is static because ``k | n``.

``body`` may close over tracers (modulation vectors, RoPE tables,
attention masks): ``jax.closure_convert`` hoists them into explicit
differentiable constants whose cotangents are accumulated alongside the
stack gradient (non-inexact consts get ``float0`` cotangents).

Reference counterpart: none — torch autograd accumulates ``.grad``
in-place natively (zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:
536-615 relies on it); this module recovers the same in-place
accumulation structure under XLA's functional autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes


def cycle_scan(body, carry, stack, n: int, k: int):
    """``n`` applications of ``body`` cycling a ``k``-deep weight stack.

    ``body(carry, block) -> (carry, ignored)`` — the ``lax.scan`` body
    contract; the second output must be None (nothing is stacked).
    ``stack`` is a pytree whose leaves all have leading dim ``k``;
    visit ``i`` uses block ``i % k``.  Requires ``k | n``.

    Differentiable in ``carry``, ``stack``, and any tracer the body
    closes over.  Do NOT pre-wrap ``body`` in ``jax.checkpoint``: the
    VJP rematerializes per block by construction (saving input carries
    only), and a remat annotation would only add noise to the jaxpr.
    """
    if n % k:
        raise ValueError(f"cycle_scan needs k | n, got n={n} k={k}")

    example_block = jax.tree.map(lambda w: w[0], stack)
    flat_args, in_tree = jax.tree.flatten((carry, example_block))

    def flat_body(*flat):
        c, p = jax.tree.unflatten(in_tree, flat)
        c2, rest = body(c, p)
        if rest is not None:
            raise ValueError("cycle_scan bodies must not stack outputs")
        return c2

    # Hand-rolled closure conversion: hoist EVERY traced constant the body
    # closes over into explicit custom_vjp inputs.  ``jax.closure_convert``
    # hoists only perturbable (inexact-dtype) tracers, so a closed-over
    # bool attention mask would leak across the custom_vjp boundary as an
    # escaped tracer; here non-inexact consts become inputs too and get
    # float0 cotangents in the backward.
    closed_jaxpr, out_shape = jax.make_jaxpr(flat_body, return_shape=True)(
        *flat_args
    )
    out_tree = jax.tree.structure(out_shape)

    def closed(c, p, *cs):
        flat = jax.tree.leaves((c, p))
        outs = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, cs, *flat)
        return jax.tree.unflatten(out_tree, outs)

    return _cycle_scan(closed, n // k, k, carry, stack,
                       tuple(closed_jaxpr.consts))


def _split_blocks(stack, k: int):
    """Static per-block slices of the stacked pytree (free at trace time;
    XLA materializes contiguous leading-dim slices at most once)."""
    return [jax.tree.map(lambda w, j=j: w[j], stack) for j in range(k)]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _cycle_scan(closed, cycles: int, k: int, carry, stack, consts):
    blocks = _split_blocks(stack, k)

    def cycle(c, _):
        for j in range(k):
            c = closed(c, blocks[j], *consts)
        return c, None

    out, _ = jax.lax.scan(cycle, carry, None, length=cycles)
    return out


def _cycle_scan_fwd(closed, cycles: int, k: int, carry, stack, consts):
    blocks = _split_blocks(stack, k)

    def cycle(c, _):
        saved = []
        for j in range(k):
            saved.append(c)
            c = closed(c, blocks[j], *consts)
        return c, tuple(saved)

    out, saved = jax.lax.scan(cycle, carry, None, length=cycles)
    return out, (saved, stack, consts)


def _cycle_scan_bwd(closed, cycles: int, k: int, res, dout):
    saved, stack, consts = res
    blocks = _split_blocks(stack, k)

    def f(c, p, cs):
        return closed(c, p, *cs)

    # Only inexact consts carry real cotangents through the scan; bool /
    # integer consts (attention masks) get float0 zeros at the end.
    diff_idx = tuple(
        i for i, c in enumerate(consts)
        if jnp.issubdtype(jnp.asarray(c).dtype, jnp.inexact)
    )

    accs0 = tuple(jax.tree.map(jnp.zeros_like, b) for b in blocks)
    dconsts0 = tuple(jnp.zeros_like(consts[i]) for i in diff_idx)

    def add(a, g):
        if g is None or getattr(g, "dtype", None) == dtypes.float0:
            return a
        return a + g.astype(a.dtype)

    def cycle_bwd(carrybar, saved_cycle):
        dc, accs, dcs_acc = carrybar
        accs = list(accs)
        for j in reversed(range(k)):
            _, vjp_fn = jax.vjp(f, saved_cycle[j], blocks[j], consts)
            dc, dp, dcs = vjp_fn(dc)
            # dense adds: one fused read-modify-write per block gradient
            accs[j] = jax.tree.map(add, accs[j], dp)
            dcs_acc = tuple(
                add(a, dcs[i]) for a, i in zip(dcs_acc, diff_idx)
            )
        return (dc, tuple(accs), dcs_acc), None

    (dcarry, accs, dcs_acc), _ = jax.lax.scan(
        cycle_bwd, (dout, accs0, dconsts0), saved, reverse=True
    )

    dstack = jax.tree.map(lambda *xs: jnp.stack(xs), *accs)

    dconsts = []
    it = iter(dcs_acc)
    for i, c in enumerate(consts):
        if i in diff_idx:
            dconsts.append(next(it))
        else:
            dconsts.append(np.zeros(np.shape(c), dtypes.float0))
    return dcarry, dstack, tuple(dconsts)


_cycle_scan.defvjp(_cycle_scan_fwd, _cycle_scan_bwd)
