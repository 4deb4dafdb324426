"""Benchmark: FLUX-dev rollout throughput per chip (512px, 25 steps).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Method (MEASURED, not extrapolated): the full 11.9B-param FLUX-dev does
not fit a single v5e (16 GB HBM; bf16 weights alone are 24 GB), so the
forward is run at full width (hidden 3072, 24 heads x 128, S = 512 txt +
1024 img tokens @512px) with ``virtual_depth=(19, 38)``: all 19 double and
38 single block applications execute on-chip, cycling 1 resident double /
2 resident single weight stacks (static-slice cycling; see DD, DS below).
Per block application the MXU compute and the HBM weight stream are
exactly those of the full model (each application streams one block's
weights from HBM — weight *values* repeat, the program and traffic do
not change), so the wall-clock is the true full-depth forward time minus
only the one-time 24 GB residency.

rollout images/sec/chip = 1 / (25 steps x t_per_image), with the forward
measured at the recipe's batched rollout shape (B=2; the per-block weight
stream amortizes over the batch — see BATCH below).

vs_baseline: the reference publishes no numbers (BASELINE.md); we compare
*MXU utilization* against an assumed 40% MFU for the reference's
FlashAttention-2 + FSDP GPU rollout (a generous estimate for a 12B DiT in
bf16 with sequential 25-step sampling):
    vs_baseline = our_MFU / 0.40
so >1.0 means this implementation extracts more of its chip than the
reference stack extracts of its GPU on the same recipe.

Reliability (round 4, after BENCH_r03 harvested rc=1 on a dead tunnel):
``python bench.py`` now runs a SUPERVISOR that executes the measurement
in a child process (``--child``) with a hard timeout, retrying with
backoff on any failure — backend-init errors, wedged-tunnel hangs, or
invalid timing triples.  In-process retry cannot recover a failed
backend (JAX caches the backend object), so each retry is a fresh
process.  The child pre-flights a 1 s smoke program, validates every
timing triple (mixgrpo_tpu/utils/timing.py), keeps each device
execution bounded (< ~3 s per call at n=4), and re-runs the smoke
program after measuring so a worker killed *by* the run is detected
here rather than at the next harvest.

Timing notes: on the tunneled axon backend ``block_until_ready`` does not
synchronize, and every distinct jit is compiled remotely (minutes).  We use
one jitted program with a *traced* loop bound, chain iterations through the
data to defeat loop-invariant hoisting, end timing with a scalar host
fetch, and difference loop lengths (0, n, 2n) to cancel the fixed tunnel
overhead.  A persistent compilation cache makes repeat runs fast.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Resident stack depths for the weight-cycling emulation.  (1, 2) DIVIDE
# the true depths (19, 38), so flux_forward cycles them with STATIC
# per-block slices (cycle_scan nested scan) instead of the w[i % k]
# modular dynamic-tree-gather the old (2, 4) stacks forced — the same
# weight-delivery structure a real full-depth scan has (weights stream
# as scan xs; no per-step index gather).  Measured round 5
# (scripts/probe_cycle_layout.py, bench_results/round5/): 512px B=2
# full-depth forward 134.7 -> 131.4 ms/img (+2.5%); gather-scan
# unroll=2 measured WORSE (136.2).  Same per-application MXU compute
# and HBM weight traffic either way (neither stack fits VMEM, so every
# application re-streams its block) — only weight *values* repeat more
# often, which timing cannot see.  bench_e2e.py and bench_serve.py
# already used (1, 2); the headline now matches their methodology.
DD, DS = 1, 2  # resident stack depth (double, single)
FULL_DD, FULL_DS = 19, 38
HEIGHT = 512
TEXT_LEN = 512
STEPS = 25
# Batched rollout at the measured per-image optimum (B=2 knee).  The
# trainer's production rollout batch is n_prompts x G with G=12
# (train.py, config.py num_generations=12), NOT 2; at full virtual
# depth the per-block HBM weight stream amortizes over the batch and
# the per-image knee is B=2: measured per-image fwd 144.6 ms (B=1) /
# 134.7 (B=2) / 138.0 (B=4) (scripts/probe_batched_headline.py).  The
# headline measures B=2 and reports per-image throughput; the
# production-batch (B=12) per-image number is recorded alongside in
# the JSON (b12_per_image_note) so the headline's batch choice is
# explicit rather than implied to be the production shape.
BATCH = 2

# ---------------------------------------------------------------------------
# Fleet parity, strict chip-normalized frame (PERF.md "Fleet math"): the
# SECOND scoreboard basis next to the MFU-ratio vs_baseline above, so the
# JSON a dashboard reads carries both the flattering and the strict number.
# All inputs are 720px-recipe phase measurements from scripts/bench_e2e.py
# (artifacts under bench_results/; re-measured each round — see PERF.md
# "Recipe-shape iteration at 720px").  Assumptions stated inline.
RECIPE_PHASES_720 = {
    # phase: (seconds per recipe iteration per chip, measured MFU)
    "rollout": (74.4, 0.77),   # 12 rollouts x 25 steps, B=2 batched
    "update": (51.4, 0.71),    # 48 PPO pairs, remat full, cycle_scan VJP
}
V5P_BF16_PEAK = 459e12         # north-star fleet chip (BASELINE.md: v5p-32)
REF_GPU_BF16_PEAK = 990e12     # H800-class dense bf16 peak (assumed fleet)
REF_GPU_MFU_ASSUMED = 0.40     # same assumption as vs_baseline
FLEET_PARITY_BASIS = (
    "chip-normalized strict frame (PERF.md fleet math): phase-weighted"
    " measured 720px-recipe MFU x v5p bf16 peak (459 TF/s) over an"
    " assumed 40%-MFU H800-class reference chip (990 TF/s dense bf16);"
    " same chip count (32). <1.0 means the bf16 recipe is slower than"
    " the assumed reference fleet; the int8 rollout mode and"
    " MixGRPO-Flash each clear 1.0 independently (PERF.md)."
)
B12_NOTE = (
    "the one-call production rollout batch G=12 measured 145.5 ms/img"
    " @512px full depth vs 134.7 at the B=2 knee (+8%); the trainer"
    " therefore chunks the group rollout at the knee"
    " (config.grpo.rollout_chunk, default 2)"
    " (bench_results/round5/probe_batched_b12.json)"
)


def _fleet_parity_bf16() -> float:
    t_total = sum(t for t, _ in RECIPE_PHASES_720.values())
    mfu_mix = sum(t * m for t, m in RECIPE_PHASES_720.values()) / t_total
    ours = mfu_mix * V5P_BF16_PEAK
    ref = REF_GPU_MFU_ASSUMED * REF_GPU_BF16_PEAK
    return round(ours / ref, 3)


# supervisor policy: fresh-process attempts with backoff.  The first cold
# attempt may remote-compile for minutes; later attempts hit .jax_cache.
ATTEMPTS = 3
CHILD_TIMEOUT_S = [2400, 1500, 1500]
BACKOFF_S = [30, 120]


def _enable_compile_cache():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _build():
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux import (
        FluxConfig, flux_forward, init_flux, make_image_ids, make_text_ids,
        rope_tables,
    )

    cfg = FluxConfig(
        in_channels=64, hidden_size=3072, num_heads=24,
        depth_double=DD, depth_single=DS, pooled_dim=768, context_dim=4096,
    )
    params = jax.jit(
        lambda k: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), init_flux(k, cfg)
        )
    )(jax.random.key(0))
    lh = lw = HEIGHT // 8
    B = BATCH
    key = jax.random.key(1)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), 64), jnp.bfloat16)
    txt = jax.random.normal(key, (B, TEXT_LEN, 4096), jnp.bfloat16)
    pooled = jax.random.normal(key, (B, 768), jnp.bfloat16)
    ids = np.concatenate([make_text_ids(TEXT_LEN), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims)

    def step(params, z, t):
        return flux_forward(
            params, cfg, z, txt, pooled, t, jnp.full((B,), 3.5), cos, sin,
            dtype=jnp.bfloat16, attn_impl="auto", remat=False,
            virtual_depth=(FULL_DD, FULL_DS),
        )

    from mixgrpo_tpu.ops.quant import quantize_flux_params

    qparams = jax.jit(quantize_flux_params)(params)
    return step, params, qparams, img


def _time_forward(step, params, img, n=10):
    import jax
    import jax.numpy as jnp

    from mixgrpo_tpu.utils.timing import robust_slope

    @jax.jit
    def run(params, z, m):
        def body(i, z):
            t = jnp.full((z.shape[0],), 0.5) + 1e-6 * i
            out = step(params, z, t)
            return z + out.astype(z.dtype) * jnp.bfloat16(1e-6)
        return jax.lax.fori_loop(0, m, body, z).astype(jnp.float32).mean()

    float(run(params, img, 1))  # compile + warm

    def timed(m):
        t0 = time.time()
        float(run(params, img, m))
        return time.time() - t0

    # slope over (0, n, 2n) cancels the fixed tunnel overhead; the triple
    # is validated (monotone, positive slope) and retried under jitter
    res = robust_slope(timed, n, retries=4)
    if not res.valid:
        raise RuntimeError(f"timing never settled: {res.reason}")
    return res.per_iter_s


def _child():
    from mixgrpo_tpu.utils.timing import backend_smoke

    _enable_compile_cache()
    smoke_s = backend_smoke()  # pre-flight: fail fast if the backend is down
    step, params, qparams, img = _build()
    # t_full is the MEASURED wall-clock of one full-depth (19+38 block
    # applications) batched (B=BATCH) forward on the real chip; the
    # headline is per-image throughput at the recipe's batched rollout
    t_full = _time_forward(step, params, img, n=4)
    t_per_img = t_full / BATCH
    imgs_per_sec = 1.0 / (STEPS * t_per_img)
    # opt-in int8 rollout mode (--rollout_quant int8, ops/quant.py).
    # Secondary metric: a failure here (e.g. the tunnel wedging during
    # the second long compile) must not lose the measured bf16 headline.
    try:
        t_int8 = _time_forward(step, qparams, img, n=4)
        int8_imgs_per_sec = round(BATCH / (STEPS * t_int8), 4)
    except Exception:  # noqa: BLE001
        int8_imgs_per_sec = None

    # post-flight: confirm the worker survived the measurement (a run that
    # kills the chip must fail HERE, not at the next harvest)
    backend_smoke()

    S = TEXT_LEN + (HEIGHT // 16) ** 2
    # Per-TOKEN matmul params only (adaLN modulation heads act on the
    # (B, hidden) conditioning vector, not per token, and are negligible at
    # B=1).  In a double-stream block each token passes through exactly ONE
    # stream's weights (txt tokens through txt_{qkv,attn_out,mlp}, img
    # through img_*), so the per-token weight load is one stream:
    # qkv 3072x9216 + out 3072^2 + mlp 2x3072x12288 = 113.25M — NOT the
    # block's total 226.5M across both streams.  Single block: fused
    # linear1 3072x21504 + linear2 15360x3072 = 113.3M, all joint tokens.
    params_per_token_d, params_per_token_s = 113.25e6, 113.3e6
    params_full = FULL_DD * params_per_token_d + FULL_DS * params_per_token_s + 13e6
    attn_flops = lambda L: 4 * S * S * 3072 * L  # qk^T + pv per joint layer
    flops_full = 2 * params_full * S + attn_flops(FULL_DD + FULL_DS)

    peak = 197e12  # v5e bf16 peak
    mfu = flops_full / (t_per_img * peak)  # per-image flops over per-image time
    # the reference publishes no throughput (BASELINE.md `published: {}`),
    # so vs_baseline is an MFU claim: our measured MFU over an assumed 40%
    # MFU for the reference's FlashAttention-2 GPU rollout stack
    vs_baseline = mfu / 0.40

    print(json.dumps({
        "metric": "rollout_images_per_sec_per_chip_512px_fluxdev",
        "value": round(imgs_per_sec, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "measured": "full-depth 19+38 block applications executed on-chip"
                    " (weight-cycled residency), batched rollout at the"
                    " measured B=2 per-image knee (the production rollout"
                    " batch is G=12; its per-image time is recorded in"
                    " b12_per_image_note); value is measured, not"
                    " extrapolated",
        "mfu": round(mfu, 4),
        "vs_baseline_basis": "measured MFU / assumed 0.40 reference GPU MFU"
                             " (no published reference numbers)",
        "fleet_parity_bf16": _fleet_parity_bf16(),
        "fleet_parity_basis": FLEET_PARITY_BASIS,
        "b12_per_image_note": B12_NOTE,
        "int8_rollout_value": int8_imgs_per_sec,
        "int8_rollout_note": "opt-in --rollout_quant int8 behavior policy"
                             " (ops/quant.py); same measured full-depth"
                             " method; bf16 is the default/headline",
        "smoke_s": round(smoke_s, 2),
    }))


def _extract_json_line(text: str):
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    """Supervisor: run the measurement child with timeout + retry/backoff.

    A failed/expired/hung attempt never poisons the next one because each
    attempt is a new process with a fresh backend handshake.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    errors = []
    for attempt in range(ATTEMPTS):
        if attempt > 0:
            delay = BACKOFF_S[min(attempt - 1, len(BACKOFF_S) - 1)]
            print(f"[bench] attempt {attempt} failed; retrying in {delay}s",
                  file=sys.stderr, flush=True)
            time.sleep(delay)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                capture_output=True, text=True, cwd=here,
                timeout=CHILD_TIMEOUT_S[min(attempt, len(CHILD_TIMEOUT_S) - 1)],
            )
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {attempt + 1}: child timeout")
            continue
        payload = _extract_json_line(proc.stdout)
        if proc.returncode == 0 and payload is not None:
            print(json.dumps(payload))
            return 0
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()
        errors.append(
            f"attempt {attempt + 1}: rc={proc.returncode} "
            + " | ".join(tail[-3:])[:400]
        )
    print(json.dumps({
        "metric": "rollout_images_per_sec_per_chip_512px_fluxdev",
        "value": None,
        "unit": "img/s/chip",
        "vs_baseline": None,
        "error": f"all {ATTEMPTS} attempts failed (TPU backend/tunnel down?)",
        "attempts": errors,
    }))
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        _child()
    else:
        sys.exit(main())
