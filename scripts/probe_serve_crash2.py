"""Stage-2 isolation of the bf16 serve-recipe TPU worker crash.

Stage 1 (`probe_serve_crash.py`) cleared every sub-program: flash
attention at B=4/S=4608 (full-K AND chunked), the full-depth 1024px
forward, and the exact segment rollout program all run fine standalone.
The crash therefore lives in the composition.  This stage bisects it:

  1. pipeline_inline: full DualFluxPipeline warmup (both segments,
     MIX=30, bf16) called inline on the MAIN thread — no batcher, no
     HTTP, no persistent compile cache.
  2. pipeline_thread: the same warmup executed through RequestBatcher
     (the serving worker thread), still no HTTP.

If (1) crashes: two-segment program composition.  If only (2) crashes:
thread-context issue on the axon backend.  If neither: the persistent
compile cache (the only remaining delta vs bench_serve) — retry serve
with a fresh cache dir.

Run: python scripts/probe_serve_crash2.py
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    # NOTE: deliberately NOT enabling the persistent compile cache.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
    from mixgrpo_tpu.sample import DualFluxPipeline

    results = {}

    def phase(name, fn):
        t0 = time.time()
        try:
            out = fn()
            results[name] = {"ok": True, "s": round(time.time() - t0, 1),
                             **(out or {})}
        except Exception as e:  # noqa: BLE001
            results[name] = {"ok": False, "s": round(time.time() - t0, 1),
                             "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: results[name]}), flush=True)

    cfg = FluxConfig(in_channels=64, hidden_size=3072, num_heads=24,
                     depth_double=1, depth_single=2, pooled_dim=768,
                     context_dim=4096)
    base = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), init_flux(k, cfg)))(jax.random.key(0))
    HEIGHT, STEPS, MIX, TEXT = 1024, 50, 30, 512
    B = 4

    pipe = DualFluxPipeline(
        cfg, base, base, height=HEIGHT, width=HEIGHT, num_steps=STEPS,
        mix_sampling_steps=MIX, text_len=TEXT, dtype=jnp.bfloat16,
        attn_impl="auto", quant="none", virtual_depth=(19, 38),
    )
    txt = np.random.default_rng(0).normal(
        size=(B, TEXT, cfg.context_dim)).astype(np.float32)
    pooled = np.random.default_rng(1).normal(
        size=(B, cfg.pooled_dim)).astype(np.float32)

    def inline():
        out = pipe(jnp.asarray(txt), jnp.asarray(pooled), jax.random.key(2))
        return {"out_sum": float(np.asarray(out).sum())} and {}

    phase("pipeline_inline", inline)

    def threaded():
        from mixgrpo_tpu.serve import RequestBatcher, make_generate_fn

        def encode(prompts):
            n = len(prompts)
            return txt[:n].copy(), pooled[:n].copy()

        batcher = RequestBatcher(make_generate_fn(pipe, encode),
                                 batch_size=B, max_wait_ms=100.0)
        batcher.submit("warmup", 0)
        batcher.close()
        return {}

    phase("pipeline_thread", threaded)

    print(json.dumps({"metric": "probe_serve_crash2_1024px", **results}))


if __name__ == "__main__":
    main()
