"""Serving demo/bench on the real chip: concurrent HTTP clients against
the batched inference server (mixgrpo_tpu/serve.py).

Uses a reduced FLUX (full 128 head_dim, hidden 512) at 256px so the
one-time remote compile is small; the serving mechanics measured — fixed
compiled batch, micro-batch co-scheduling, per-request seed noise rows —
are exactly the production path.  Prints one JSON line with throughput
and batching stats.  Run: python scripts/bench_serve.py
"""

import json
import sys
import threading
import time
import urllib.request

sys.path.insert(0, ".")


def main():
    import bench

    bench._enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
    from mixgrpo_tpu.sample import DualFluxPipeline
    from mixgrpo_tpu.serve import (
        InferenceServer, RequestBatcher, make_generate_fn,
    )

    cfg = FluxConfig(in_channels=64, hidden_size=512, num_heads=4,
                     depth_double=1, depth_single=2, pooled_dim=64,
                     context_dim=64)
    base = init_flux(jax.random.key(0), cfg)
    BATCH, STEPS, N_REQ = 4, 8, 16
    pipe = DualFluxPipeline(
        cfg, base, None, height=256, width=256, num_steps=STEPS,
        text_len=16, dtype=jnp.bfloat16, attn_impl="auto",
    )

    def encode(prompts):
        txt = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(16, cfg.context_dim)) for p in prompts
        ]).astype(np.float32)
        pooled = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(cfg.pooled_dim,)) for p in prompts
        ]).astype(np.float32)
        return txt, pooled

    batcher = RequestBatcher(
        make_generate_fn(pipe, encode), batch_size=BATCH, max_wait_ms=100.0
    )
    with InferenceServer(batcher, host="127.0.0.1", port=0) as srv:
        # warm: compile the rollout + noise programs
        t0 = time.time()
        batcher.submit("warmup", 0)
        t_compile = time.time() - t0

        def call(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/generate",
                data=json.dumps({"prompt": f"p{i % 6}", "seed": i}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                assert r.status == 200
                r.read()

        t0 = time.time()
        threads = [
            threading.Thread(target=call, args=(i,)) for i in range(N_REQ)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        stats = dict(batcher.stats)

    print(json.dumps({
        "metric": "serve_requests_per_sec_reduced_flux_256px",
        "requests": N_REQ,
        "wall_s": round(wall, 2),
        "req_per_s": round(N_REQ / wall, 2),
        "batches": stats["batches"],
        "padded_rows": stats["padded_rows"],
        "errors": stats["errors"],
        "compile_plus_first_s": round(t_compile, 1),
        "note": f"batch={BATCH}, {STEPS}-step latent-only pipeline; "
                "mechanics (co-batching, seed rows) are the production path",
    }))


if __name__ == "__main__":
    main()
