"""Batched FLUX inference server — the serving layer of the framework.

The reference stops at a CLI sampling script
(zqqqqz2000/MixGRPO fastvideo/sample/sample_flux.py); for production
serving a TPU wants a *resident* compiled program fed at a fixed batch
size.  This module provides that:

- ``RequestBatcher``: a queue + single device-worker thread that groups
  incoming requests into micro-batches of the compiled batch size
  (padding the tail), so every request rides the same jitted rollout
  program — **no recompiles, one dispatch per batch**, and the MXU sees
  a full batch even under ragged arrival.  With the optional LATENCY
  TIER (``generate_fn_single``) a request that arrives alone rides a
  second batch-1 compiled program instead of a padded batch, putting
  concurrency-1 p50 at ~1x image time; exactly two programs exist.
- ``InferenceServer``: stdlib ThreadingHTTPServer.  ``POST /generate``
  with ``{"prompt": str, "seed": int?}`` returns the PNG (or base64 JSON
  with ``"format": "json"``); ``GET /healthz`` liveness; ``GET /stats``
  batching counters.

TPU-native design points: static shapes (fixed B, fixed text length) keep
XLA from recompiling; prompt encoding (T5/CLIP towers) and the rollout
run as exactly two jitted programs; the HTTP threads only enqueue, so
device dispatch order is a single worker's — no interleaving hazards.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np


@dataclass
class _Request:
    prompt: str
    seed: int
    done: threading.Event = field(default_factory=threading.Event)
    image: Optional[np.ndarray] = None
    error: Optional[str] = None
    ts: float = field(default_factory=time.time)  # enqueue time


class RequestBatcher:
    """Groups requests into fixed-size micro-batches for one device worker.

    ``generate_fn(prompts, seeds) -> images01 (B, H, W, 3)`` is called with
    exactly ``batch_size`` rows (tail requests are padded by repeating the
    last row; padded outputs are dropped).  ``max_wait_ms`` bounds the
    latency a lone request pays waiting for co-batching.
    """

    def __init__(
        self,
        generate_fn: Callable[[Sequence[str], Sequence[int]], np.ndarray],
        batch_size: int = 4,
        max_wait_ms: float = 50.0,
        generate_fn_single: Optional[
            Callable[[Sequence[str], Sequence[int]], np.ndarray]
        ] = None,
    ):
        """``generate_fn_single``, when given, is the LATENCY TIER: a
        second compiled program at batch 1.  A request that arrives alone
        (queue empty after ``max_wait_ms``) rides it instead of paying
        ``batch_size - 1`` padded rows — p50 at concurrency 1 drops from
        ~batch-time to ~1x image time.  Under load, co-batches still ride
        the batched program, so burst throughput is unchanged.  Exactly
        two programs are ever compiled (shapes are static for XLA); at
        FLUX sizes B=1 already saturates the MXU (PERF.md batched-forward
        row) so the tier costs no meaningful throughput even when it
        fires."""
        self.generate_fn = generate_fn
        self.generate_fn_single = generate_fn_single
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1e3
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "padded_rows": 0,
                      "errors": 0, "single_dispatches": 0}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, prompt: str, seed: int, timeout: float = 600.0) -> np.ndarray:
        req = _Request(prompt=prompt, seed=seed)
        self.queue.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.image

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)
        # release any waiters still queued (their submit() would otherwise
        # block for its full timeout)
        while True:
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                break
            req.error = "server shutting down"
            req.done.set()

    # -- worker ----------------------------------------------------------
    def _take_batch(self):
        try:
            first = self.queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._take_batch()
            if not batch:
                continue
            n = len(batch)
            use_single = n == 1 and self.generate_fn_single is not None
            pad = 0 if use_single else self.batch_size - n
            prompts = [r.prompt for r in batch] + [batch[-1].prompt] * pad
            seeds = [r.seed for r in batch] + [batch[-1].seed] * pad
            fn = self.generate_fn_single if use_single else self.generate_fn
            try:
                images = np.asarray(fn(prompts, seeds))
                for i, r in enumerate(batch):
                    r.image = images[i]
                if use_single:
                    self.stats["single_dispatches"] += 1
            except Exception as e:  # surface to all waiters, keep serving
                self.stats["errors"] += 1
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
            self.stats["requests"] += n
            self.stats["batches"] += 1
            self.stats["padded_rows"] += pad
            for r in batch:
                r.done.set()


class ContinuousEngine:
    """Device side of continuous batching: one jitted chunk program that
    advances every slot row by up to ``chunk`` ODE steps, where each row
    carries its OWN global step offset (data, not shape).

    The rollout's sigma schedule is shared across a batch in the training
    path; for serving, per-row ``offsets`` index a (T+1,) sigma table so
    rows at different trajectory positions ride ONE dispatch — that is
    what lets new requests join the resident batch at a chunk boundary
    instead of waiting out whole batches (VERDICT r4 #7).  Rows with
    ``offset >= t_end`` pass through frozen (the forward still computes
    them — identical cost to the padded fixed-batch program).

    The step math is the deterministic flow-matching Euler step —
    identical to what ``solvers/rollout.py`` executes for the inference
    pipeline (eta=0: ``z' = z + (sigma_prev - sigma) * v``), with the
    reference's timestep quantization applied by ``make_model_fn``
    (sampler.py:30-32; reference sampling_utils.py:64-71).
    """

    def __init__(self, pipeline):
        import jax

        sampler = pipeline._seg1 or pipeline._seg2
        self._sampler = sampler
        self.T = pipeline.num_steps
        self.chunk = pipeline._chunk or pipeline.num_steps
        self.sigmas = np.asarray(pipeline.sigmas, np.float32)  # (T+1,)
        self._fn = jax.jit(self._impl)

    def _impl(self, params, z, txt, pooled, offsets, t_end, sig):
        import jax
        import jax.numpy as jnp

        from mixgrpo_tpu.sampler import make_model_fn

        s = self._sampler
        model_fn = make_model_fn(
            params, s.flux_cfg, txt, pooled, s.guidance_scale,
            s.rope_cos, s.rope_sin, dtype=s.dtype, attn_impl=s.attn_impl,
            remat=False, virtual_depth=s.virtual_depth,
        )

        def body(zc, i):
            idx = jnp.clip(offsets + i, 0, self.T - 1)
            sigma = jnp.take(sig, idx)  # (B,) per-row
            sigma_prev = jnp.take(sig, idx + 1)
            pred = model_fn(zc, sigma).astype(jnp.float32)
            dt = (sigma_prev - sigma)[:, None, None]
            live = (offsets + i) < t_end
            zc = jnp.where(live[:, None, None], zc + dt * pred, zc)
            return zc, None

        z, _ = jax.lax.scan(body, z.astype(jnp.float32), jnp.arange(self.chunk))
        return z

    def run(self, params, z, txt, pooled, offsets, t_end):
        import jax.numpy as jnp

        return self._fn(
            params, z, txt, pooled,
            jnp.asarray(offsets, jnp.int32), jnp.int32(t_end),
            jnp.asarray(self.sigmas),
        )


@dataclass
class _Pool:
    """One resident slot batch bound to one weight set + step range."""

    params: object
    t_start: int
    t_end: int
    z: object = None  # (B, S, C) device latents
    txt: object = None
    pooled: object = None
    offsets: np.ndarray = None  # (B,) host copy; row free iff req is None
    reqs: list = None


class ContinuousBatcher:
    """Chunk-boundary admission serving (continuous batching).

    API-compatible with :class:`RequestBatcher` (``submit``/``stats``/
    ``close``); requests join the resident batch at the NEXT chunk
    boundary instead of waiting for a whole-batch slot, so burst p50 is
    bounded by (T/chunk rounds + 1) x chunk time rather than by queueing
    whole sequential batches (round-4 measured p50 ~= wall at 8
    concurrent, bench_results/round4/serve_recipe.json).

    Mixed-model pipelines (tuned segment [0, mix_k), base [mix_k, T))
    run TWO slot pools, one per weight set; a row migrates between pools
    when it reaches the segment boundary (rows freeze at ``t_end``, so no
    chunk-divisibility requirement).  Per scheduling round each populated
    pool dispatches once: every row still costs exactly T model-forward
    steps, so throughput matches the fixed-batch program; only admission
    latency changes.  Single-model pipelines use one pool.
    """

    def __init__(self, pipeline, encode_fn, batch_size: int = 4,
                 single_fn=None, single_grace_s: float = 0.25):
        """``single_fn(prompts, seeds) -> images`` is the optional LATENCY
        TIER (same contract as RequestBatcher's): when every slot is idle
        and exactly one request waits, it rides a one-shot batch-1 program
        instead of paying the full-B chunk engine for 1/B utilization
        (round-5 recipe measurement: 115 s vs 26 s at concurrency 1).

        ``single_grace_s``: co-arrival window before a lone request takes
        the single tier.  The tier runs SYNCHRONOUSLY in the worker, so a
        burst's first arrival capturing it would starve the rest for a
        whole image time (round-5 burst run: 2 of 8 requests rode the
        tier and wall grew 216 -> 243 s); waiting out the window first
        costs a lone request ~1% of its image time."""
        import jax

        self.engine = ContinuousEngine(pipeline)
        self.pipe = pipeline
        self.encode_fn = encode_fn
        self.batch_size = batch_size
        self.single_fn = single_fn
        self.single_grace_s = single_grace_s
        sampler = pipeline._seg1 or pipeline._seg2
        self._noise_row = jax.jit(lambda k: sampler.init_noise(k, 1))
        self._decode1 = None  # lazily-jitted batch-1 VAE decode

        T, k = pipeline.num_steps, pipeline.mix_k
        segs = []
        if k > 0:
            segs.append((pipeline.tuned_params, 0, k))
        if T - k > 0:
            segs.append((pipeline.base_params, k, T))
        self.pools = [self._make_pool(p, a, b) for p, a, b in segs]

        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self._pending: list = []  # worker-local FIFO head (idle wakeups)
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "rounds": 0, "mid_flight_admissions": 0,
                      "migrations": 0, "single_dispatches": 0}
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _make_pool(self, params, t_start, t_end) -> _Pool:
        import jax.numpy as jnp

        B = self.batch_size
        sampler = self.pipe._seg1 or self.pipe._seg2
        S = sampler.num_image_tokens
        C = self.pipe.flux_cfg.in_channels
        dt = self.pipe.dtype
        # text shapes come from the first encode; start with zeros at the
        # pipeline's text length
        L = sampler.rope_cos.shape[0] - S
        D = self.pipe.flux_cfg.context_dim
        P = self.pipe.flux_cfg.pooled_dim
        return _Pool(
            params=params, t_start=t_start, t_end=t_end,
            z=jnp.zeros((B, S, C), jnp.float32),
            txt=jnp.zeros((B, L, D), dt), pooled=jnp.zeros((B, P), dt),
            offsets=np.full(B, t_end, np.int32), reqs=[None] * B,
        )

    # -- client API -------------------------------------------------------
    def submit(self, prompt: str, seed: int, timeout: float = 600.0) -> np.ndarray:
        req = _Request(prompt=prompt, seed=seed)
        self.queue.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.image

    def close(self):
        self._stop.set()
        self._worker.join(timeout=10)
        for r in self._pending:
            r.error = "server shutting down"
            r.done.set()
        for pool in self.pools:
            for r in pool.reqs:
                if r is not None and not r.done.is_set():
                    r.error = "server shutting down"
                    r.done.set()
        while True:
            try:
                req = self.queue.get_nowait()
            except queue.Empty:
                break
            req.error = "server shutting down"
            req.done.set()

    # -- worker -----------------------------------------------------------
    def _admit(self):
        """Fill free entry-pool slots from the queue (chunk boundary)."""
        import jax
        import jax.numpy as jnp

        pool = self.pools[0]
        free = [i for i, r in enumerate(pool.reqs) if r is None]
        newly = []
        mid_flight = any(
            r is not None for p in self.pools for r in p.reqs
        )
        while free and self._pending:
            newly.append((free.pop(0), self._pending.pop(0)))
        if not newly:
            return
        try:
            txt, pooled = self.encode_fn([r.prompt for _, r in newly])
        except Exception as e:
            for _, r in newly:
                r.error = f"{type(e).__name__}: {e}"
                r.done.set()
            self.stats["errors"] += 1
            return
        # one batched row-scatter per array (per-row .at[].set chains cost
        # a device dispatch each — measurable at tunnel latencies)
        slots = jnp.asarray([s for s, _ in newly])
        z0 = jnp.concatenate([
            self._noise_row(jax.random.key(int(r.seed))) for _, r in newly
        ]).astype(jnp.float32)
        pool.z = pool.z.at[slots].set(z0)
        pool.txt = pool.txt.at[slots].set(jnp.asarray(txt, self.pipe.dtype))
        pool.pooled = pool.pooled.at[slots].set(
            jnp.asarray(pooled, self.pipe.dtype))
        # copy-on-write: the CPU backend may alias the previous offsets
        # array zero-copy into a still-queued engine dispatch — in-place
        # mutation raced with it (observed under the 8-device test mesh)
        off = pool.offsets.copy()
        for slot, req in newly:
            off[slot] = pool.t_start
            pool.reqs[slot] = req
            if mid_flight:
                self.stats["mid_flight_admissions"] += 1
        pool.offsets = off

    def _harvest(self):
        """Move boundary rows to the next pool; deliver finished rows.

        Pools are walked last-to-first so a row can migrate into a slot
        freed by a delivery in the same pass.  Row moves and the final
        host fetch are BATCHED device ops (one gather/scatter per array),
        not per-row chains."""
        import jax.numpy as jnp

        for pi, pool in reversed(list(enumerate(self.pools))):
            nxt = self.pools[pi + 1] if pi + 1 < len(self.pools) else None
            ready = [
                i for i, r in enumerate(pool.reqs)
                if r is not None and pool.offsets[i] >= pool.t_end
            ]
            if not ready:
                continue
            if nxt is not None:
                free = [j for j, r in enumerate(nxt.reqs) if r is None]
                moves = list(zip(ready, free))  # next pool full: rest wait
                if not moves:
                    continue
                src = jnp.asarray([i for i, _ in moves])
                dst = jnp.asarray([j for _, j in moves])
                nxt.z = nxt.z.at[dst].set(pool.z[src])
                nxt.txt = nxt.txt.at[dst].set(pool.txt[src])
                nxt.pooled = nxt.pooled.at[dst].set(pool.pooled[src])
                noff, poff = nxt.offsets.copy(), pool.offsets.copy()
                for i, j in moves:
                    noff[j] = nxt.t_start
                    nxt.reqs[j] = pool.reqs[i]
                    pool.reqs[i] = None
                    poff[i] = pool.t_end
                nxt.offsets, pool.offsets = noff, poff
                self.stats["migrations"] += len(moves)
            else:
                try:
                    images = self._finish_rows(
                        pool.z[jnp.asarray(ready)]
                    )
                    for n, i in enumerate(ready):
                        pool.reqs[i].image = images[n]
                except Exception as e:
                    for i in ready:
                        pool.reqs[i].error = f"{type(e).__name__}: {e}"
                    self.stats["errors"] += 1
                poff = pool.offsets.copy()
                for i in ready:
                    self.stats["requests"] += 1
                    pool.reqs[i].done.set()
                    pool.reqs[i] = None
                    poff[i] = pool.t_end
                pool.offsets = poff

    def _finish_rows(self, z_rows) -> np.ndarray:
        """(n, S, C) latent rows -> (n, ...) host images (or latents).
        Decodes row-by-row on a batch-1 program (n varies per boundary —
        batch-n programs would recompile), fetches in ONE host transfer."""
        if self.pipe._decode is None:
            return np.asarray(z_rows, np.float32)
        import jax
        import jax.numpy as jnp

        if self._decode1 is None:
            self._decode1 = jax.jit(self.pipe._decode_impl)
        rows = [
            self._decode1(self.pipe.vae_params, z_rows[i : i + 1])[0]
            for i in range(z_rows.shape[0])
        ]
        return np.asarray(jnp.stack(rows), np.float32)

    def _any_active(self) -> bool:
        return any(r is not None for p in self.pools for r in p.reqs)

    def _try_single(self) -> bool:
        """Latency tier: idle system + exactly one waiting request rides a
        one-shot batch-1 program (~1x image time instead of a full-B chunk
        walk at 1/B utilization).  A lone request younger than
        ``single_grace_s`` first waits out the co-arrival window (blocking
        on the queue — the system is idle) so a burst's first arrival
        cannot capture the worker for a synchronous batch-1 run."""
        if (
            self.single_fn is None or self._any_active()
            or len(self._pending) != 1 or not self.queue.empty()
        ):
            return False
        remaining = self.single_grace_s - (time.time() - self._pending[0].ts)
        if remaining > 0:
            try:
                self._pending.append(self.queue.get(timeout=remaining))
                return False  # company arrived: co-batch through the pools
            except queue.Empty:
                pass
            if self._stop.is_set():
                return False
        req = self._pending.pop(0)
        try:
            images = np.asarray(self.single_fn([req.prompt], [req.seed]))
            req.image = images[0]
            self.stats["single_dispatches"] += 1
        except Exception as e:
            req.error = f"{type(e).__name__}: {e}"
            self.stats["errors"] += 1
        self.stats["requests"] += 1
        req.done.set()
        return True

    def _drain_queue(self):
        while True:
            try:
                self._pending.append(self.queue.get_nowait())
            except queue.Empty:
                return

    def _run(self):
        while not self._stop.is_set():
            self._drain_queue()
            if self._try_single():
                continue
            self._admit()
            progressed = False
            for pool in self.pools:
                active = [
                    i for i, r in enumerate(pool.reqs)
                    if r is not None and pool.offsets[i] < pool.t_end
                ]
                if not active:
                    continue
                try:
                    pool.z = self.engine.run(
                        pool.params, pool.z, pool.txt, pool.pooled,
                        pool.offsets, pool.t_end,
                    )
                    self.stats["batches"] += 1
                except Exception as e:  # fail this pool's riders, keep serving
                    self.stats["errors"] += 1
                    for i in active:
                        r = pool.reqs[i]
                        r.error = f"{type(e).__name__}: {e}"
                        r.done.set()
                        pool.reqs[i] = None
                    pool.offsets = np.full_like(pool.offsets, pool.t_end)
                    continue
                off = pool.offsets.copy()
                off[active] = np.minimum(
                    off[active] + self.engine.chunk, pool.t_end
                )
                pool.offsets = off
                progressed = True
            if progressed:
                self.stats["rounds"] += 1
                self._harvest()
            else:
                try:  # idle: block until a request arrives, keep FIFO order
                    self._pending.append(self.queue.get(timeout=0.1))
                except queue.Empty:
                    pass


def _png_bytes(image01: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.clip(image01, 0, 1) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    return buf.getvalue()


def make_handler(batcher: RequestBatcher):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            elif self.path == "/stats":
                self._send(200, json.dumps(batcher.stats).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(length) or b"{}")
                prompt = payload["prompt"]
                if not isinstance(prompt, str):
                    raise TypeError("prompt must be a string")
                seed = int(payload.get("seed", 0))
            except Exception as e:
                self._send(400, f"bad request: {e}".encode(), "text/plain")
                return
            try:
                image = batcher.submit(prompt, seed)
            except Exception as e:
                self._send(500, str(e).encode(), "text/plain")
                return
            png = _png_bytes(image)
            if payload.get("format") == "json":
                body = json.dumps(
                    {"prompt": prompt, "seed": seed,
                     "png_base64": base64.b64encode(png).decode()}
                ).encode()
                self._send(200, body, "application/json")
            else:
                self._send(200, png, "image/png")

    return Handler


class InferenceServer:
    """HTTP wrapper around a RequestBatcher; ``with`` ‑friendly."""

    def __init__(self, batcher: RequestBatcher, host: str = "0.0.0.0",
                 port: int = 8000):
        self.batcher = batcher
        self.httpd = ThreadingHTTPServer((host, port), make_handler(batcher))
        self.port = self.httpd.server_address[1]
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.batcher.close()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


def make_generate_fn(pipeline, encode_fn):
    """Standard generate_fn for the batcher.

    ``pipeline``: DualFluxPipeline (fixed batch size = batcher batch size).
    ``encode_fn(prompts) -> (txt, pooled)`` — e.g. preprocess.PromptEncoder.
    Each request's seed drives its own initial-noise row (stacked into the
    batch as ``z0``), so identical (prompt, seed) pairs reproduce
    regardless of which neighbours they were co-batched with.
    """
    import jax
    import jax.numpy as jnp

    sampler = pipeline._seg1 or pipeline._seg2
    noise_row = jax.jit(lambda k: sampler.init_noise(k, 1))

    def generate(prompts, seeds):
        txt, pooled = encode_fn(list(prompts))
        z0 = jnp.concatenate(
            [noise_row(jax.random.key(int(s))) for s in seeds], axis=0
        )
        images = pipeline(
            jnp.asarray(txt, pipeline.dtype),
            jnp.asarray(pooled, pipeline.dtype),
            jax.random.key(int(seeds[0])), z0=z0,
        )
        return np.asarray(images, np.float32)

    return generate


def main():
    import argparse

    p = argparse.ArgumentParser(description="Batched FLUX inference server")
    p.add_argument("--model_path", required=True,
                   help="FLUX dir (transformer/ vae/ text encoders)")
    p.add_argument("--tuned_path", default=None,
                   help="fine-tuned transformer safetensors (optional)")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_wait_ms", type=float, default=50.0)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--mix_sampling_steps", type=int, default=30)
    p.add_argument("--quant", default="none", choices=["none", "int8"])
    p.add_argument("--vae_tiling", default="auto",
                   choices=["auto", "on", "off"],
                   help="tiled VAE decode (auto: on above 768px)")
    p.add_argument("--max_steps_per_call", type=int, default=None,
                   help="bound one device execution to N sampling steps "
                        "(chunked segments; same compiled program)")
    p.add_argument("--latency_tier", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="also compile a batch-1 program; lone requests "
                        "ride it (p50 at concurrency 1 ~= 1x image time "
                        "instead of ~batch time)")
    p.add_argument("--continuous", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="continuous batching: requests join the resident "
                        "batch at max_steps_per_call chunk boundaries "
                        "(per-row step offsets) instead of waiting out "
                        "whole batches; burst p50 ~= (T/chunk+1) chunks, "
                        "throughput unchanged")
    args = p.parse_args()

    import os

    import jax.numpy as jnp

    from mixgrpo_tpu.models.flux.load import (
        load_flux_params, load_vae_decoder_params,
    )
    from mixgrpo_tpu.models.flux.model import FluxConfig
    from mixgrpo_tpu.models.flux.vae import VAEConfig
    from mixgrpo_tpu.preprocess import build_prompt_encoder_from_dir
    from mixgrpo_tpu.sample import DualFluxPipeline

    from mixgrpo_tpu.presets import flux_family

    fam = flux_family()  # MIXGRPO_MODEL_PRESET (flux-dev | tiny rehearsal)
    flux_cfg = fam["flux"]
    base = load_flux_params(
        os.path.join(args.model_path, "transformer"), flux_cfg
    )
    tuned = (
        load_flux_params(args.tuned_path, flux_cfg)
        if args.tuned_path else None
    )
    vae_cfg = fam["vae"]
    vae = load_vae_decoder_params(
        os.path.join(args.model_path, "vae"), vae_cfg
    )
    pipe = DualFluxPipeline(
        flux_cfg, base, tuned, vae_cfg=vae_cfg, vae_params=vae,
        height=args.height, width=args.width, num_steps=args.num_steps,
        mix_sampling_steps=args.mix_sampling_steps, dtype=jnp.bfloat16,
        quant=args.quant, vae_tiling=args.vae_tiling,
        max_steps_per_call=args.max_steps_per_call,
    )
    encoder = build_prompt_encoder_from_dir(args.model_path)
    if args.continuous:
        gen1 = make_generate_fn(pipe, encoder) if args.latency_tier else None
        batcher = ContinuousBatcher(
            pipe, encoder, batch_size=args.batch_size, single_fn=gen1
        )
    else:
        gen = make_generate_fn(pipe, encoder)  # PromptEncoder is callable
        batcher = RequestBatcher(
            gen,
            batch_size=args.batch_size, max_wait_ms=args.max_wait_ms,
            # same code path at batch 1: the pipeline compiles one extra
            # program for the (1, ...) shapes on first lone request
            generate_fn_single=gen if args.latency_tier else None,
        )
    with InferenceServer(batcher, port=args.port) as srv:
        print(f"serving on :{srv.port} (batch={args.batch_size})")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
