"""Serving layer: fixed-batch request batcher + HTTP server.

Covers what the reference cannot do at all (its inference is a one-shot
CLI, fastvideo/sample/sample_flux.py): ragged concurrent requests ride a
fixed-size compiled batch, per-request seeds reproduce independent of
co-batching, and errors surface per-request without killing the worker.
"""

import base64
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mixgrpo_tpu.serve import InferenceServer, RequestBatcher, make_generate_fn


def _post(port, payload, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, r.read()


def test_batcher_pads_and_reproduces_seeds():
    calls = []

    def gen(prompts, seeds):
        calls.append((list(prompts), list(seeds)))
        # image encodes (prompt hash, seed) so reproducibility is checkable
        out = np.zeros((len(prompts), 4, 4, 3), np.float32)
        for i, (p, s) in enumerate(zip(prompts, seeds)):
            out[i, 0, 0, 0] = (hash(p) % 97) / 97.0
            out[i, 0, 0, 1] = (int(s) % 89) / 89.0
        return out

    b = RequestBatcher(gen, batch_size=4, max_wait_ms=200.0)
    try:
        results = {}
        threads = [
            threading.Thread(
                target=lambda k, p, s: results.__setitem__(k, b.submit(p, s)),
                args=(i, f"prompt-{i % 2}", 100 + i),
            )
            for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 3
        # 3 requests co-batched into one padded batch of 4
        assert b.stats["batches"] == 1
        assert b.stats["padded_rows"] == 1
        assert len(calls[0][0]) == 4
        # same (prompt, seed) submitted alone reproduces bit-exactly
        again = b.submit("prompt-1", 101)
        np.testing.assert_array_equal(again, results[1])
    finally:
        b.close()


def test_latency_tier_routes_lone_requests_to_single_program():
    """With a batch-1 program configured, a request that arrives alone
    rides it (no padded rows); concurrent requests still co-batch on the
    batched program; identical (prompt, seed) reproduces across tiers."""

    def _img(prompts, seeds):
        out = np.zeros((len(prompts), 4, 4, 3), np.float32)
        for i, (p, s) in enumerate(zip(prompts, seeds)):
            out[i, 0, 0, 0] = (hash(p) % 97) / 97.0
            out[i, 0, 0, 1] = (int(s) % 89) / 89.0
        return out

    batch_sizes = []

    def gen(prompts, seeds):
        assert len(prompts) == 4  # the compiled batch shape
        batch_sizes.append(len(prompts))
        return _img(prompts, seeds)

    def gen1(prompts, seeds):
        assert len(prompts) == 1  # the compiled batch-1 shape
        batch_sizes.append(len(prompts))
        return _img(prompts, seeds)

    b = RequestBatcher(gen, batch_size=4, max_wait_ms=50.0,
                       generate_fn_single=gen1)
    try:
        lone = b.submit("prompt-1", 101)
        assert b.stats["single_dispatches"] == 1
        assert b.stats["padded_rows"] == 0
        assert batch_sizes == [1]

        results = {}
        threads = [
            threading.Thread(
                target=lambda k, p, s: results.__setitem__(k, b.submit(p, s)),
                args=(i, f"prompt-{i}", 100 + i),
            )
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4 and b.stats["requests"] == 5
        # every dispatch rode a compiled shape: 1 (single tier) or 4 (padded)
        assert set(batch_sizes) <= {1, 4}
        # cross-tier reproducibility: same (prompt, seed), different program
        np.testing.assert_array_equal(lone, results[1])
    finally:
        b.close()


def test_batcher_error_surfaces_and_recovers():
    state = {"fail": True}

    def gen(prompts, seeds):
        if state["fail"]:
            raise ValueError("boom")
        return np.zeros((2, 2, 2, 3), np.float32)

    b = RequestBatcher(gen, batch_size=2, max_wait_ms=10.0)
    try:
        with pytest.raises(RuntimeError, match="boom"):
            b.submit("p", 0)
        state["fail"] = False
        img = b.submit("p", 0)  # worker survived the failed batch
        assert img.shape == (2, 2, 3)
        assert b.stats["errors"] == 1
    finally:
        b.close()


@pytest.mark.slow
def test_http_server_end_to_end_tiny_flux():
    from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
    from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder
    from mixgrpo_tpu.sample import DualFluxPipeline

    flux_cfg = FluxConfig.tiny()
    vae_cfg = VAEConfig.tiny(latent_channels=flux_cfg.in_channels // 4)
    base = init_flux(jax.random.key(0), flux_cfg)
    tuned = init_flux(jax.random.key(1), flux_cfg)
    pipe = DualFluxPipeline(
        flux_cfg, base, tuned,
        vae_cfg=vae_cfg, vae_params=init_vae_decoder(jax.random.key(2), vae_cfg),
        height=32, width=32, num_steps=3, mix_sampling_steps=2,
        text_len=8, dtype=jnp.float32, attn_impl="xla",
    )

    def encode(prompts):
        txt = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(8, flux_cfg.context_dim)) for p in prompts
        ]).astype(np.float32)
        pooled = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(flux_cfg.pooled_dim,)) for p in prompts
        ]).astype(np.float32)
        return txt, pooled

    batcher = RequestBatcher(
        make_generate_fn(pipe, encode), batch_size=2, max_wait_ms=100.0
    )
    with InferenceServer(batcher, host="127.0.0.1", port=0) as srv:
        status, body = _get(srv.port, "/healthz")
        assert (status, body) == (200, b"ok")

        out = {}

        def call(i, fmt):
            payload = {"prompt": f"a cat {i}", "seed": i}
            if fmt:
                payload["format"] = "json"
            out[i] = _post(srv.port, payload)

        threads = [
            threading.Thread(target=call, args=(i, i == 1)) for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        status, ctype, png = out[0]
        assert status == 200 and ctype == "image/png"
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        status, ctype, body = out[1]
        assert status == 200 and ctype == "application/json"
        meta = json.loads(body)
        assert meta["seed"] == 1
        assert base64.b64decode(meta["png_base64"])[:8] == b"\x89PNG\r\n\x1a\n"

        # same (prompt, seed) again -> byte-identical PNG despite different
        # co-batching (seed-resolved z0 rows, deterministic ODE segments)
        status, _, png2 = _post(srv.port, {"prompt": "a cat 0", "seed": 0})
        assert status == 200 and png2 == png

        status, body = _get(srv.port, "/stats")
        assert json.loads(body)["requests"] >= 3

        # non-string prompt -> 400 at the HTTP layer (never reaches the
        # batcher, so it cannot poison a co-batched micro-batch)
        try:
            _post(srv.port, {"prompt": 123})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # malformed request -> 400, server stays alive
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate", data=b"not json",
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        status, body = _get(srv.port, "/healthz")
        assert status == 200


# ---------------------------------------------------------------------------
# continuous batching (chunk-boundary admission; VERDICT r4 #7)
# ---------------------------------------------------------------------------


def _tiny_mixed_pipeline(num_steps=6, mix=3, chunk=2):
    from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
    from mixgrpo_tpu.sample import DualFluxPipeline

    flux_cfg = FluxConfig.tiny()
    base = init_flux(jax.random.key(0), flux_cfg)
    tuned = init_flux(jax.random.key(1), flux_cfg)
    pipe = DualFluxPipeline(
        flux_cfg, base, tuned, height=32, width=32, num_steps=num_steps,
        mix_sampling_steps=mix, text_len=8, dtype=jnp.float32,
        attn_impl="xla", max_steps_per_call=chunk,
    )

    def encode(prompts):
        txt = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(8, flux_cfg.context_dim)) for p in prompts
        ]).astype(np.float32)
        pooled = np.stack([
            np.random.default_rng(abs(hash(p)) % 2**31)
            .normal(size=(flux_cfg.pooled_dim,)) for p in prompts
        ]).astype(np.float32)
        return txt, pooled

    return pipe, encode


def test_continuous_batcher_matches_pipeline_under_burst():
    """A burst of 2x the slot count: outputs must match the one-shot
    pipeline per (prompt, seed) regardless of admission timing, and the
    burst must actually exercise mid-flight admission + pool migration."""
    from mixgrpo_tpu.serve import ContinuousBatcher

    pipe, encode = _tiny_mixed_pipeline()
    b = ContinuousBatcher(pipe, encode, batch_size=2)
    try:
        results = {}
        threads = [
            threading.Thread(
                target=lambda k, p, s: results.__setitem__(
                    k, b.submit(p, s, timeout=300)),
                args=(i, f"prompt-{i}", 100 + i),
            )
            for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4

        sampler = pipe._seg1 or pipe._seg2
        for i in range(4):
            txt, pooled = encode([f"prompt-{i}"])
            z0 = sampler.init_noise(jax.random.key(100 + i), 1)
            want = np.asarray(pipe(
                jnp.asarray(txt), jnp.asarray(pooled),
                jax.random.key(0), z0=z0,
            ))[0]
            np.testing.assert_allclose(
                results[i], want, rtol=2e-5, atol=2e-5,
            )
        # 4 requests through 2 slots: the second pair joined mid-flight,
        # and every request migrated tuned-pool -> base-pool
        assert b.stats["mid_flight_admissions"] >= 1
        assert b.stats["migrations"] == 4
        assert b.stats["requests"] == 4
        assert b.stats["errors"] == 0
    finally:
        b.close()


def test_continuous_batcher_single_model_and_unaligned_boundary():
    """Single-model pipeline (one pool) with chunk that does not divide
    the step count: rows freeze at t_end mid-chunk, output still matches
    the one-shot pipeline."""
    from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
    from mixgrpo_tpu.sample import DualFluxPipeline
    from mixgrpo_tpu.serve import ContinuousBatcher

    flux_cfg = FluxConfig.tiny()
    base = init_flux(jax.random.key(0), flux_cfg)
    pipe = DualFluxPipeline(
        flux_cfg, base, None, height=32, width=32, num_steps=5,
        text_len=8, dtype=jnp.float32, attn_impl="xla",
        max_steps_per_call=2,  # 5 steps -> chunks of 2+2+1
    )
    _, encode = _tiny_mixed_pipeline()
    b = ContinuousBatcher(pipe, encode, batch_size=2)
    try:
        assert len(b.pools) == 1
        got = b.submit("lonely", 7, timeout=300)
        sampler = pipe._seg1 or pipe._seg2
        txt, pooled = encode(["lonely"])
        want = np.asarray(pipe(
            jnp.asarray(txt), jnp.asarray(pooled), jax.random.key(0),
            z0=sampler.init_noise(jax.random.key(7), 1),
        ))[0]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    finally:
        b.close()


def test_continuous_batcher_latency_tier():
    """With ``single_fn`` configured, a lone request on an idle system
    rides the one-shot batch-1 program (round-5 recipe measurement: 25 s
    vs 115 s through the chunk engine at concurrency 1) and reproduces
    the chunk-engine result bit-for-bit in f32; concurrent requests still
    go through the pool engine."""
    from mixgrpo_tpu.serve import ContinuousBatcher, make_generate_fn

    pipe, encode = _tiny_mixed_pipeline()
    b = ContinuousBatcher(
        pipe, encode, batch_size=2, single_fn=make_generate_fn(pipe, encode)
    )
    try:
        lone = b.submit("prompt-solo", 42, timeout=300)
        assert b.stats["single_dispatches"] == 1
        assert b.stats["requests"] == 1

        sampler = pipe._seg1 or pipe._seg2
        txt, pooled = encode(["prompt-solo"])
        want = np.asarray(pipe(
            jnp.asarray(txt), jnp.asarray(pooled), jax.random.key(0),
            z0=sampler.init_noise(jax.random.key(42), 1),
        ))[0]
        np.testing.assert_allclose(lone, want, rtol=2e-5, atol=2e-5)

        # a 3-deep burst exceeds the tier's idle+lone guard: the pool
        # engine serves it, and per-(prompt, seed) outputs still match
        results = {}
        threads = [
            threading.Thread(
                target=lambda k, p, s: results.__setitem__(
                    k, b.submit(p, s, timeout=300)),
                args=(i, f"prompt-{i}", 100 + i),
            )
            for i in range(3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(3):
            txt, pooled = encode([f"prompt-{i}"])
            want = np.asarray(pipe(
                jnp.asarray(txt), jnp.asarray(pooled), jax.random.key(0),
                z0=sampler.init_noise(jax.random.key(100 + i), 1),
            ))[0]
            np.testing.assert_allclose(results[i], want, rtol=2e-5, atol=2e-5)
        assert b.stats["requests"] == 4
        assert b.stats["errors"] == 0
    finally:
        b.close()


def test_continuous_batcher_error_surfaces_and_recovers():
    from mixgrpo_tpu.serve import ContinuousBatcher

    pipe, encode = _tiny_mixed_pipeline()
    boom = {"on": True}

    def flaky_encode(prompts):
        if boom["on"]:
            raise RuntimeError("encoder exploded")
        return encode(prompts)

    b = ContinuousBatcher(pipe, flaky_encode, batch_size=2)
    try:
        with pytest.raises(RuntimeError, match="encoder exploded"):
            b.submit("bad", 1, timeout=60)
        boom["on"] = False
        out = b.submit("good", 2, timeout=300)
        assert np.isfinite(out).all()
        assert b.stats["errors"] == 1
        assert b.stats["requests"] == 1
    finally:
        b.close()
