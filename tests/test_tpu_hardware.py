"""Hardware-only checks (skipped unless a real TPU backend is attached).

The Pallas kernels run in interpret mode on CPU, which does not enforce
TPU blocking rules (e.g. the B>1 key-bias BlockSpec bug fixed in round 2
was invisible to the CPU suite).  These tests re-run the load-bearing
kernel parity checks compiled on the actual chip:
``MIXGRPO_TPU_TESTS=1 pytest tests/test_tpu_hardware.py -m tpu`` on a TPU
host (the env var keeps conftest.py from pinning the CPU backend).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


pytestmark = [
    pytest.mark.tpu,
    pytest.mark.slow,
    pytest.mark.skipif(not _on_tpu(), reason="needs a real TPU backend"),
]


def test_flash_attention_batched_masked_matches_xla():
    from mixgrpo_tpu.ops.flash_attention import flash_attention

    B, H, S, D = 4, 2, 512, 128
    q, k, v = (
        jax.random.normal(jax.random.key(i), (B, H, S, D), jnp.bfloat16)
        for i in range(3)
    )
    lens = jnp.asarray([S, S - 17, S // 2, 100])
    mask = jnp.arange(S)[None, :] < lens[:, None]
    o = flash_attention(q, k, v, mask=mask)
    ref = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3), mask=mask[:, None, None, :],
    ).transpose(0, 2, 1, 3)
    diff = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert diff < 0.02, diff


def test_int8_qlinear_uses_mxu_and_matches():
    from mixgrpo_tpu.models.flux import layers as L
    from mixgrpo_tpu.ops.quant import qlinear, quantize_linear_params

    p = {"w": jax.random.normal(jax.random.key(1), (3072, 3072)) * 0.02}
    x = jax.random.normal(jax.random.key(2), (8, 256, 3072), jnp.bfloat16)
    y = L.linear(p, x, jnp.float32)
    yq = jax.jit(qlinear)(quantize_linear_params(p), x)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.03, rel


def test_rollout_dynamic_length_on_chip():
    """The traced-bound rollout loop runs exactly num_steps model calls on
    the real chip: a Flash-compressed trajectory must be materially faster
    than the full one under the SAME compiled program, and the padded tail
    must keep the pass-through contract."""
    import time

    import numpy as np

    from mixgrpo_tpu.models.flux.model import FluxConfig, init_flux
    from mixgrpo_tpu.sampler import FluxSampler
    from mixgrpo_tpu.solvers.rollout import SamplerConfig

    # model large enough that the skipped steps dominate the tunnel's
    # ~28 ms fixed dispatch overhead
    cfg = FluxConfig(in_channels=64, hidden_size=512, num_heads=4,
                     depth_double=1, depth_single=2, pooled_dim=64,
                     context_dim=64)  # head_dim 128 = RoPE axes 16+56+56
    params = init_flux(jax.random.key(0), cfg)
    T = 64
    sampler = FluxSampler(cfg, SamplerConfig(num_steps_max=T, eta=0.7),
                          height=256, width=256, text_len=16,
                          dtype=jnp.float32, attn_impl="xla")
    txt = jax.random.normal(jax.random.key(1), (2, 16, cfg.context_dim))
    pooled = jax.random.normal(jax.random.key(2), (2, cfg.pooled_dim))
    z0 = sampler.init_noise(jax.random.key(3), 2)
    sig = np.linspace(1.0, 0.0, T + 1).astype(np.float32)
    det = np.ones(T, bool)
    det[2:5] = False

    def run(n):
        out = sampler.rollout(params, z0, txt, pooled, sig, det, n,
                              jax.random.key(4))
        float(out.final_latents.sum())  # axon: host fetch to sync
        return out

    run(T), run(8)  # compile + warm both lengths (same program)

    def med_time(n, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            run(n)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t_full, t_short = med_time(T), med_time(8)
    # 8 of 64 steps: allow generous tunnel overhead, require real savings
    assert t_short < 0.8 * t_full, (t_short, t_full)

    out = run(8)
    lat = np.asarray(out.all_latents)
    # padded tail frozen at z_8, zero log-probs
    np.testing.assert_array_equal(lat[:, 9], lat[:, 8])
    np.testing.assert_array_equal(
        np.asarray(out.all_log_probs)[:, 8:], 0.0
    )
