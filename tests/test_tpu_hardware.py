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
