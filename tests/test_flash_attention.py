"""Pallas flash attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.ops.attention import _xla_attention
from mixgrpo_tpu.ops.flash_attention import flash_attention


pytestmark = pytest.mark.slow


def _rand_qkv(key, B, H, S, D, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (B, H, S, D), dtype) for k in ks)


@pytest.mark.parametrize("S,block", [(128, 64), (192, 64), (256, 256)])
def test_forward_matches_xla(S, block):
    q, k, v = _rand_qkv(jax.random.key(0), 1, 2, S, 64)
    got = flash_attention(q, k, v, block_q=block, block_k=block)
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_forward_unaligned_seq():
    """Sequence not a multiple of the block size (e.g. 2537 joint tokens)."""
    q, k, v = _rand_qkv(jax.random.key(1), 1, 1, 100, 64)
    got = flash_attention(q, k, v, block_q=64, block_k=64)
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_backward_matches_xla():
    q, k, v = _rand_qkv(jax.random.key(2), 1, 2, 128, 32)

    def f_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v) ** 2)

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_backward_unaligned():
    q, k, v = _rand_qkv(jax.random.key(3), 1, 1, 80, 32)
    g1 = jax.grad(lambda *a: jnp.sum(flash_attention(*a, block_q=64, block_k=64)))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(_xla_attention(*a)))(q, k, v)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-4, atol=5e-5)


def test_auto_fullk_block_aligned_unaligned_seq():
    """Default block_k=None at an unaligned S (the 720px S=2537 case):
    the full-K block is rounded up to a 128-lane multiple and padded keys
    masked — values and grads must match XLA exactly."""
    q, k, v = _rand_qkv(jax.random.key(7), 1, 2, 217, 64)
    got = flash_attention(q, k, v)  # auto: full-K single pass, bk=256
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    g1 = jax.grad(lambda *a: jnp.sum(flash_attention(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(_xla_attention(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch",
        )


def test_bf16_forward_close():
    q, k, v = _rand_qkv(jax.random.key(4), 1, 2, 128, 64, jnp.bfloat16)
    got = flash_attention(q, k, v, block_q=64, block_k=64).astype(jnp.float32)
    want = _xla_attention(q, k, v).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_key_mask_matches_xla():
    """Key-side boolean mask (padded text) forward + backward parity."""
    import numpy as np

    B, H, S, D = 2, 2, 96, 32
    q, k, v = _rand_qkv(jax.random.key(5), B, H, S, D)
    mask = np.ones((B, S), bool)
    mask[0, 10:20] = False
    mask[1, 50:] = False
    m4 = jnp.asarray(mask)[:, None, None, :]

    got = flash_attention(q, k, v, mask=m4, block_q=64, block_k=64)
    want = _xla_attention(q, k, v, mask=m4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)

    g1 = jax.grad(lambda *a: jnp.sum(
        flash_attention(*a, mask=m4, block_q=64, block_k=64) ** 2
    ), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: jnp.sum(_xla_attention(*a, mask=m4) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_kv_valid_matches_mask_and_truncation():
    """``kv_valid=n`` (static prefix mask, the flux padding path) must
    equal both the explicit prefix boolean mask and attention over the
    truncated keys — forward and grads, chunked and full-K, both layouts."""
    import numpy as np

    B, H, S, D = 2, 2, 96, 32
    valid = 73  # ragged: exercises masking inside a key block
    q, k, v = _rand_qkv(jax.random.key(11), B, H, S, D)
    m4 = (jnp.arange(S) < valid)[None, None, None, :]
    m4 = jnp.broadcast_to(m4, (B, 1, 1, S))

    for bk in (64, S):  # chunked + full-K(fused-bwd) paths
        got = flash_attention(q, k, v, kv_valid=valid, block_q=64, block_k=bk)
        want = flash_attention(q, k, v, mask=m4, block_q=64, block_k=bk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
        g1 = jax.grad(lambda *a: jnp.sum(
            flash_attention(*a, kv_valid=valid, block_q=64, block_k=bk) ** 2
        ), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda *a: jnp.sum(
            flash_attention(*a, mask=m4, block_q=64, block_k=bk) ** 2
        ), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    trunc = _xla_attention(q, k[:, :, :valid], v[:, :, :valid])
    got = flash_attention(q, k, v, kv_valid=valid, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(trunc),
                               rtol=2e-4, atol=2e-5)

    # bshd layout + the attention() dispatcher's XLA fallback
    tr = lambda x: x.transpose(0, 2, 1, 3)
    got_bshd = flash_attention(tr(q), tr(k), tr(v), kv_valid=valid,
                               block_q=64, block_k=64, layout="bshd")
    np.testing.assert_allclose(np.asarray(tr(got_bshd)), np.asarray(trunc),
                               rtol=2e-4, atol=2e-5)
    from mixgrpo_tpu.ops.attention import attention

    got_xla = attention(q, k, v, kv_valid=valid, impl="xla")
    np.testing.assert_allclose(np.asarray(got_xla).astype(np.float32),
                               np.asarray(trunc).astype(np.float32),
                               rtol=2e-2, atol=2e-2)
    # kv_valid == Sk is a no-op (dispatcher drops it)
    full = attention(q, k, v, kv_valid=S, impl="xla")
    base = attention(q, k, v, impl="xla")
    np.testing.assert_allclose(np.asarray(full), np.asarray(base))


def test_key_mask_2d_form():
    import numpy as np

    q, k, v = _rand_qkv(jax.random.key(6), 1, 1, 64, 32)
    mask = np.ones((1, 64), bool)
    mask[0, 32:] = False
    a = flash_attention(q, k, v, mask=jnp.asarray(mask), block_q=64, block_k=64)
    b = flash_attention(q[:, :, :, :], k[:, :, :32], v[:, :, :32],
                        block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_fused_bwd_matches_two_kernel_path():
    """Round 4: the full-K single-pass dq/dk/dv kernel (used at training
    shapes) must produce the same grads as the chunked two-kernel path
    and as XLA."""
    q, k, v = _rand_qkv(jax.random.key(9), 2, 3, 160, 64)

    def g(fn):
        return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2), (0, 1, 2))(q, k, v)

    g_fused = g(lambda *a: flash_attention(*a, block_q=64, block_k=192))
    g_chunk = g(lambda *a: flash_attention(*a, block_q=64, block_k=64))
    g_xla = g(_xla_attention)
    for a, b, c, name in zip(g_fused, g_chunk, g_xla, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"fused vs chunked d{name}")
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"fused vs xla d{name}")


def test_auto_block_k_respects_vmem_budget():
    """Full-K auto-selection must stay inside the ~16MB/core VMEM: the
    fp32 score tile is budgeted at 10MB.  S=4608 (1024px FLUX joint seq)
    stays full-K (measured working and faster on-chip); far longer
    sequences chunk."""
    from mixgrpo_tpu.ops.flash_attention import _auto_block_k

    assert _auto_block_k(512, 1536, 1536) == 1536   # 512px: full-K
    assert _auto_block_k(512, 2560, 2560) == 2560   # 720px padded: full-K
    assert _auto_block_k(512, 4608, 4608) == 4608   # 1024px: full-K (measured)
    assert _auto_block_k(512, 8192, 8192) == 1024   # beyond budget: chunked
    assert _auto_block_k(1024, 4608, 4608) == 1024  # bigger bq shrinks Sk cap
    # tiny S caps the effective bq (kernel clamps bq to S)
    assert _auto_block_k(512, 64, 16384) == 16384


# ---------------------------------------------------------------------------
# bshd layout (head-minor (B, S, H, D); round 5)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("S,block", [(128, 64), (192, 64), (256, 256)])
def test_bshd_forward_matches_bhsd(S, block):
    q, k, v = _rand_qkv(jax.random.key(7), 2, 3, S, 64)
    want = flash_attention(q, k, v, block_q=block, block_k=block)
    tr = lambda t: t.transpose(0, 2, 1, 3)
    got = flash_attention(tr(q), tr(k), tr(v), block_q=block, block_k=block,
                          layout="bshd")
    np.testing.assert_allclose(
        np.asarray(tr(got)), np.asarray(want), rtol=2e-4, atol=2e-5
    )


@pytest.mark.parametrize("fused", ["1", "0"])
def test_bshd_backward_matches_bhsd(fused, monkeypatch):
    """dq/dk/dv agree across layouts on both backward paths (fused
    single-pass full-K and the two-kernel dkv+dq path)."""
    monkeypatch.setenv("MIXGRPO_FLASH_FUSED_BWD", fused)
    q, k, v = _rand_qkv(jax.random.key(8), 1, 2, 192, 64)
    tr = lambda t: t.transpose(0, 2, 1, 3)

    def loss_bhsd(q, k, v):
        return flash_attention(q, k, v, block_q=64, block_k=192).sum()

    def loss_bshd(q, k, v):
        return flash_attention(
            tr(q), tr(k), tr(v), block_q=64, block_k=192, layout="bshd"
        ).sum()

    g0 = jax.grad(loss_bhsd, argnums=(0, 1, 2))(q, k, v)
    g1 = jax.grad(loss_bshd, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_bshd_key_mask_and_unaligned():
    """Key-side mask + non-block-multiple sequence in bshd layout."""
    B, H, S, D = 2, 2, 100, 64
    q, k, v = _rand_qkv(jax.random.key(9), B, H, S, D)
    mask = jnp.arange(S)[None, :] < jnp.array([[70], [100]])  # (B, S)
    want = _xla_attention(q, k, v, mask=mask[:, None, None, :])
    tr = lambda t: t.transpose(0, 2, 1, 3)
    got = flash_attention(tr(q), tr(k), tr(v), mask=mask, block_q=64,
                          block_k=64, layout="bshd")
    np.testing.assert_allclose(
        np.asarray(tr(got)), np.asarray(want), rtol=2e-4, atol=2e-5
    )
