"""FLUX MMDiT: shapes, jit, remat equivalence, packing, RoPE properties."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixgrpo_tpu.models.flux import (
    FluxConfig,
    apply_rope,
    flux_forward,
    init_flux,
    make_image_ids,
    make_text_ids,
    pack_latents,
    param_count,
    rope_tables,
    unpack_latents,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    B, lh, lw, lt = 2, 8, 8, 6
    key = jax.random.key(1)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), cfg.in_channels))
    txt = jax.random.normal(key, (B, lt, cfg.context_dim))
    pooled = jax.random.normal(key, (B, cfg.pooled_dim))
    t = jnp.full((B,), 0.5)
    g = jnp.full((B,), 3.5)
    ids = np.concatenate([make_text_ids(lt), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims, cfg.theta)
    return cfg, params, (img, txt, pooled, t, g, cos, sin)


def test_forward_shape_and_finite(tiny_setup):
    cfg, params, args = tiny_setup
    out = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla")
    assert out.shape == args[0].shape
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_remat_matches_no_remat(tiny_setup):
    cfg, params, args = tiny_setup
    a = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla", remat=True)
    b = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla", remat=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_jit_and_grad(tiny_setup):
    cfg, params, args = tiny_setup

    @jax.jit
    def loss_fn(p):
        out = flux_forward(p, cfg, *args, dtype=jnp.float32, attn_impl="xla")
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # every parameter receives gradient signal somewhere
    nonzero = sum(float(jnp.abs(x).sum()) > 0 for x in leaves)
    assert nonzero > len(leaves) * 0.9


def test_virtual_depth_nested_scan_matches_gather(tiny_setup):
    """When the virtual depth divides the stack depth, cycling uses nested
    scans (no per-step weight gather — the differentiable full-depth bench
    path); output must equal the modular-gather variant and, at the true
    depth, the plain scan."""
    cfg, params, args = tiny_setup
    # (6, 8) divides the tiny stacks (2, 4): nested path
    a = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla",
                     virtual_depth=(6, 8))
    # (6, 8) with a prime-ish offset forced through the gather path by
    # making depths non-divisible is not constructible here; instead check
    # the nested path at the TRUE depth equals no virtual_depth at all.
    b = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla",
                     virtual_depth=(cfg.depth_double, cfg.depth_single))
    c = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(b), np.asarray(c), rtol=1e-5, atol=1e-5)
    # gather path (non-divisible virtual depth) on the same weights: one
    # extra double application vs `a` must CHANGE the output (sanity that
    # both paths actually execute the requested counts)
    d = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla",
                     virtual_depth=(7, 8))
    assert not np.allclose(np.asarray(a), np.asarray(d))
    # and the nested path is differentiable end-to-end (the round-2
    # compile-helper failure mode was the gather inside the remat backward)
    g = jax.grad(lambda p: jnp.mean(flux_forward(
        p, cfg, *args, dtype=jnp.float32, attn_impl="xla", remat=True,
        virtual_depth=(6, 8)) ** 2))(params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g))


def test_virtual_depth_gather_vs_nested_same_counts(tiny_setup, monkeypatch):
    """Gather path at a divisible count must equal the nested path (same
    weights, identical block application order i % k)."""
    cfg, params, args = tiny_setup
    from mixgrpo_tpu.models.flux import model as M

    nested = flux_forward(params, cfg, *args, dtype=jnp.float32,
                          attn_impl="xla", virtual_depth=(4, 8))
    monkeypatch.setattr(M, "_FORCE_GATHER", True)
    gather = flux_forward(params, cfg, *args, dtype=jnp.float32,
                          attn_impl="xla", virtual_depth=(4, 8))
    np.testing.assert_allclose(
        np.asarray(nested), np.asarray(gather), rtol=1e-6, atol=1e-6
    )


def test_timestep_changes_output(tiny_setup):
    cfg, params, (img, txt, pooled, t, g, cos, sin) = tiny_setup
    a = flux_forward(params, cfg, img, txt, pooled, t, g, cos, sin,
                     dtype=jnp.float32, attn_impl="xla")
    b = flux_forward(params, cfg, img, txt, pooled, t * 0.1, g, cos, sin,
                     dtype=jnp.float32, attn_impl="xla")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_flux_dev_param_count():
    """FLUX.1-dev is ~11.9B params; init lazily via eval_shape only."""
    cfg = FluxConfig.flux_dev()
    shapes = jax.eval_shape(lambda k: init_flux(k, cfg), jax.random.key(0))
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes))
    assert 11.0e9 < n < 12.5e9, n


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 12, 10, 16)).astype(np.float32)
    packed = pack_latents(jnp.asarray(x))
    assert packed.shape == (2, 6 * 5, 64)
    # height/width in pixels = latent * 8
    back = unpack_latents(packed, 12 * 8, 10 * 8)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-6)


def test_pack_matches_reference_token_layout():
    """Token feature order must be (channel, dy, dx) channel-major,
    matching train_grpo_flux.py:94-99 so HF x_embedder weights apply."""
    c, h, w = 3, 4, 4
    # value encodes (channel, y, x) uniquely
    grid = np.zeros((1, h, w, c), np.float32)
    for y in range(h):
        for x in range(w):
            for ch in range(c):
                grid[0, y, x, ch] = ch * 100 + y * 10 + x
    packed = np.asarray(pack_latents(jnp.asarray(grid)))
    # token 0 = patch at (0:2, 0:2); features = [c0(0,0), c0(0,1), c0(1,0),
    # c0(1,1), c1(0,0), ...]
    want = [0, 1, 10, 11, 100, 101, 110, 111, 200, 201, 210, 211]
    np.testing.assert_allclose(packed[0, 0], want)


def test_image_ids_layout():
    ids = make_image_ids(8, 6)  # packed grid 4x3
    assert ids.shape == (12, 3)
    np.testing.assert_allclose(ids[:, 0], 0.0)
    np.testing.assert_allclose(ids[0], [0, 0, 0])
    np.testing.assert_allclose(ids[1], [0, 0, 1])
    np.testing.assert_allclose(ids[3], [0, 1, 0])


def test_rope_rotation_preserves_norm_and_relative_phase():
    ids = np.concatenate([make_text_ids(4), make_image_ids(8, 8)])
    cos, sin = rope_tables(ids, (8, 12, 12))
    assert cos.shape == (4 + 16, 32)
    x = jax.random.normal(jax.random.key(0), (1, 2, 20, 32))
    y = apply_rope(x, cos, sin)
    # rotation preserves per-pair norms
    xp = np.asarray(x).reshape(1, 2, 20, 16, 2)
    yp = np.asarray(y).reshape(1, 2, 20, 16, 2)
    np.testing.assert_allclose(
        (xp**2).sum(-1), (yp**2).sum(-1), rtol=1e-4, atol=1e-5
    )
    # text tokens (ids all zero) are unrotated
    np.testing.assert_allclose(np.asarray(y)[:, :, :4], np.asarray(x)[:, :, :4], rtol=1e-6)


def test_rope_attention_is_translation_invariant():
    """Attention logits between RoPE'd q/k depend only on relative offsets."""
    d = 16
    ids_a = np.zeros((2, 3), np.float32)
    ids_a[:, 1] = [3, 5]
    ids_b = np.zeros((2, 3), np.float32)
    ids_b[:, 1] = [10, 12]  # same relative offset 2
    q = jax.random.normal(jax.random.key(0), (1, 1, 2, d))
    k = jax.random.normal(jax.random.key(1), (1, 1, 2, d))

    def logits(ids):
        cos, sin = rope_tables(ids, (0, d, 0))
        qr, kr = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        return np.asarray(jnp.einsum("bhqd,bhkd->bhqk", qr, kr))

    np.testing.assert_allclose(logits(ids_a), logits(ids_b), rtol=1e-4, atol=1e-5)


def test_virtual_depth_matches_plain(tiny_setup):
    """virtual_depth equal to the true stack depth must reproduce the
    normal scan exactly (benchmarking aid used by bench.py)."""
    cfg, params, args = tiny_setup
    a = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla",
                     remat=False)
    b = flux_forward(params, cfg, *args, dtype=jnp.float32, attn_impl="xla",
                     remat=False,
                     virtual_depth=(cfg.depth_double, cfg.depth_single))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_virtual_depth_runs_deeper_than_stack(tiny_setup):
    cfg, params, args = tiny_setup
    out = flux_forward(
        params, cfg, *args, dtype=jnp.float32, attn_impl="xla", remat=False,
        virtual_depth=(cfg.depth_double * 3 + 1, cfg.depth_single * 2 + 1),
    )
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_pad_seq_alignment_is_exact(attn_impl):
    """Lane-aligning the joint sequence (pad_seq_multiple) is semantically
    exact: identity-RoPE pad tokens are key-masked and sliced off, so the
    output matches the unpadded forward at the ragged S."""
    cfg = FluxConfig.tiny()
    params = init_flux(jax.random.key(0), cfg)
    B, lh, lw, lt = 1, 30, 134, 20  # packed 15x67=1005 img + 20 txt = S=1025
    key = jax.random.key(2)
    img = jax.random.normal(key, (B, (lh // 2) * (lw // 2), cfg.in_channels))
    txt = jax.random.normal(key, (B, lt, cfg.context_dim))
    pooled = jax.random.normal(key, (B, cfg.pooled_dim))
    t = jnp.full((B,), 0.5)
    g = jnp.full((B,), 3.5)
    ids = np.concatenate([make_text_ids(lt), make_image_ids(lh, lw)])
    cos, sin = rope_tables(ids, cfg.axes_dims, cfg.theta)
    args = (img, txt, pooled, t, g, cos, sin)
    kw = dict(dtype=jnp.float32, attn_impl=attn_impl, remat=False)
    padded = flux_forward(params, cfg, *args, pad_seq_multiple=128, **kw)
    plain = flux_forward(params, cfg, *args, pad_seq_multiple=0, **kw)
    assert padded.shape == img.shape
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(plain), rtol=2e-4, atol=2e-4
    )


def test_rope_matmul_rotation_matches_interleave_reference():
    """apply_rope's signed-permutation matmul is EXACT vs the pairwise
    interleave formulation (each R column has one +-1 entry)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 20, 32)).astype(np.float32)
    ang = rng.normal(size=(20, 32)).astype(np.float32)
    cos, sin = np.cos(ang), np.sin(ang)

    xp = x.reshape(2, 4, 20, 16, 2)
    rot = np.stack([-xp[..., 1], xp[..., 0]], -1).reshape(x.shape)
    want = x * cos + rot * sin
    got = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(cos),
                                jnp.asarray(sin)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
def test_attn_layout_bshd_matches_bhsd(tiny_setup, monkeypatch, attn_impl):
    """The head-minor (B,S,H,D) attention layout (round 5, default) is
    numerically equivalent to the historical (B,H,S,D) layout — forward
    AND parameter gradients (the layout only moves the head-split
    transposes into the kernel's block DMAs)."""
    from mixgrpo_tpu.models.flux import model as M

    cfg, params, (img, txt, pooled, t, g, cos, sin) = tiny_setup

    def fwd():
        return flux_forward(
            params, cfg, img, txt, pooled, t, g, cos, sin,
            dtype=jnp.float32, attn_impl=attn_impl, remat=False,
        )

    def loss(p):
        out = flux_forward(
            p, cfg, img, txt, pooled, t, g, cos, sin,
            dtype=jnp.float32, attn_impl=attn_impl, remat=True,
        )
        return (out.astype(jnp.float32) ** 2).mean()

    monkeypatch.setattr(M, "_ATTN_LAYOUT", "bhsd")
    want, gwant = fwd(), jax.grad(loss)(params)
    monkeypatch.setattr(M, "_ATTN_LAYOUT", "bshd")
    got, ggot = fwd(), jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(gwant),
        jax.tree_util.tree_leaves_with_path(ggot),
    ):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(pa),
        )
