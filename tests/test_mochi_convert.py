"""Mochi diffusers export (models/mochi/convert.py): round-trip parity."""

import jax
import numpy as np
import pytest

from mixgrpo_tpu.models.mochi.convert import (
    export_mochi_diffusers, save_mochi_diffusers,
)
from mixgrpo_tpu.models.mochi.load import load_mochi_hf
from mixgrpo_tpu.models.mochi.model import MochiConfig, init_mochi


def test_export_roundtrips_through_loader():
    cfg = MochiConfig.tiny()
    params = init_mochi(jax.random.key(0), cfg)
    st = export_mochi_diffusers(params, cfg)
    # conv-shaped patch embed restored to (out, in, p, p)
    assert st["patch_embed.proj.weight"].shape == (
        cfg.dim, cfg.in_channels, cfg.patch_size, cfg.patch_size
    )
    back = load_mochi_hf(st, cfg)
    flat_a = jax.tree.leaves_with_path(params)
    flat_b = dict(jax.tree.leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(flat_b[path], np.float32),
            rtol=1e-6, atol=1e-6, err_msg=str(path),
        )


def test_save_and_reload_dir(tmp_path):
    cfg = MochiConfig.tiny()
    params = init_mochi(jax.random.key(1), cfg)
    save_mochi_diffusers(params, cfg, str(tmp_path))
    from mixgrpo_tpu.models.mochi.load import load_mochi_checkpoint

    back = load_mochi_checkpoint(str(tmp_path), cfg)
    a = np.asarray(jax.tree.leaves(params)[0])
    b = np.asarray(jax.tree.leaves(back)[0])
    np.testing.assert_allclose(a, b, rtol=1e-6)
