"""Exponential moving average of params.

Counterpart of the reference's ``--ema_decay`` / ``--ema_start_step`` flags
(zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:921-922; the GRPO path
exposes but never applies them — provided here as a working utility).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(jnp.array, params)


def ema_update(ema, params, decay: float = 0.995, step: int | None = None,
               start_step: int = 0):
    """ema <- decay * ema + (1 - decay) * params (no-op before start_step)."""
    if step is not None and step < start_step:
        return ema
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema, params
    )
