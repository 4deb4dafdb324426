"""Latent-feature GAN discriminator (distillation stack).

Counterpart of zqqqqz2000/MixGRPO fastvideo/distill/discriminator.py: one
1x1-conv head per sampled DiT layer (every ``stride``-th of
``total_layers``), each head = conv1x1 -> GroupNorm -> LeakyReLU, residual
second conv, conv_out to 1 channel; features arrive as (B, T*H*W, C) token
grids and are scored per spatial location.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    stride: int = 8
    num_h_per_head: int = 1
    adapter_channels: tuple = (3072,)
    total_layers: int = 48
    inner_channels: int = 1024
    groups: int = 32

    @property
    def head_channels(self) -> tuple:
        return tuple(self.adapter_channels) * (self.total_layers // self.stride)


def _head_init(key, cin, inner, cout=1):
    ks = jax.random.split(key, 3)
    lin = lambda k, i, o: {
        "w": jax.random.normal(k, (i, o), jnp.float32) * (i**-0.5),
        "b": jnp.zeros((o,), jnp.float32),
    }
    return {
        "conv1": lin(ks[0], cin, inner),
        "gn1": {"scale": jnp.ones((inner,)), "bias": jnp.zeros((inner,))},
        "conv2": lin(ks[1], inner, inner),
        "gn2": {"scale": jnp.ones((inner,)), "bias": jnp.zeros((inner,))},
        "out": lin(ks[2], inner, cout),
    }


def init_discriminator(key, cfg: DiscriminatorConfig) -> Dict[str, Any]:
    chans = cfg.head_channels
    keys = jax.random.split(key, len(chans) * cfg.num_h_per_head)
    heads = []
    ki = 0
    for c in chans:
        group = []
        for _ in range(cfg.num_h_per_head):
            group.append(_head_init(keys[ki], c, cfg.inner_channels))
            ki += 1
        heads.append(group)
    return {"heads": heads}


def _gn(p, x, groups):
    b, n, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, groups, c // groups)
    mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    xf = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(b, n, c)
    return (xf * p["scale"] + p["bias"]).astype(x.dtype)


def _head(p, x, groups):
    """x: (B, N, C) token features; 1x1 convs == per-token linears."""
    lin = lambda pp, z: z @ pp["w"].astype(z.dtype) + pp["b"].astype(z.dtype)
    h = jax.nn.leaky_relu(_gn(p["gn1"], lin(p["conv1"], x), groups))
    h2 = jax.nn.leaky_relu(_gn(p["gn2"], lin(p["conv2"], h), groups))
    return lin(p["out"], h2 + h)


def discriminator_forward(
    params, cfg: DiscriminatorConfig, features: Sequence[jnp.ndarray]
) -> List[jnp.ndarray]:
    """features: one (B, N, C) tensor per sampled layer -> per-token logits."""
    assert len(features) == len(params["heads"]), (
        len(features), len(params["heads"])
    )
    outputs = []
    for feats, group in zip(features, params["heads"]):
        for hp in group:
            outputs.append(_head(hp, feats, cfg.groups))
    return outputs
