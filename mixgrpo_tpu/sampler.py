"""Rollout driver: FLUX + mixed ODE-SDE sampler as one jitted program.

TPU-native counterpart of ``sample_reference_model``
(zqqqqz2000/MixGRPO fastvideo/train_grpo_flux.py:184-329).  Key re-design:
the reference loops 12 single-sample rollouts in Python, each with 25
sequential Python-stepped transformer calls; here the whole generation
group is **batched into one rollout** and the 25 steps run inside one
``lax.scan`` (solvers/rollout.py), compiled once.  The sliding-window
ODE/SDE mask, the sigma schedule, and the Flash-compressed step count are
runtime *data* — window moves never recompile.

Timestep quantization parity: the reference feeds the DiT
``int(sigma*1000)/1000`` (train_grpo_flux.py:64-71 via sampling_utils), i.e.
sigma floored to 1e-3; reproduced here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux.model import FluxConfig, flux_forward
from mixgrpo_tpu.models.flux.rope import make_image_ids, make_text_ids, rope_tables
from mixgrpo_tpu.solvers.rollout import RolloutOutput, SamplerConfig, run_rollout


def quantized_timestep(sigma):
    """int(sigma * 1000) / 1000 — reference timestep quantization."""
    return jnp.floor(sigma * 1000.0) / 1000.0


def make_model_fn(
    params,
    flux_cfg: FluxConfig,
    txt,
    pooled,
    guidance_scale: float,
    rope_cos,
    rope_sin,
    *,
    dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    remat: bool = True,
    virtual_depth=None,
):
    """Close FLUX over conditioning -> ``(z, sigma) -> velocity``."""

    def model_fn(z, sigma):
        B = z.shape[0]
        t = jnp.broadcast_to(quantized_timestep(sigma), (B,))
        g = jnp.full((B,), guidance_scale, jnp.float32)
        return flux_forward(
            params, flux_cfg, z.astype(dtype), txt, pooled, t, g,
            rope_cos, rope_sin, dtype=dtype, attn_impl=attn_impl, remat=remat,
            virtual_depth=virtual_depth,
        )

    return model_fn


class FluxSampler:
    """Holds precomputed RoPE tables + the jitted rollout for one resolution."""

    def __init__(
        self,
        flux_cfg: FluxConfig,
        sampler_cfg: SamplerConfig,
        *,
        height: int,
        width: int,
        text_len: int = 512,
        guidance_scale: float = 3.5,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        virtual_depth=None,  # benchmark aid: see flux_forward docstring
    ):
        self.flux_cfg = flux_cfg
        self.sampler_cfg = sampler_cfg
        self.virtual_depth = virtual_depth
        self.height, self.width = height, width
        self.latent_h, self.latent_w = height // 8, width // 8
        self.guidance_scale = guidance_scale
        self.dtype = dtype
        self.attn_impl = attn_impl
        ids = np.concatenate(
            [make_text_ids(text_len), make_image_ids(self.latent_h, self.latent_w)]
        )
        self.rope_cos, self.rope_sin = rope_tables(
            ids, flux_cfg.axes_dims, flux_cfg.theta
        )
        self._rollout = jax.jit(self._rollout_impl)

    @property
    def num_image_tokens(self) -> int:
        return (self.latent_h // 2) * (self.latent_w // 2)

    def init_noise(self, rng, batch: int, same_noise_groups: Optional[int] = None):
        """Packed-latent gaussian init.  With ``same_noise_groups=G`` the
        same noise is reused across each group of G generations
        (init_same_noise, train_grpo_flux.py:223-228).

        Intentional divergence from the reference: the reference draws ONE
        latent per rank and reuses it for *every* sample in the local batch
        (all prompt groups), which only matters for train_batch_size>1 (the
        recipe uses 1).  Here noise is shared per prompt group but fresh
        across groups — group-relative advantages only compare within a
        group, and per-group noise decorrelates groups without weakening the
        variance-reduction that init_same_noise exists for.
        """
        c = self.flux_cfg.in_channels
        if same_noise_groups:
            n_prompts = batch // same_noise_groups
            z = jax.random.normal(
                rng, (n_prompts, 1, self.num_image_tokens, c), jnp.float32
            )
            z = jnp.broadcast_to(
                z, (n_prompts, same_noise_groups, self.num_image_tokens, c)
            )
            return z.reshape(batch, self.num_image_tokens, c)
        return jax.random.normal(rng, (batch, self.num_image_tokens, c), jnp.float32)

    def _rollout_impl(
        self, params, z0, txt, pooled, sigmas, deterministic, num_steps, rng
    ) -> RolloutOutput:
        model_fn = make_model_fn(
            params, self.flux_cfg, txt, pooled, self.guidance_scale,
            self.rope_cos, self.rope_sin, dtype=self.dtype,
            attn_impl=self.attn_impl, remat=False,  # no grads in rollout
            virtual_depth=self.virtual_depth,
        )
        return run_rollout(
            self.sampler_cfg, model_fn, z0,
            sigmas=sigmas, deterministic=deterministic,
            num_steps=num_steps, rng=rng,
        )

    def rollout(
        self, params, z0, txt, pooled, sigmas, deterministic, num_steps, rng
    ) -> RolloutOutput:
        """Run the group rollout (no grad).  All schedule args are data."""
        return self._rollout(
            params, z0, txt, pooled,
            jnp.asarray(sigmas, jnp.float32),
            jnp.asarray(deterministic, bool),
            jnp.asarray(num_steps, jnp.int32),
            rng,
        )

    def chunked_rollout(
        self, params, z0, txt, pooled, sigmas, deterministic, num_steps, rng,
        *, chunk: Optional[int] = None, mesh=None,
    ) -> RolloutOutput:
        """Group rollout in per-device chunks of ``chunk`` images.

        At full weight-cycled depth the per-block HBM weight stream
        amortizes over the batch with a measured per-image optimum well
        below the recipe's G=12 (512px: 134.7 ms/img at B=2 vs 145.5 at
        B=12 — bench_results/round5/probe_batched_b12.json), so the
        production rollout runs the group as G/chunk calls of the SAME
        compiled program at the knee instead of one big call.

        Sharding: ``chunk`` counts images PER BATCH SHARD.  Each chunk
        takes rows [j*chunk, (j+1)*chunk) of every shard's local batch, so
        chunk selection and reassembly are shard-local reshapes (no
        collectives); row order of the merged output matches the input.
        Falls back to the single-call rollout when the local batch does
        not divide into chunks.  SDE noise folds the chunk index into the
        rng (a different — equally valid — noise stream than the
        single-call program).
        """
        B = z0.shape[0]
        nsh = 1
        axes = ()
        if mesh is not None:
            from mixgrpo_tpu.parallel.sharding import batch_axes_for

            axes = batch_axes_for(mesh, B)
            for a in axes:
                nsh *= mesh.shape[a]
        local = B // nsh
        if not chunk or chunk <= 0 or local <= chunk or local % chunk:
            return self.rollout(
                params, z0, txt, pooled, sigmas, deterministic, num_steps, rng
            )
        nc = local // chunk

        def _constrain(y):
            if not axes:
                return y
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                y, NamedSharding(mesh, P(axes, *([None] * (y.ndim - 1))))
            )

        def _take(x, j):
            rest = x.shape[1:]
            y = _constrain(x).reshape(nsh, nc, chunk, *rest)
            y = jax.lax.dynamic_index_in_dim(y, j, axis=1, keepdims=False)
            return _constrain(y.reshape(nsh * chunk, *rest))

        outs = []
        for j in range(nc):
            outs.append(
                self.rollout(
                    params, _take(z0, j), _take(txt, j), _take(pooled, j),
                    sigmas, deterministic, num_steps,
                    jax.random.fold_in(rng, j),
                )
            )

        # reassemble: chunk j holds rows [j*chunk, (j+1)*chunk) of each
        # shard -> stack to (nc, nsh, chunk, ...) and fold back shard-major
        def _unchunk(field_parts):
            rest = field_parts[0].shape[1:]
            y = jnp.stack(
                [p.reshape(nsh, chunk, *rest) for p in field_parts], axis=1
            )  # (nsh, nc, chunk, *rest)
            return _constrain(y.reshape(B, *rest))

        return RolloutOutput(
            final_latents=_unchunk([o.final_latents for o in outs]),
            all_latents=_unchunk([o.all_latents for o in outs]),
            all_log_probs=_unchunk([o.all_log_probs for o in outs]),
            step_valid=outs[0].step_valid,
        )
