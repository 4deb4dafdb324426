"""t-SNE embedding probe: rollouts with a fixed SDE interval, latents saved.

Counterpart of zqqqqz2000/MixGRPO fastvideo/sample/t_sne_get_embedding.py:
the research script samples groups of images with the SDE active only in
``[SDE_sampling_start_step, SDE_sampling_end_step)`` (:283-284) and saves
the decoded images plus per-trajectory final latents as .npy for t-SNE
analysis (:192-199).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux.model import FluxConfig
from mixgrpo_tpu.sampler import FluxSampler
from mixgrpo_tpu.solvers.rollout import SamplerConfig
from mixgrpo_tpu.solvers.schedule import deterministic_mask, sigma_schedule
from mixgrpo_tpu.utils.logging import main_print


def run_probe(
    sampler: FluxSampler,
    params,
    txt,
    pooled,
    *,
    sampling_steps: int,
    shift: float,
    sde_start: int,
    sde_end: int,
    num_generations: int,
    rng,
    output_dir: str,
    decode_fn=None,
):
    """Roll out ``num_generations`` trajectories per prompt with the SDE
    window fixed to [sde_start, sde_end); save all step latents + images."""
    os.makedirs(output_dir, exist_ok=True)
    T = sampling_steps
    sig = sigma_schedule(T, shift)
    det = deterministic_mask(T, range(sde_start, sde_end))

    G = num_generations
    n_prompts = txt.shape[0]
    txt_g = jnp.repeat(txt, G, axis=0)
    pooled_g = jnp.repeat(pooled, G, axis=0)
    z0 = sampler.init_noise(rng, n_prompts * G, same_noise_groups=G)
    out = sampler.rollout(params, z0, txt_g, pooled_g, sig, det, T, rng)

    lat = np.asarray(out.all_latents, np.float32)  # (B, T+1, L, C)
    np.save(os.path.join(output_dir, "latents_all_steps.npy"), lat)
    np.save(
        os.path.join(output_dir, "latents_final.npy"),
        np.asarray(out.final_latents, np.float32),
    )
    if decode_fn is not None:
        imgs = np.asarray(decode_fn(out.final_latents))
        from mixgrpo_tpu.sample import save_outputs

        save_outputs(
            imgs, [f"gen_{i}" for i in range(imgs.shape[0])], output_dir,
            seeds=[0] * imgs.shape[0],
        )
    main_print(f"probe saved to {output_dir}: latents {lat.shape}")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--data_json_path", type=str, required=True,
                   help="embedding cache dir")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--h", type=int, default=512)
    p.add_argument("--w", type=int, default=512)
    p.add_argument("--sampling_steps", type=int, default=25)
    p.add_argument("--shift", type=float, default=3.0)
    p.add_argument("--eta", type=float, default=0.7)
    p.add_argument("--SDE_sampling_start_step", type=int, default=0)
    p.add_argument("--SDE_sampling_end_step", type=int, default=25)
    p.add_argument("--num_generations", type=int, default=12)
    p.add_argument("--num_prompts", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    from mixgrpo_tpu.data.dataset import LatentDataset
    from mixgrpo_tpu.models.flux.load import load_flux_params

    flux_cfg = FluxConfig.flux_dev()
    params = load_flux_params(
        os.path.join(args.model_path, "transformer"), flux_cfg
    )
    sampler = FluxSampler(
        flux_cfg,
        SamplerConfig(num_steps_max=args.sampling_steps, eta=args.eta),
        height=args.h, width=args.w,
    )
    ds = LatentDataset(args.data_json_path)
    items = [ds.get(i) for i in range(min(args.num_prompts, len(ds)))]
    txt = jnp.asarray(np.stack([it["prompt_embed"] for it in items]))
    pooled = jnp.asarray(np.stack([it["pooled"] for it in items]))
    run_probe(
        sampler, params, txt, pooled,
        sampling_steps=args.sampling_steps, shift=args.shift,
        sde_start=args.SDE_sampling_start_step,
        sde_end=args.SDE_sampling_end_step,
        num_generations=args.num_generations,
        rng=jax.random.key(args.seed), output_dir=args.output_dir,
    )


if __name__ == "__main__":
    main()
