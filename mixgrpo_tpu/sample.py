"""Inference app: mixed-model FLUX sampling (GRPO-tuned + base).

Counterpart of zqqqqz2000/MixGRPO fastvideo/sample/sample_flux.py
(``DualFluxPipeline``): the GRPO-tuned transformer runs the first
``mix_sampling_steps`` of the trajectory, the base transformer the rest
(:319-342) — matching the progressive window that only ever trained
early/mid timesteps.  Prompts are host-sharded with per-host seeds
(:470-474) and a JSON metadata file is written (:510-520).

TPU-first: the two segments are two jitted ``lax.scan``s over the same
rollout machinery (one compile each; the reference branches per step in
Python).  Dynamic-shift schedule parity with diffusers FluxPipeline:
``calculate_shift`` (models/flux_hf/pipeline_flux.py:73) then
``sigma' = e^mu / (e^mu + 1/sigma - 1)``.
"""

from __future__ import annotations

import argparse
import json
import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.flux.latents import denormalize_latents, unpack_latents
from mixgrpo_tpu.models.flux.model import FluxConfig
from mixgrpo_tpu.models.flux.vae import VAEConfig, postprocess_images, vae_decode
from mixgrpo_tpu.sampler import FluxSampler
from mixgrpo_tpu.solvers.rollout import SamplerConfig
from mixgrpo_tpu.utils.logging import main_print


def calculate_shift(
    image_seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.16,
) -> float:
    """FLUX dynamic schedule shift mu (pipeline_flux.py:73-84)."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    return image_seq_len * m + b


def dynamic_shift_sigmas(num_steps: int, mu: float) -> np.ndarray:
    """FlowMatchEuler dynamic shifting: sigma' = e^mu/(e^mu + 1/sigma - 1)."""
    sig = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    shifted = math.exp(mu) / (math.exp(mu) + (1.0 / sig - 1.0))
    return np.concatenate([shifted, [0.0]]).astype(np.float32)


class DualFluxPipeline:
    """Base + fine-tuned FLUX with segment-wise model switching."""

    def __init__(
        self,
        flux_cfg: FluxConfig,
        base_params,
        tuned_params=None,
        *,
        vae_cfg: Optional[VAEConfig] = None,
        vae_params=None,
        height: int = 1024,
        width: int = 1024,
        num_steps: int = 50,
        mix_sampling_steps: int = 30,
        guidance_scale: float = 3.5,
        text_len: int = 512,
        dtype=jnp.bfloat16,
        attn_impl: str = "auto",
        quant: str = "none",
        virtual_depth=None,  # benchmark aid: see flux_forward docstring
        vae_tiling: str = "auto",  # auto | on | off
        max_steps_per_call: Optional[int] = None,
    ):
        self.flux_cfg = flux_cfg
        if quant == "int8":  # ~2x sampling throughput on TPU (ops/quant.py)
            from mixgrpo_tpu.ops.quant import quantize_flux_params

            q = jax.jit(quantize_flux_params)
            base_params = q(base_params)
            tuned_params = q(tuned_params) if tuned_params is not None else None
        elif quant != "none":
            raise ValueError(f"unknown quant {quant!r}")
        self.base_params = base_params
        self.tuned_params = tuned_params
        self.vae_cfg, self.vae_params = vae_cfg, vae_params
        self.num_steps = num_steps
        self.mix_k = min(mix_sampling_steps, num_steps) if tuned_params is not None else 0
        self.height, self.width = height, width
        self.dtype = dtype

        image_seq_len = (height // 16) * (width // 16)
        mu = calculate_shift(image_seq_len)
        self.sigmas = dynamic_shift_sigmas(num_steps, mu)

        # max_steps_per_call bounds the duration of ONE device execution by
        # splitting a segment into fixed-shape chunks driven from the host
        # (the executed step count is data, so every chunk reuses the same
        # compiled program).  A full-depth 1024px batch-4 segment is an
        # ~81 s single device call otherwise — long enough to trip
        # execution watchdogs on tunneled/managed runtimes, and coarse for
        # preemption either way.  None = one call per segment (default).
        self._chunk = max_steps_per_call
        cap = lambda T: min(T, self._chunk) if self._chunk else T
        scfg = lambda T: SamplerConfig(num_steps_max=cap(T), eta=0.0)
        self._seg1 = (
            FluxSampler(flux_cfg, scfg(self.mix_k), height=height, width=width,
                        text_len=text_len, guidance_scale=guidance_scale,
                        dtype=dtype, attn_impl=attn_impl,
                        virtual_depth=virtual_depth)
            if self.mix_k > 0 else None
        )
        self._seg2 = (
            FluxSampler(flux_cfg, scfg(num_steps - self.mix_k), height=height,
                        width=width, text_len=text_len,
                        guidance_scale=guidance_scale, dtype=dtype,
                        attn_impl=attn_impl, virtual_depth=virtual_depth)
            if num_steps - self.mix_k > 0 else None
        )
        # VAE tiling policy: at 1024px+ the fused decode's peak activations
        # (~GBs at batch 4) are the HBM pressure point; tile like the
        # reference does on GPU (train_grpo_flux.py:279-289 enable_tiling)
        if vae_tiling not in ("auto", "on", "off"):
            raise ValueError(f"unknown vae_tiling {vae_tiling!r}")
        self._tile_decode = vae_tiling == "on" or (
            vae_tiling == "auto" and max(height, width) // 8 > 96
        )
        # vae_params is a jit ARGUMENT (not a closure): closed-over
        # pytrees are baked into the program as constants, which bloats
        # the (remote) compile payload by the full parameter size
        self._decode = jax.jit(self._decode_impl) if vae_params is not None else None

    def _decode_impl(self, vae_params, latents_packed):
        lat = unpack_latents(latents_packed, self.height, self.width)
        if self._tile_decode:
            from mixgrpo_tpu.models.flux.vae import vae_decode_tiled

            img = vae_decode_tiled(vae_params, self.vae_cfg,
                                   denormalize_latents(lat), dtype=self.dtype)
        else:
            img = vae_decode(vae_params, self.vae_cfg,
                             denormalize_latents(lat), dtype=self.dtype)
        return postprocess_images(img)

    def __call__(self, txt, pooled, rng, z0=None) -> jnp.ndarray:
        """txt: (B, L, 4096), pooled: (B, 768) -> images [0,1] or latents.

        ``z0`` overrides the initial packed latent noise (B, S_img, C) —
        used by the serving layer to honor per-request seeds inside a
        co-batched call (serve.py).
        """
        B = txt.shape[0]
        sampler = self._seg1 or self._seg2
        z = sampler.init_noise(rng, B) if z0 is None else z0
        k = self.mix_k
        if self._seg1 is not None:
            z = self._run_segment(self._seg1, self.tuned_params, z, txt,
                                  pooled, self.sigmas[: k + 1], rng)
        if self._seg2 is not None:
            z = self._run_segment(self._seg2, self.base_params, z, txt,
                                  pooled, self.sigmas[k:], rng)
        if self._decode is not None:
            return self._decode(self.vae_params, z)
        return z

    def _run_segment(self, sampler, params, z, txt, pooled, sigmas_seg, rng):
        """Run a deterministic ODE segment, optionally as bounded-duration
        chunks (``max_steps_per_call``).  Each chunk reuses the segment's
        single compiled program: the chunk schedule is padded to the fixed
        shape and the executed step count is passed as data."""
        T = len(sigmas_seg) - 1
        C = sampler.sampler_cfg.num_steps_max
        for s0 in range(0, T, C):
            n = min(C, T - s0)
            sig = np.asarray(sigmas_seg[s0 : s0 + n + 1], np.float32)
            if len(sig) < C + 1:  # pad the final short chunk (n is data)
                sig = np.concatenate(
                    [sig, np.full(C + 1 - len(sig), sig[-1], np.float32)])
            det = jnp.ones(C, bool)
            out = sampler.rollout(params, z, txt, pooled, sig, det, n, rng)
            z = out.final_latents
        return z


def save_outputs(
    images01, prompts: Sequence[str], output_dir: str, seeds: Sequence[int],
    process_index: int = 0,
):
    """PNG per prompt + metadata JSON (sample_flux.py:485-520)."""
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    meta = []
    arr = np.asarray(images01)
    for i, (img, prompt) in enumerate(zip(arr, prompts)):
        name = f"img_p{process_index}_{i:05d}.png"
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(output_dir, name)
        )
        meta.append({"image": name, "prompt": prompt, "seed": int(seeds[i])})
    with open(
        os.path.join(output_dir, f"metadata_{process_index}.json"), "w"
    ) as f:
        json.dump(meta, f, indent=2)
    return meta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", type=str, required=True)
    p.add_argument("--new_model_ckpt", type=str, default=None,
                   help="fine-tuned transformer safetensors")
    p.add_argument("--prompt_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--h", type=int, default=1024)
    p.add_argument("--w", type=int, default=1024)
    p.add_argument("--sampling_steps", type=int, default=50)
    p.add_argument("--mix_sampling_steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=3.5)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--clip_bpe_path", type=str,
                   default=os.environ.get("CLIP_BPE_PATH"))
    p.add_argument("--vae_tiling", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="tiled VAE decode (auto: on above 768px; parity "
                        "with the reference's vae.enable_tiling())")
    p.add_argument("--quant", type=str, default="none", choices=["none", "int8"],
                   help="int8: quantized DiT sampling (~2x throughput on TPU)")
    args = p.parse_args()

    from transformers import AutoTokenizer

    from mixgrpo_tpu.models.flux.load import (
        load_flux_params, load_safetensors_dir, load_vae_decoder_params,
    )
    from mixgrpo_tpu.models.text.clip import CLIPConfig
    from mixgrpo_tpu.models.text.clip_load import load_clip_hf_text_only
    from mixgrpo_tpu.models.text.t5 import T5Config, load_t5_hf
    from mixgrpo_tpu.preprocess import PromptEncoder, read_prompts
    from mixgrpo_tpu.rewards.tokenizer import CLIPTokenizer

    from mixgrpo_tpu.presets import flux_family

    fam = flux_family()  # MIXGRPO_MODEL_PRESET (flux-dev | tiny rehearsal)
    flux_cfg = fam["flux"]
    base = load_flux_params(os.path.join(args.model_path, "transformer"), flux_cfg)
    tuned = (
        load_flux_params(args.new_model_ckpt, flux_cfg)
        if args.new_model_ckpt else None
    )
    vae_cfg = fam["vae"]
    vae = load_vae_decoder_params(os.path.join(args.model_path, "vae"), vae_cfg)

    t5_cfg = fam["t5"]
    enc = PromptEncoder(
        load_t5_hf(load_safetensors_dir(
            os.path.join(args.model_path, "text_encoder_2")), t5_cfg),
        t5_cfg,
        AutoTokenizer.from_pretrained(os.path.join(args.model_path, "tokenizer_2")),
        load_clip_hf_text_only(load_safetensors_dir(
            os.path.join(args.model_path, "text_encoder")), fam["clip"]),
        fam["clip"],
        CLIPTokenizer(
            args.clip_bpe_path
            or os.path.join(args.model_path, "tokenizer", "merges.txt")
        ),
    )

    pipe = DualFluxPipeline(
        flux_cfg, base, tuned, vae_cfg=vae_cfg, vae_params=vae,
        height=args.h, width=args.w, num_steps=args.sampling_steps,
        mix_sampling_steps=args.mix_sampling_steps,
        guidance_scale=args.guidance_scale, quant=args.quant,
        vae_tiling=args.vae_tiling,
    )

    prompts = read_prompts(args.prompt_path)
    pi, pc = jax.process_index(), jax.process_count()
    mine = prompts[pi::pc]
    for i in range(0, len(mine), args.batch_size):
        chunk = mine[i : i + args.batch_size]
        emb, pooled = enc(chunk)
        seed = args.seed + pi * 100000 + i
        imgs = pipe(jnp.asarray(emb), jnp.asarray(pooled), jax.random.key(seed))
        save_outputs(imgs, chunk, args.output_dir,
                     [seed + j for j in range(len(chunk))], pi)
        main_print(f"sampled {i + len(chunk)}/{len(mine)}")


if __name__ == "__main__":
    main()
