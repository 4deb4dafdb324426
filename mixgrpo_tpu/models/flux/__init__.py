from mixgrpo_tpu.models.flux.model import FluxConfig, flux_forward, init_flux, param_count
from mixgrpo_tpu.models.flux.rope import (
    apply_rope,
    make_image_ids,
    make_text_ids,
    rope_tables,
)
from mixgrpo_tpu.models.flux.latents import (
    pack_latents,
    unpack_latents,
    denormalize_latents,
    VAE_SCALE_FACTOR,
)

__all__ = [
    "FluxConfig",
    "flux_forward",
    "init_flux",
    "param_count",
    "apply_rope",
    "make_image_ids",
    "make_text_ids",
    "rope_tables",
    "pack_latents",
    "unpack_latents",
    "denormalize_latents",
    "VAE_SCALE_FACTOR",
]
