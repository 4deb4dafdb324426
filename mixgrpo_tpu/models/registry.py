"""Model loader registry.

Counterpart of zqqqqz2000/MixGRPO fastvideo/utils/load.py (``load_transformer``
/ ``load_vae`` per model_type, FSDP wrap-class table at :360-372).  Maps a
model_type string to (config factory, init fn, forward fn, checkpoint
loader) so apps stay model-agnostic.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional


class ModelEntry(NamedTuple):
    config: Callable[[], Any]
    init: Callable
    forward: Callable
    load: Optional[Callable] = None


def _flux_entry() -> ModelEntry:
    from mixgrpo_tpu.models.flux.load import load_flux_params
    from mixgrpo_tpu.models.flux.model import FluxConfig, flux_forward, init_flux

    return ModelEntry(FluxConfig.flux_dev, init_flux, flux_forward,
                      load_flux_params)


def _hunyuan_entry() -> ModelEntry:
    from mixgrpo_tpu.models.hunyuan.load import load_hunyuan_video
    from mixgrpo_tpu.models.hunyuan.model import (
        HunyuanVideoConfig, hunyuan_video_forward, init_hunyuan_video,
    )

    return ModelEntry(HunyuanVideoConfig.hunyuan_video, init_hunyuan_video,
                      hunyuan_video_forward, load_hunyuan_video)


def _mochi_entry() -> ModelEntry:
    from mixgrpo_tpu.models.mochi.model import (
        MochiConfig, init_mochi, mochi_forward,
    )

    return ModelEntry(MochiConfig.mochi_preview, init_mochi, mochi_forward)


_REGISTRY: Dict[str, Callable[[], ModelEntry]] = {
    "flux": _flux_entry,
    "hunyuan_video": _hunyuan_entry,
    "mochi": _mochi_entry,
}


def available_models():
    return sorted(_REGISTRY)


def get_model(model_type: str) -> ModelEntry:
    if model_type not in _REGISTRY:
        raise ValueError(
            f"unknown model_type {model_type!r}; available: {available_models()}"
        )
    return _REGISTRY[model_type]()


def load_vae(model_type: str):
    """VAE (decoder) entry per model family (load.py ``load_vae``)."""
    if model_type == "flux":
        from mixgrpo_tpu.models.flux.load import load_vae_decoder_params
        from mixgrpo_tpu.models.flux.vae import VAEConfig, init_vae_decoder, vae_decode

        return ModelEntry(VAEConfig.flux_dev, init_vae_decoder, vae_decode,
                          load_vae_decoder_params)
    if model_type == "hunyuan_video":
        from mixgrpo_tpu.models.hunyuan.vae3d import (
            CausalVAEConfig, causal_vae_decode, init_causal_vae_decoder,
        )

        return ModelEntry(CausalVAEConfig.hunyuan_video,
                          init_causal_vae_decoder, causal_vae_decode)
    raise ValueError(f"no VAE registered for {model_type!r}")
