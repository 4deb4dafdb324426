from mixgrpo_tpu.models.text.clip import (
    CLIPConfig,
    CLIPTowerConfig,
    init_clip,
    clip_image_features,
    clip_text_features,
)

__all__ = [
    "CLIPConfig",
    "CLIPTowerConfig",
    "init_clip",
    "clip_image_features",
    "clip_text_features",
]
