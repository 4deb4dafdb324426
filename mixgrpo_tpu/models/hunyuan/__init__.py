from mixgrpo_tpu.models.hunyuan.model import (
    HunyuanVideoConfig,
    init_hunyuan_video,
    hunyuan_video_forward,
    make_video_ids,
)
from mixgrpo_tpu.models.hunyuan.scheduler import FlowMatchDiscreteScheduler
from mixgrpo_tpu.models.hunyuan.sampler import HunyuanVideoSampler

__all__ = [
    "HunyuanVideoConfig",
    "init_hunyuan_video",
    "hunyuan_video_forward",
    "make_video_ids",
    "FlowMatchDiscreteScheduler",
    "HunyuanVideoSampler",
]
