from mixgrpo_tpu.models.hunyuan.model import (
    HunyuanVideoConfig,
    init_hunyuan_video,
    hunyuan_video_forward,
    make_video_ids,
)
from mixgrpo_tpu.models.hunyuan.load import (
    convert_hunyuan_state_dict,
    export_hunyuan_state_dict,
    infer_hunyuan_config,
    load_hunyuan_video,
)
from mixgrpo_tpu.models.hunyuan.scheduler import FlowMatchDiscreteScheduler
from mixgrpo_tpu.models.hunyuan.sampler import HunyuanVideoSampler

__all__ = [
    "HunyuanVideoConfig",
    "init_hunyuan_video",
    "hunyuan_video_forward",
    "make_video_ids",
    "convert_hunyuan_state_dict",
    "export_hunyuan_state_dict",
    "infer_hunyuan_config",
    "load_hunyuan_video",
    "FlowMatchDiscreteScheduler",
    "HunyuanVideoSampler",
]
