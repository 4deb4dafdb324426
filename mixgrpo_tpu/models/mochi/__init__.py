from mixgrpo_tpu.models.mochi.model import (
    MochiConfig,
    init_mochi,
    mochi_forward,
)

__all__ = ["MochiConfig", "init_mochi", "mochi_forward"]
