from mixgrpo_tpu.utils.logging import main_print, MetricLogger
from mixgrpo_tpu.utils.checkpoint import CheckpointManager, export_flux_safetensors

__all__ = ["main_print", "MetricLogger", "CheckpointManager", "export_flux_safetensors"]
