"""Model zoo: FLUX (flagship policy), HunyuanVideo, Mochi, text/reward towers.

See ``mixgrpo_tpu.models.registry`` for the model_type -> entry mapping
(counterpart of the reference's fastvideo/utils/load.py registry).
"""

from mixgrpo_tpu.models.registry import available_models, get_model, load_vae

__all__ = ["available_models", "get_model", "load_vae"]
