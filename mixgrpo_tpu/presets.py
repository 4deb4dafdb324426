"""Model-geometry presets for the FLUX app stack.

``MIXGRPO_MODEL_PRESET`` selects the geometry every CLI app builds its
configs from:

- ``flux-dev`` (default): the released FLUX.1-dev geometry — 12B DiT,
  T5-XXL, CLIP-L (reference fastvideo/train_grpo_flux.py:677-701 model
  loading).
- ``tiny``: a mutually-consistent reduced geometry using the SAME file
  formats, loader paths, and app plumbing.  Used by the deploy rehearsal
  (VERDICT r4 #8): ``scripts/make_rehearsal_ckpts.py`` writes a synthetic
  checkpoint tree in the released directory layout and
  ``scripts/first_deploy.sh`` then executes every line of the deploy
  procedure against it — so deploy day runs a script whose every branch
  has already executed, with only the weights swapped.

The preset covers only the FLUX family the deploy path touches; video
models keep their explicit configs (their loaders take cfg arguments).
"""

from __future__ import annotations

import os
from typing import Dict, Optional


def flux_family(preset: Optional[str] = None) -> Dict[str, object]:
    """Returns ``{"flux", "vae", "t5", "clip"}`` config objects.

    The tiny family is mutually consistent the way the real one is:
    ``t5.d_model == flux.context_dim`` (prompt embeddings feed the DiT),
    ``clip.text.width == flux.pooled_dim`` (the pooled projection input),
    ``vae.latent_channels == flux.in_channels // 4`` (2x2 latent packing),
    and the CLIP text vocab covers the full CLIP BPE id range produced by
    ``rewards.tokenizer.CLIPTokenizer`` (512 byte tokens + merges + 2
    specials), so real tokenizers run against it.
    """
    name = preset or os.environ.get("MIXGRPO_MODEL_PRESET", "flux-dev")
    from mixgrpo_tpu.models.flux.model import FluxConfig
    from mixgrpo_tpu.models.flux.vae import VAEConfig
    from mixgrpo_tpu.models.text.clip import CLIPConfig, CLIPTowerConfig
    from mixgrpo_tpu.models.text.t5 import T5Config

    if name == "flux-dev":
        return {
            "flux": FluxConfig.flux_dev(),
            "vae": VAEConfig.flux_dev(),
            "t5": T5Config.xxl(),
            "clip": CLIPConfig.vit_l_14(),
        }
    if name == "tiny":
        flux = FluxConfig.tiny(context_dim=32, pooled_dim=32)
        return {
            "flux": flux,
            "vae": VAEConfig.tiny(latent_channels=flux.in_channels // 4),
            "t5": T5Config.tiny(),  # d_model=32 == flux.context_dim
            "clip": CLIPConfig(
                embed_dim=16,
                vision=CLIPTowerConfig(width=32, layers=2, heads=2, patch=8,
                                       image_size=64),
                # vocab 640 >= CLIP BPE id range for a small merges table
                # (512 byte/byte</w> tokens + merges + 2 specials)
                text=CLIPTowerConfig(width=32, layers=2, heads=2, vocab=640,
                                     context=77),
                quick_gelu=True,
            ),
        }
    raise ValueError(
        f"unknown MIXGRPO_MODEL_PRESET {name!r} (flux-dev | tiny)"
    )
