"""HunyuanVideoSampler: the user-facing predict() wrapper.

Counterpart of the reference's ``HunyuanVideoSampler``
(zqqqqz2000/MixGRPO fastvideo/models/hunyuan/inference.py:277-534):
argument validation ((video_length-1) % 4 == 0), reference seed semantics
(int / per-prompt list / full list / None -> random), per-sample
generators, negative-prompt default, and a result dict with
``samples`` + ``seeds``.  The denoising itself runs through
``HunyuanVideoPipeline`` (one jitted lax.scan).

HunyuanVideo is embedded-guidance distilled; like the reference's default
recipe (inference.py:366-369 guidance_scale=6 passed to the *embedded*
guidance, CFG batch disabled at cfg_scale=1), the negative prompt is
carried in the output metadata but no CFG pass is run.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Union

import jax
import numpy as np

from mixgrpo_tpu.models.hunyuan.pipeline import HunyuanVideoPipeline
from mixgrpo_tpu.models.hunyuan.prompting import NEGATIVE_PROMPT


def _resolve_seeds(
    seed: Union[None, int, Sequence[int]], batch_size: int, num_videos: int,
) -> List[int]:
    """Reference seed fan-out (inference.py:392-424)."""
    if seed is None:
        return [random.randint(0, 1_000_000)
                for _ in range(batch_size * num_videos)]
    if isinstance(seed, int):
        return [seed + i for _ in range(batch_size) for i in range(num_videos)]
    seed = list(seed)
    if len(seed) == batch_size:
        return [int(s) + j for s in seed for j in range(num_videos)]
    if len(seed) == batch_size * num_videos:
        return [int(s) for s in seed]
    raise ValueError(
        f"Length of seed must equal batch_size ({batch_size}) or "
        f"batch_size * num_videos_per_prompt "
        f"({batch_size * num_videos}), got {len(seed)}."
    )


class HunyuanVideoSampler:
    def __init__(self, pipeline: HunyuanVideoPipeline):
        self.pipeline = pipeline
        self.default_negative_prompt = NEGATIVE_PROMPT

    def predict(
        self,
        prompt: Union[str, Sequence[str]],
        height: int = 192,
        width: int = 336,
        video_length: int = 129,
        seed: Union[None, int, Sequence[int]] = None,
        negative_prompt: Optional[str] = None,
        num_videos_per_prompt: int = 1,
        **kwargs,
    ) -> dict:
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        if width <= 0 or height <= 0 or video_length <= 0:
            raise ValueError(
                "`height`, `width` and `video_length` must be positive, got "
                f"height={height}, width={width}, video_length={video_length}"
            )
        if (video_length - 1) % 4 != 0:
            raise ValueError(
                f"`video_length-1` must be a multiple of 4, got {video_length}"
            )
        if negative_prompt is None:
            negative_prompt = self.default_negative_prompt

        seeds = _resolve_seeds(seed, len(prompts), num_videos_per_prompt)
        txt, mask, pooled = self.pipeline.encode_prompt(prompts)
        samples = []
        i = 0
        for p_idx in range(len(prompts)):
            for _ in range(num_videos_per_prompt):
                out = self.pipeline(
                    txt[p_idx : p_idx + 1], pooled[p_idx : p_idx + 1],
                    video_length=video_length, height=height, width=width,
                    text_mask=mask[p_idx : p_idx + 1],
                    rng=jax.random.key(seeds[i]),
                )
                samples.append(np.asarray(out[0]))
                i += 1
        return {
            "samples": samples,
            "seeds": seeds,
            "prompts": prompts,
            "negative_prompt": negative_prompt,
        }
