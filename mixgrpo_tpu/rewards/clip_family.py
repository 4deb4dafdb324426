"""CLIP-family reward models: HPSv2.1, PickScore, CLIP-score.

Batched, jitted JAX forwards sharing one CLIP implementation
(models/text/clip.py) — the reference loops PIL images one at a time
through three separate stacks (open_clip for HPS + DFN, transformers for
PickScore; fastvideo/models/reward_model/{hps_score,pick_score,clip_score}.py).

Score formulas (parity):
  - HPSv2.1:    diag(img_feat @ txt_feat^T) on normalized features
                (hps_score.py:66-78) — cosine similarity.
  - PickScore:  exp(logit_scale) * cosine, then (s - 18) / 8
                (pick_score.py:80-82).
  - CLIP-score: cosine similarity (clip_score.py:56-72).

Each class takes a checkpoint path + tokenizer merges path; images enter
as (B, H, W, 3) float arrays in [0, 1] (decoded VAE output) and never
leave the device.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.text.clip import (
    CLIPConfig,
    clip_image_features,
    clip_text_features,
)
from mixgrpo_tpu.models.text.clip_load import (
    clip_config_from_checkpoint,
    load_clip_hf,
    load_clip_openclip,
    load_torch_state,
)
from mixgrpo_tpu.rewards.preprocess import clip_preprocess
from mixgrpo_tpu.rewards.tokenizer import CLIPTokenizer


class _ClipRewardBase:
    name = "clip_base"
    mean = 0.0
    std = 1.0
    use_logit_scale = False

    def __init__(
        self,
        params,
        cfg: CLIPConfig,
        tokenizer: Optional[CLIPTokenizer] = None,
        dtype=jnp.bfloat16,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self._score = jax.jit(functools.partial(self._score_impl, dtype=dtype))

    def _score_impl(self, params, images, token_ids, *, dtype):
        x = clip_preprocess(images, self.cfg.vision.image_size)
        img = clip_image_features(params, self.cfg, x, dtype=dtype)
        txt = clip_text_features(params, self.cfg, token_ids, dtype=dtype)
        score = jnp.sum(img * txt, axis=-1)
        if self.use_logit_scale:
            score = jnp.exp(params["logit_scale"]) * score
        return (score - self.mean) / self.std

    def score(self, images, token_ids) -> jnp.ndarray:
        """Batched device scoring with pre-tokenized prompts."""
        return self._score(self.params, images, jnp.asarray(token_ids, jnp.int32))

    def __call__(
        self, images, prompts: Sequence[str]
    ) -> Tuple[List[float], List[float]]:
        assert self.tokenizer is not None, f"{self.name}: tokenizer required"
        ids = self.tokenizer(list(prompts))
        s = np.asarray(self.score(jnp.asarray(images), ids), np.float64)
        return s.tolist(), [1.0] * len(s)


class HPSReward(_ClipRewardBase):
    """HPSv2.1 — OpenCLIP ViT-H-14 with the HPS_v2.1 checkpoint."""

    name = "hpsv2"

    @classmethod
    def from_checkpoint(cls, hps_ckpt_path: str, merges_path: Optional[str] = None,
                        **kw) -> "HPSReward":
        # HPS_v2.1_compressed.pt ships bare; ViT-H-14/224 is its published
        # geometry, but a sibling config JSON (if present) wins — including
        # its image_size (round-5 rehearsal finding: the old explicit
        # image_size=224 stomped the JSON's own value, so any non-224
        # OpenCLIP HPS variant would build a mismatched vision tower).
        cfg = clip_config_from_checkpoint(
            hps_ckpt_path, default=CLIPConfig.vit_h_14(image_size=224)
        )
        params = load_clip_openclip(load_torch_state(hps_ckpt_path), cfg)
        tok = CLIPTokenizer(merges_path) if merges_path else None
        return cls(params, cfg, tok, **kw)


class PickScoreReward(_ClipRewardBase):
    """PickScore_v1 — HF CLIP ViT-H; score = exp(logit_scale)*cos, (s-18)/8."""

    name = "pick_score"
    mean = 18.0
    std = 8.0
    use_logit_scale = True

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, merges_path: Optional[str] = None,
                        **kw) -> "PickScoreReward":
        from mixgrpo_tpu.models.flux.load import load_safetensors_dir

        # PickScore_v1 is an HF CLIPModel dir: read its config.json
        # (hidden_act, geometry) like the reference's from_pretrained does.
        cfg = clip_config_from_checkpoint(
            ckpt_path, default=CLIPConfig.vit_h_14(image_size=224)
        )
        params = load_clip_hf(load_safetensors_dir(ckpt_path), cfg)
        tok = CLIPTokenizer(merges_path) if merges_path else None
        return cls(params, cfg, tok, **kw)


class CLIPScoreReward(_ClipRewardBase):
    """DFN5B CLIP ViT-H-14-384 cosine similarity."""

    name = "clip_score"

    @classmethod
    def from_checkpoint(cls, ckpt_path: str, merges_path: Optional[str] = None,
                        image_size: Optional[int] = None, **kw) -> "CLIPScoreReward":
        # DFN5B publishes open_clip_config.json (quick_gelu=true, 384px);
        # introspect it rather than hard-coding — the reference builds from
        # checkpoint config too (clip_score.py:39 create_model_from_pretrained).
        from mixgrpo_tpu.models.text.clip_load import find_clip_config

        if find_clip_config(ckpt_path) is None:
            import warnings

            warnings.warn(
                f"no config JSON next to {ckpt_path!r}; assuming ViT-H-14/"
                f"{image_size or 384} with quick_gelu=False — DFN5B models "
                "are quickgelu variants, ship the open_clip_config.json"
            )
            cfg = CLIPConfig.vit_h_14(image_size=image_size or 384)
        else:
            cfg = clip_config_from_checkpoint(ckpt_path, image_size=image_size)
        params = load_clip_openclip(load_torch_state(ckpt_path), cfg)
        tok = CLIPTokenizer(merges_path) if merges_path else None
        return cls(params, cfg, tok, **kw)
