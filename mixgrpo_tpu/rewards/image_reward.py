"""ImageReward: BLIP backbone + linear score head.

Counterpart of the reference's external ``image-reward`` dependency
(zqqqqz2000/MixGRPO fastvideo/models/reward_model/image_reward.py:13-41,
THUDM/ImageReward ``inference_rank``), rebuilt natively:

  score = MLP(BLIP_text(prompt tokens, cross-attend BLIP_ViT(image))[CLS])
  reward = (score - 0.16717362830052426) / 1.0333394966054072

The MLP is the published head: 768 -> 1024 -> 128 -> 64 -> 16 -> 1, plain
linear stack (the official implementation has its activations commented
out — state-dict indices layers.{0,2,4,6,7} reflect the dropout slots).

Image preprocessing: BLIP resizes *square* to 224 (no aspect-preserving
crop) with the CLIP normalization constants.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.text.blip import (
    BlipTextConfig, BlipVisionConfig, blip_text_encode, blip_vision_encode,
    load_blip_text, load_blip_vision,
)
from mixgrpo_tpu.rewards.preprocess import CLIP_MEAN, CLIP_STD

IR_MEAN = 0.16717362830052426
IR_STD = 1.0333394966054072


def blip_preprocess(images, size: int = 224):
    """Square resize (BLIP transform) + CLIP normalization."""
    b, h, w, c = images.shape
    x = jax.image.resize(images, (b, size, size, c), method="cubic")
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (jnp.clip(x, 0.0, 1.0) - mean) / std


def mlp_head(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    for layer in params["layers"]:
        x = x @ layer["w"] + layer["b"]
    return x


class ImageRewardModel:
    name = "image_reward"

    def __init__(
        self,
        vision_params, vision_cfg: BlipVisionConfig,
        text_params, text_cfg: BlipTextConfig,
        mlp_params,
        tokenizer=None,
        max_len: int = 35,
        dtype=jnp.bfloat16,
    ):
        self.vp, self.vcfg = vision_params, vision_cfg
        self.tp, self.tcfg = text_params, text_cfg
        self.mlp = mlp_params
        self.tokenizer = tokenizer
        self.max_len = max_len
        self._score = jax.jit(
            lambda vp, tp, mp, imgs, ids, mask: self._score_impl(
                vp, tp, mp, imgs, ids, mask, dtype
            )
        )

    def _score_impl(self, vp, tp, mp, images, ids, mask, dtype):
        x = blip_preprocess(images, self.vcfg.image_size)
        img_emb = blip_vision_encode(vp, self.vcfg, x, dtype=dtype)
        txt = blip_text_encode(tp, self.tcfg, ids, mask, img_emb, dtype=dtype)
        score = mlp_head(mp, txt[:, 0].astype(jnp.float32))[:, 0]
        return (score - IR_MEAN) / IR_STD

    def score(self, images, token_ids, attention_mask) -> jnp.ndarray:
        return self._score(
            self.vp, self.tp, self.mlp, jnp.asarray(images),
            jnp.asarray(token_ids, jnp.int32), jnp.asarray(attention_mask, bool),
        )

    def __call__(
        self, images, prompts: Sequence[str]
    ) -> Tuple[List[float], List[float]]:
        assert self.tokenizer is not None, "image_reward: tokenizer required"
        enc = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.max_len, return_tensors="np",
        )
        s = np.asarray(
            self.score(images, enc["input_ids"], enc["attention_mask"]),
            np.float64,
        )
        return s.tolist(), [1.0] * len(s)

    @classmethod
    def from_checkpoint(
        cls, ckpt_path: str, med_config: Optional[str] = None,
        bert_vocab_dir: Optional[str] = None, **kw
    ) -> "ImageRewardModel":
        """Load ImageReward.pt (blip.visual_encoder.*, blip.text_encoder.*,
        mlp.layers.*)."""
        from mixgrpo_tpu.models.text.clip_load import load_torch_state

        st = load_torch_state(ckpt_path)
        vcfg = BlipVisionConfig.vit_large()
        tcfg = BlipTextConfig.base()
        vp = load_blip_vision(st, vcfg, prefix="blip.visual_encoder.")
        tp = load_blip_text(st, tcfg, prefix="blip.text_encoder.")
        mlp = {
            "layers": [
                {
                    "w": jnp.asarray(st[f"mlp.layers.{i}.weight"].astype(np.float32).T),
                    "b": jnp.asarray(st[f"mlp.layers.{i}.bias"].astype(np.float32)),
                }
                for i in (0, 2, 4, 6, 7)
            ]
        }
        tok = None
        if bert_vocab_dir:
            from transformers import BertTokenizerFast

            tok = BertTokenizerFast.from_pretrained(bert_vocab_dir)
        return cls(vp, vcfg, tp, tcfg, mlp, tok, **kw)
