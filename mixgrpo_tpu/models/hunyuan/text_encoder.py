"""HunyuanVideo text encoders: LLM hidden-state extractor + CLIP pooled.

Native rebuild of the reference ``TextEncoder``
(zqqqqz2000/MixGRPO fastvideo/models/hunyuan/text_encoder/__init__.py:1-353):

  - ``llm``: prompts are wrapped in an instruction template, tokenized,
    run through a Llama-3-style decoder reading
    ``hidden_states[-(skip+1)]`` (HunyuanVideo: skip=2), then the template
    prefix is cropped off (``crop_start``) so only prompt-conditioned
    states reach the DiT (:303-330).
  - ``clipL``: CLIP-L ``pooler_output`` as the global text vector.

The official template strings below are checkpoint wire format: the
released HunyuanVideo DiT was trained on LLM states produced under exactly
these instructions, and the crop offsets (36 image / 95 video) are their
token counts under the llava-llama-3 tokenizer — same category as the
UnifiedReward question templates (constants.py:34-57).  A paraphrased
template set lives in ``prompting.PROMPT_TEMPLATES`` for from-scratch
training.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.models.text.llama import (
    LlamaConfig, llama_hidden_states, load_llama_hf,
)

# Official HunyuanVideo encode templates (reference constants.py:34-46) —
# wire format for the released checkpoint; do not reword when loading
# official weights.
HUNYUAN_PROMPT_TEMPLATE_ENCODE = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the image by "
    "detailing the color, shape, size, texture, quantity, text, spatial "
    "relationships of the objects and background:<|eot_id|>"
    "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
)
HUNYUAN_PROMPT_TEMPLATE_ENCODE_VIDEO = (
    "<|start_header_id|>system<|end_header_id|>\n\nDescribe the video by "
    "detailing the following aspects: "
    "1. The main content and theme of the video."
    "2. The color, shape, size, texture, quantity, text, and spatial "
    "relationships of the objects."
    "3. Actions, events, behaviors temporal relationships, physical "
    "movement changes of the objects."
    "4. background environment, light, style and atmosphere."
    "5. camera angles, movements, and transitions used in the video:"
    "<|eot_id|><|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
)
HUNYUAN_PROMPT_TEMPLATES = {
    "dit-llm-encode": {
        "template": HUNYUAN_PROMPT_TEMPLATE_ENCODE,
        "crop_start": 36,
    },
    "dit-llm-encode-video": {
        "template": HUNYUAN_PROMPT_TEMPLATE_ENCODE_VIDEO,
        "crop_start": 95,
    },
}


@dataclasses.dataclass
class LLMTextEncoder:
    """LLM hidden-state text encoder (the reference's ``llm`` branch).

    ``tokenize_fn(texts, max_length) -> (ids, mask)`` abstracts the
    tokenizer: pass :func:`hf_tokenize_fn` for a real checkpoint, or any
    callable in tests.  ``encode`` is the jitted compute path.
    """

    params: Any
    cfg: LlamaConfig
    tokenize_fn: Callable[[list, int], Tuple[np.ndarray, np.ndarray]]
    max_length: int = 256
    hidden_state_skip_layer: int = 2
    apply_final_norm: bool = False
    prompt_template: Optional[Dict[str, Any]] = None
    prompt_template_video: Optional[Dict[str, Any]] = None
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        self._encode = jax.jit(
            partial(
                llama_hidden_states,
                hidden_state_skip_layer=self.hidden_state_skip_layer,
                apply_final_norm=self.apply_final_norm,
                dtype=self.dtype,
            ),
            static_argnums=(1,),
        )

    def _template_for(self, data_type: str) -> Optional[Dict[str, Any]]:
        if data_type == "image":
            return self.prompt_template
        if data_type == "video":
            return self.prompt_template_video
        raise ValueError(f"Unsupported data type: {data_type}")

    def text2tokens(self, text, data_type: str = "image"):
        """Apply the instruction template and tokenize to max_length
        (text_encoder/__init__.py:215-263).  Returns (ids, mask) numpy."""
        texts = [text] if isinstance(text, str) else list(text)
        tpl = self._template_for(data_type)
        crop = 0
        if tpl is not None:
            texts = [tpl["template"].format(t) for t in texts]
            crop = int(tpl.get("crop_start", 0))
        ids, mask = self.tokenize_fn(texts, self.max_length + max(crop, 0))
        return np.asarray(ids), np.asarray(mask)

    def encode(
        self, ids, mask, data_type: str = "image"
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """-> (hidden_state (B, L, D) f32, attention_mask (B, L)).

        Crops the template prefix so only prompt tokens remain
        (text_encoder/__init__.py:313-330)."""
        hidden = self._encode(self.params, self.cfg, jnp.asarray(ids),
                              jnp.asarray(mask))
        tpl = self._template_for(data_type)
        crop = int(tpl.get("crop_start", -1)) if tpl is not None else -1
        mask = jnp.asarray(mask)
        if crop > 0:
            hidden = hidden[:, crop:]
            mask = mask[:, crop:]
        return hidden, mask

    def __call__(self, text, data_type: str = "image"):
        ids, mask = self.text2tokens(text, data_type)
        return self.encode(ids, mask, data_type)

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        tokenizer_path: Optional[str] = None,
        cfg: Optional[LlamaConfig] = None,
        template_id: str = "dit-llm-encode",
        template_id_video: str = "dit-llm-encode-video",
        **kw,
    ) -> "LLMTextEncoder":
        """Load an HF LlamaModel safetensors dir + tokenizer."""
        from mixgrpo_tpu.models.flux.load import load_safetensors_dir

        cfg = cfg or LlamaConfig.llava_llama3_8b()
        params = load_llama_hf(load_safetensors_dir(path), cfg)
        return cls(
            params=params, cfg=cfg,
            tokenize_fn=hf_tokenize_fn(tokenizer_path or path),
            prompt_template=HUNYUAN_PROMPT_TEMPLATES[template_id],
            prompt_template_video=HUNYUAN_PROMPT_TEMPLATES[template_id_video],
            **kw,
        )


def hf_tokenize_fn(tokenizer_path: str):
    """Right-padded max_length tokenization via transformers
    (load_tokenizer, text_encoder/__init__.py:57-77)."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tokenizer_path, padding_side="right")

    def fn(texts, max_length):
        enc = tok(
            texts, truncation=True, max_length=max_length,
            padding="max_length", return_tensors="np",
            return_attention_mask=True,
        )
        return enc["input_ids"], enc["attention_mask"]

    return fn


@dataclasses.dataclass
class CLIPTextPooler:
    """CLIP-L pooled text vector (the reference's ``clipL`` branch,
    output_key='pooler_output', text_encoder/__init__.py:168-171)."""

    params: Any
    cfg: Any
    tokenize_fn: Callable[[list, int], Tuple[np.ndarray, np.ndarray]]
    max_length: int = 77
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        from mixgrpo_tpu.models.text.clip import clip_text_features

        self._encode = jax.jit(
            lambda p, ids: clip_text_features(
                p, self.cfg, ids, dtype=self.dtype, project=False
            )
        )

    def __call__(self, text) -> jnp.ndarray:
        texts = [text] if isinstance(text, str) else list(text)
        ids, _ = self.tokenize_fn(texts, self.max_length)
        return self._encode(self.params, jnp.asarray(ids))
