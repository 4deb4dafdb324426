"""Prompt-embedding preprocessing app: T5-XXL + CLIP-L -> embedding cache.

Counterpart of zqqqqz2000/MixGRPO
fastvideo/data_preprocess/preprocess_flux_embedding.py: the reference runs
torchrun x8, encodes prompts through diffusers ``FluxPipeline.encode_prompt``
(:83-91) and saves three .pt files per prompt plus a gathered prompt.json
(:97-115).  Here both encoders are our JAX towers (models/text/{t5,clip}.py),
encoding is batched + jitted, hosts shard the prompt list by index, and the
output is the sharded safetensors cache of data/dataset.py.

FLUX conditioning contract: ``prompt_embed`` = T5-XXL last hidden states at
512 tokens; ``pooled`` = CLIP-L text EOT features *before* the projection
head (diffusers uses pooler_output of CLIPTextModel); text_ids are zeros
(derived, not stored).
"""

from __future__ import annotations

import argparse
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mixgrpo_tpu.data.dataset import EmbeddingCacheWriter
from mixgrpo_tpu.models.text.t5 import T5Config, t5_encode
from mixgrpo_tpu.utils.logging import main_print


def read_prompts(path: str) -> List[str]:
    """Plain prompts.txt, one prompt per line (README flow; fixes the
    broken-at-HEAD get_all_data which json-parses the path string,
    SURVEY.md §8.3).  A directory reads every ``*.txt`` inside, sorted —
    the ``--prompt_dir`` flag's namesake case (round-5 rehearsal finding:
    passing the directory crashed)."""
    import glob

    files = (
        sorted(glob.glob(os.path.join(path, "*.txt")))
        if os.path.isdir(path) else [path]
    )
    out: List[str] = []
    for fp in files:
        with open(fp) as f:
            out.extend(ln.strip() for ln in f if ln.strip())
    return out


class PromptEncoder:
    """Batched T5 + CLIP-L prompt encoder (jitted once)."""

    def __init__(
        self,
        t5_params, t5_cfg: T5Config, t5_tokenizer,
        clip_params, clip_cfg, clip_tokenizer,
        max_len: int = 512,
        dtype=jnp.bfloat16,
    ):
        self.t5_params, self.t5_cfg, self.t5_tok = t5_params, t5_cfg, t5_tokenizer
        self.clip_params, self.clip_cfg, self.clip_tok = (
            clip_params, clip_cfg, clip_tokenizer,
        )
        self.max_len = max_len
        self._t5 = jax.jit(
            lambda p, ids: t5_encode(p, t5_cfg, ids, dtype=dtype)
        )
        from mixgrpo_tpu.models.text.clip import clip_text_features

        # FLUX pooled projection uses the *unprojected* EOT hidden state
        self._clip = jax.jit(
            lambda p, ids: clip_text_features(
                p, clip_cfg, ids, dtype=dtype, normalize=False, project=False
            )
        )

    def __call__(self, prompts: Sequence[str]):
        t5_ids = self.t5_tok(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.max_len, return_tensors="np",
        )["input_ids"].astype(np.int32)
        emb = np.asarray(self._t5(self.t5_params, t5_ids), np.float32)
        clip_ids = self.clip_tok(list(prompts))
        pooled = np.asarray(self._clip(self.clip_params, clip_ids), np.float32)
        return emb, pooled


def run_preprocess(
    prompts: List[str],
    encoder: PromptEncoder,
    output_dir: str,
    batch_size: int = 8,
    process_index: int = 0,
    process_count: int = 1,
) -> str:
    """Encode this host's shard and write its cache directory.

    Each host writes ``{output_dir}/host_{i}``; single-host runs write the
    cache at ``output_dir`` directly.
    """
    mine = prompts[process_index::process_count]
    out = (
        output_dir if process_count == 1
        else os.path.join(output_dir, f"host_{process_index}")
    )
    w = EmbeddingCacheWriter(out)
    for i in range(0, len(mine), batch_size):
        chunk = mine[i : i + batch_size]
        emb, pooled = encoder(chunk)
        for j, c in enumerate(chunk):
            w.add(emb[j], pooled[j], c)
        main_print(f"encoded {i + len(chunk)}/{len(mine)}")
    return w.finish()


def build_prompt_encoder_from_dir(
    model_path: str, max_len: int = 512, clip_bpe_path: str = None,
) -> "PromptEncoder":
    """PromptEncoder from a local FLUX HF-layout dir (text_encoder/,
    text_encoder_2/, tokenizer/, tokenizer_2/).  Shared by the preprocess
    CLI and the inference server (serve.py)."""
    import os

    from transformers import AutoTokenizer

    from mixgrpo_tpu.models.flux.load import load_safetensors_dir
    from mixgrpo_tpu.models.text.clip import CLIPConfig
    from mixgrpo_tpu.models.text.clip_load import load_clip_hf_text_only
    from mixgrpo_tpu.models.text.t5 import T5Config, load_t5_hf
    from mixgrpo_tpu.rewards.tokenizer import CLIPTokenizer

    from mixgrpo_tpu.presets import flux_family

    fam = flux_family()  # MIXGRPO_MODEL_PRESET (flux-dev | tiny rehearsal)
    t5_cfg = fam["t5"]
    t5_params = load_t5_hf(
        load_safetensors_dir(os.path.join(model_path, "text_encoder_2")),
        t5_cfg,
    )
    t5_tok = AutoTokenizer.from_pretrained(
        os.path.join(model_path, "tokenizer_2")
    )
    clip_cfg = fam["clip"]
    clip_params = load_clip_hf_text_only(
        load_safetensors_dir(os.path.join(model_path, "text_encoder")),
        clip_cfg,
    )
    # merges default: the FLUX HF layout ships the CLIP BPE table at
    # tokenizer/merges.txt — fall back to it so a bare model_path works
    # (round-5 rehearsal finding: with no CLIP_BPE_PATH this crashed)
    merges = clip_bpe_path or os.environ.get("CLIP_BPE_PATH")
    if not merges:
        cand = os.path.join(model_path, "tokenizer", "merges.txt")
        merges = cand if os.path.exists(cand) else None
    clip_tok = CLIPTokenizer(merges)
    return PromptEncoder(
        t5_params, t5_cfg, t5_tok, clip_params, clip_cfg, clip_tok,
        max_len=max_len,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--prompt_dir", type=str, required=True,
                   help="prompts.txt path")
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--model_path", type=str, required=True,
                   help="local FLUX HF layout dir (text_encoder/, "
                        "text_encoder_2/, tokenizer/, tokenizer_2/)")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_len", type=int, default=512)
    p.add_argument("--clip_bpe_path", type=str,
                   default=os.environ.get("CLIP_BPE_PATH"))
    args = p.parse_args()

    enc = build_prompt_encoder_from_dir(
        args.model_path, max_len=args.max_len,
        clip_bpe_path=args.clip_bpe_path,
    )
    prompts = read_prompts(args.prompt_dir)
    run_preprocess(
        prompts, enc, args.output_dir, args.batch_size,
        jax.process_index(), jax.process_count(),
    )


if __name__ == "__main__":
    main()
