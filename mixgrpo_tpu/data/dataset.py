"""Prompt-embedding cache + RL dataset/loader.

Counterpart of the reference's cached-embedding data layer
(zqqqqz2000/MixGRPO fastvideo/dataset/latent_flux_rl_datasets.py:19-94:
per-sample ``prompt_embed/i.pt`` + ``pooled_prompt_embeds/i.pt`` +
``text_ids/i.pt`` torch files with a ``prompt.json`` manifest, cfg-rate
dropout to zero embeddings, torch ``DistributedSampler`` sharding).

TPU-first redesign:
  - embeddings live in **sharded safetensors** files (mmap-able, lazily
    sliced with ``safe_open`` — no 10k tiny .pt files, no unpickling);
  - FLUX ``text_ids`` are always zeros (train_grpo_flux.py:139 just
    repeats a zero tensor), so they are derived, not stored;
  - host sharding is ``process_index/process_count`` arithmetic on a
    seeded epoch permutation (replaces DistributedSampler);
  - a reader for the reference's .pt cache layout is provided for
    drop-in migration.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List

import numpy as np

_MANIFEST = "manifest.json"


class EmbeddingCacheWriter:
    """Accumulate encoded prompts and write sharded safetensors + manifest."""

    def __init__(self, out_dir: str, shard_size: int = 1024):
        self.out_dir = out_dir
        self.shard_size = shard_size
        os.makedirs(out_dir, exist_ok=True)
        self._buf: List[Dict[str, np.ndarray]] = []
        self._captions: List[str] = []
        self._shards: List[dict] = []

    def add(self, prompt_embed: np.ndarray, pooled: np.ndarray, caption: str):
        self._buf.append({
            "prompt_embed": np.asarray(prompt_embed, np.float16),
            "pooled": np.asarray(pooled, np.float16),
        })
        self._captions.append(caption)
        if len(self._buf) >= self.shard_size:
            self._flush()

    def _flush(self):
        if not self._buf:
            return
        from safetensors.numpy import save_file

        idx = len(self._shards)
        name = f"shard_{idx:05d}.safetensors"
        arrs = {
            "prompt_embed": np.stack([b["prompt_embed"] for b in self._buf]),
            "pooled": np.stack([b["pooled"] for b in self._buf]),
        }
        save_file(arrs, os.path.join(self.out_dir, name))
        self._shards.append({"file": name, "num": len(self._buf)})
        self._buf = []

    def finish(self) -> str:
        self._flush()
        manifest = {
            "version": 1,
            "num_samples": len(self._captions),
            "shards": self._shards,
            "captions": self._captions,
        }
        path = os.path.join(self.out_dir, _MANIFEST)
        with open(path, "w") as f:
            json.dump(manifest, f)
        return path


class LatentDataset:
    """Random access over the embedding cache with cfg-rate dropout.

    cfg dropout parity: with probability ``cfg_rate`` a sample's embeddings
    are replaced by zeros (latent_flux_rl_datasets.py:55-56); the dropout
    draw is a pure function of (seed, epoch, index) for reproducibility.
    """

    def __init__(
        self,
        cache_dir: str,
        cfg_rate: float = 0.0,
        seed: int = 0,
        use_native: bool | None = None,
    ):
        self.cache_dir = cache_dir
        self.cfg_rate = cfg_rate
        self.seed = seed
        with open(os.path.join(cache_dir, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self.captions: List[str] = self.manifest["captions"]
        self._index = []  # sample -> (shard_idx, row)
        for si, sh in enumerate(self.manifest["shards"]):
            for r in range(sh["num"]):
                self._index.append((si, r))
        self._handles: Dict[int, object] = {}
        if use_native is None:
            from mixgrpo_tpu.data.native_loader import NativeShardReader

            use_native = NativeShardReader.available()
        self.use_native = use_native

    def __len__(self) -> int:
        return self.manifest["num_samples"]

    def _shard(self, si: int):
        if si not in self._handles:
            path = os.path.join(self.cache_dir, self.manifest["shards"][si]["file"])
            if self.use_native:
                from mixgrpo_tpu.data.native_loader import NativeShardReader

                self._handles[si] = NativeShardReader(path)
            else:
                from safetensors import safe_open

                self._handles[si] = safe_open(path, framework="numpy")
        return self._handles[si]

    def get(self, i: int, epoch: int = 0) -> Dict[str, object]:
        si, row = self._index[i]
        sh = self._shard(si)
        if self.use_native:
            emb = sh.gather_rows("prompt_embed", [row])[0]
            pooled = sh.gather_rows("pooled", [row])[0]
        else:
            emb = np.asarray(sh.get_slice("prompt_embed")[row], np.float32)
            pooled = np.asarray(sh.get_slice("pooled")[row], np.float32)
        caption = self.captions[i]
        if self.cfg_rate > 0:
            rng = np.random.default_rng((self.seed, epoch, i))
            if rng.random() < self.cfg_rate:
                emb = np.zeros_like(emb)
                pooled = np.zeros_like(pooled)
                caption = ""
        return {"prompt_embed": emb, "pooled": pooled, "caption": caption}

    @classmethod
    def from_reference_cache(
        cls, data_dir: str, cfg_rate: float = 0.0, seed: int = 0
    ) -> "LatentDataset":
        """Convert a reference-format cache (prompt_embed/i.pt + prompt.json,
        latent_flux_rl_datasets.py:19-53) into our shard format in-place
        under ``<data_dir>/mixgrpo_cache`` and open it."""
        import torch

        with open(os.path.join(data_dir, "prompt.json")) as f:
            entries = json.load(f)
        out = os.path.join(data_dir, "mixgrpo_cache")
        if not os.path.exists(os.path.join(out, _MANIFEST)):
            w = EmbeddingCacheWriter(out)
            for e in entries:
                emb = torch.load(
                    os.path.join(data_dir, e["prompt_embed_path"]),
                    map_location="cpu", weights_only=True,
                ).float().numpy()
                pooled = torch.load(
                    os.path.join(data_dir, e["pooled_prompt_embeds_path"]),
                    map_location="cpu", weights_only=True,
                ).float().numpy()
                w.add(emb, pooled, e.get("caption", e.get("prompt", "")))
            w.finish()
        return cls(out, cfg_rate, seed)


class PromptLoader:
    """Epoch-shuffled, host-sharded batch iterator.

    Replaces DistributedSampler + DataLoader + the SP dataloader wrapper
    (communications_flux.py:312-344): each host takes a contiguous slice of
    a seeded permutation; batches are numpy stacks ready for device_put.
    """

    def __init__(
        self,
        dataset: LatentDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        drop_last: bool = True,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last

    def epoch(self, epoch: int) -> Iterator[Dict[str, object]]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        # pad so every host sees the same number of samples
        per = -(-n // self.process_count)
        padded = np.concatenate([order, order[: per * self.process_count - n]])
        mine = padded[self.process_index :: self.process_count]
        nb = len(mine) // self.batch_size if self.drop_last else -(-len(mine) // self.batch_size)
        for b in range(nb):
            idx = mine[b * self.batch_size : (b + 1) * self.batch_size]
            items = [self.ds.get(int(i), epoch) for i in idx]
            yield {
                "prompt_embed": np.stack([it["prompt_embed"] for it in items]),
                "pooled": np.stack([it["pooled"] for it in items]),
                "captions": [it["caption"] for it in items],
            }

    def __iter__(self):
        epoch = 0
        while True:
            yield from self.epoch(epoch)
            epoch += 1
