"""Embedding cache write/read, cfg dropout, host-sharded loader."""

import numpy as np
import pytest

from mixgrpo_tpu.data.dataset import (
    EmbeddingCacheWriter,
    LatentDataset,
    PromptLoader,
)


@pytest.fixture()
def cache_dir(tmp_path):
    rng = np.random.default_rng(0)
    w = EmbeddingCacheWriter(str(tmp_path), shard_size=4)
    for i in range(10):
        w.add(
            rng.normal(size=(8, 16)).astype(np.float32),
            rng.normal(size=(4,)).astype(np.float32),
            f"prompt {i}",
        )
    w.finish()
    return str(tmp_path)


def test_cache_roundtrip(cache_dir):
    ds = LatentDataset(cache_dir)
    assert len(ds) == 10
    s = ds.get(7)
    assert s["prompt_embed"].shape == (8, 16)
    assert s["pooled"].shape == (4,)
    assert s["caption"] == "prompt 7"
    # shards of 4 -> 3 shards
    assert len(ds.manifest["shards"]) == 3


def test_cfg_dropout_deterministic(cache_dir):
    ds = LatentDataset(cache_dir, cfg_rate=0.5, seed=1)
    drops1 = [bool((ds.get(i, epoch=0)["prompt_embed"] == 0).all()) for i in range(10)]
    drops2 = [bool((ds.get(i, epoch=0)["prompt_embed"] == 0).all()) for i in range(10)]
    assert drops1 == drops2
    assert any(drops1) and not all(drops1)
    drops_e1 = [bool((ds.get(i, epoch=1)["prompt_embed"] == 0).all()) for i in range(10)]
    assert drops1 != drops_e1  # epoch changes the draw


def test_loader_shards_cover_dataset(cache_dir):
    ds = LatentDataset(cache_dir)
    seen = []
    for pi in range(2):
        loader = PromptLoader(
            ds, batch_size=2, seed=3, process_index=pi, process_count=2,
            drop_last=False,
        )
        for batch in loader.epoch(0):
            seen.extend(batch["captions"])
            assert batch["prompt_embed"].shape[0] == len(batch["captions"])
    # padded to equal host counts: 10 items -> 10 seen (5 per host), all covered
    assert len(seen) == 10
    assert set(seen) == {f"prompt {i}" for i in range(10)}


def test_loader_deterministic_and_shuffled(cache_dir):
    ds = LatentDataset(cache_dir)
    l1 = [b["captions"] for b in PromptLoader(ds, 2, seed=3).epoch(0)]
    l2 = [b["captions"] for b in PromptLoader(ds, 2, seed=3).epoch(0)]
    assert l1 == l2
    l3 = [b["captions"] for b in PromptLoader(ds, 2, seed=3).epoch(1)]
    assert l1 != l3
