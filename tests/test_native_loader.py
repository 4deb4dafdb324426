"""Native C++ cache reader vs safetensors reference reads."""

import numpy as np
import pytest

from mixgrpo_tpu.data.dataset import EmbeddingCacheWriter, LatentDataset
from mixgrpo_tpu.data.native_loader import (
    NativeShardReader,
    parse_safetensors_header,
)

needs_native = pytest.mark.skipif(
    not NativeShardReader.available(), reason="no C++ toolchain"
)


@pytest.fixture()
def shard(tmp_path):
    rng = np.random.default_rng(0)
    w = EmbeddingCacheWriter(str(tmp_path), shard_size=16)
    data = []
    for i in range(10):
        emb = rng.normal(size=(6, 8)).astype(np.float32)
        pooled = rng.normal(size=(4,)).astype(np.float32)
        # include denormal/extreme halves to exercise the converter
        emb[0, 0] = 6e-8
        emb[0, 1] = -65504.0
        data.append((emb, pooled))
        w.add(emb, pooled, f"p{i}")
    w.finish()
    return str(tmp_path), data


def test_header_parse(shard):
    path, _ = shard
    import os

    f = os.path.join(path, "shard_00000.safetensors")
    hdr = parse_safetensors_header(f)
    assert hdr["prompt_embed"]["dtype"] == "F16"
    assert hdr["prompt_embed"]["shape"] == (10, 6, 8)
    assert hdr["pooled"]["shape"] == (10, 4)


@needs_native
def test_native_gather_matches_safetensors(shard):
    path, data = shard
    import os

    f = os.path.join(path, "shard_00000.safetensors")
    r = NativeShardReader(f)
    got = r.gather_rows("prompt_embed", [3, 0, 7])
    want = np.stack([data[3][0], data[0][0], data[7][0]]).astype(np.float16)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=0)
    got_p = r.gather_rows("pooled", list(range(10)))
    want_p = np.stack([d[1] for d in data]).astype(np.float16).astype(np.float32)
    np.testing.assert_allclose(got_p, want_p, rtol=0)
    r.prefetch_rows("prompt_embed", [1, 2])  # smoke
    r.close()


@needs_native
def test_dataset_native_matches_python(shard):
    path, _ = shard
    ds_n = LatentDataset(path, use_native=True)
    ds_p = LatentDataset(path, use_native=False)
    for i in (0, 4, 9):
        a, b = ds_n.get(i), ds_p.get(i)
        np.testing.assert_allclose(a["prompt_embed"], b["prompt_embed"])
        np.testing.assert_allclose(a["pooled"], b["pooled"])
        assert a["caption"] == b["caption"]
