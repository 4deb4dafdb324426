"""Video IO (decord replacement) + T2V dataset: synth mp4 round trip."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mixgrpo_tpu.data.t2v_dataset import T2VDataset  # noqa: E402
from mixgrpo_tpu.data.video_io import read_video_frames, video_metadata  # noqa: E402

pytestmark = pytest.mark.slow


def _write_video(path, n_frames=24, h=64, w=96, fps=24):
    vw = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    assert vw.isOpened()
    for t in range(n_frames):
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:, :, 0] = min(t * 10, 255)  # encode frame index in blue(BGR)
        frame[: h // 2] += 40
        vw.write(frame)
    vw.release()
    return str(path)


def test_video_metadata_and_indexed_read(tmp_path):
    p = _write_video(tmp_path / "v.mp4")
    meta = video_metadata(p)
    assert meta.num_frames == 24
    assert meta.height == 64 and meta.width == 96
    assert abs(meta.fps - 24) < 1

    frames = read_video_frames(p, [0, 5, 10, 23])
    assert frames.shape == (4, 64, 96, 3)
    # frame index encoded in the (lossy-compressed) blue channel rises
    blues = frames[:, 40, 40, 2].astype(int)
    assert blues[0] < blues[1] < blues[2]


def test_read_all_frames(tmp_path):
    p = _write_video(tmp_path / "v.mp4", n_frames=8)
    frames = read_video_frames(p)
    assert frames.shape[0] == 8


def _make_annotations(tmp_path, vids):
    anno = []
    for name, kw in vids:
        p = _write_video(tmp_path / name, **kw.pop("video", {}))
        anno.append({"path": os.path.basename(p), **kw})
    anno_file = tmp_path / "anno.json"
    anno_file.write_text(json.dumps(anno))
    merge = tmp_path / "merge.txt"
    merge.write_text(f"{tmp_path},{anno_file}\n")
    return str(merge)


def test_t2v_dataset_filters_and_items(tmp_path):
    merge = _make_annotations(tmp_path, [
        ("a.mp4", {
            "cap": ["a blue square"], "fps": 24, "duration": 1.0,
            "resolution": {"height": 64, "width": 96},
            "video": {"n_frames": 24},
        }),
        ("b.mp4", {  # no caption -> filtered
            "fps": 24, "duration": 1.0,
            "resolution": {"height": 64, "width": 96},
        }),
        ("c.mp4", {  # too long -> filtered
            "cap": "x", "fps": 24, "duration": 100.0,
            "resolution": {"height": 64, "width": 96},
        }),
        ("d.mp4", {  # extreme aspect -> filtered
            "cap": "x", "fps": 24, "duration": 1.0,
            "resolution": {"height": 640, "width": 96},
        }),
    ])
    ds = T2VDataset(
        merge, num_frames=8, train_fps=12, max_height=32, max_width=48,
        cfg_rate=0.0, video_length_tolerance_range=3.0, seed=1,
    )
    assert len(ds) == 1
    item = ds[0]
    # 24 frames @24fps resampled to 12fps -> 12, temporal-cropped to 8
    assert item["pixel_values"].shape == (8, 32, 48, 3)
    assert item["pixel_values"].min() >= -1.0
    assert item["pixel_values"].max() <= 1.0
    assert item["text"] == "a blue square"


def test_t2v_dataset_cfg_dropout_and_tokenize(tmp_path):
    merge = _make_annotations(tmp_path, [
        ("a.mp4", {
            "cap": "hello", "fps": 24, "duration": 0.5,
            "resolution": {"height": 64, "width": 96},
            "video": {"n_frames": 12},
        }),
    ])

    def tok(texts, max_len):
        ids = np.zeros((len(texts), max_len), np.int32)
        return ids, np.ones_like(ids)

    ds = T2VDataset(
        merge, num_frames=4, train_fps=24, max_height=32, max_width=48,
        cfg_rate=1.0, drop_short_ratio=0.0, tokenize_fn=tok,
        text_max_length=16, seed=0, video_length_tolerance_range=10.0,
    )
    item = ds[0]
    assert item["text"] == ""  # cfg_rate=1 always drops
    assert item["input_ids"].shape == (16,)
