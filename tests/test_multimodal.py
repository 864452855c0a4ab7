"""Multimodal stage plumbing: schemas, actor signatures, per-frame
fan-out, error columns. Decode is a deterministic stub (no codecs in the
container) — the Ray-side plumbing is what's under test."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from horizon_ocr_python_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageFeatureStage,
    VideoFrameSampleStage,
    build_media_pipeline,
    gen_media_table,
)

N = 60


def _media_ds():
    return ray.data.from_arrow(gen_media_table(N, seed=7))


def test_gen_media_deterministic():
    a = gen_media_table(20, seed=7)
    b = gen_media_table(20, seed=7)
    assert a.equals(b)
    assert gen_media_table(20, seed=8).column("payload").to_pylist() != \
        a.column("payload").to_pylist()


def test_image_features_schema_and_values():
    t = gen_media_table(N, seed=7)
    img_rows = t.filter(pa.compute.equal(t.column("kind"), "image"))
    out = ImageFeatureStage(resize_to=16)(img_rows)
    assert out.column_names == ["media_id", "height", "width", "pix_mean",
                                "pix_std", "pix_sha", "error"]
    assert out.num_rows == img_rows.num_rows
    assert all(h == 16 for h in out.column("height").to_pylist())
    assert all(e is None for e in out.column("error").to_pylist())
    # deterministic: rerun gives identical pixel hashes
    again = ImageFeatureStage(resize_to=16)(img_rows)
    assert out.column("pix_sha").to_pylist() == again.column("pix_sha").to_pylist()


def test_image_resize_kernel():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6, 1)
    small = ImageFeatureStage._resize_nearest(img, 2, 3)
    assert small.shape == (2, 3, 1)
    assert small[0, 0, 0] == img[0, 0, 0]


def test_image_error_row_isolated():
    bad = pa.Table.from_arrays(
        [pa.array([99], pa.int64()), pa.array(["image"], pa.string()),
         pa.array([b"not an image"], pa.binary()),
         pa.array([{"width": 8, "height": 8, "channels": 3,
                    "sample_rate": 0, "n_frames": 1}],
                  gen_media_table(1).schema.field("meta").type)],
        names=["media_id", "kind", "payload", "meta"],
    )
    out = ImageFeatureStage()(bad)
    assert out.num_rows == 1
    assert out.column("error").to_pylist()[0].startswith("ValueError")


def test_audio_features():
    t = gen_media_table(N, seed=7)
    aud = t.filter(pa.compute.equal(t.column("kind"), "audio"))
    out = AudioFeatureStage()(aud)
    assert out.num_rows == aud.num_rows
    assert all(n > 0 for n in out.column("n_frames").to_pylist())
    assert all(0.0 <= v <= 1.0 for v in out.column("rms_mean").to_pylist())


def test_video_frame_fanout():
    t = gen_media_table(N, seed=7)
    vid = t.filter(pa.compute.equal(t.column("kind"), "video"))
    out = VideoFrameSampleStage(every_k=8)(vid)
    # one row per sampled frame, > one row per video on average
    assert out.num_rows > vid.num_rows
    metas = vid.column("meta").to_pylist()
    expect = sum(len(range(0, m["n_frames"], 8)) for m in metas)
    assert out.num_rows == expect
    assert all(f >= 0 for f in out.column("frame_idx").to_pylist())


def test_media_pipeline_end_to_end():
    out = build_media_pipeline(_media_ds()).to_pandas()
    assert set(out.columns) == {"media_id", "feature", "value"}
    kinds = gen_media_table(N, seed=7).column("kind").to_pylist()
    n_img = kinds.count("image")
    n_aud = kinds.count("audio")
    assert (out["feature"] == "pix_std").sum() == n_img
    assert (out["feature"] == "rms_max").sum() == n_aud
    assert (out["feature"] == "pix_mean").sum() > n_img  # video frames too
