"""Multimodal stage plumbing: schemas, actor signatures, per-frame
fan-out, error columns. ALL decodes are real: PNG images
(functions/png.py), RIFF/WAV audio (functions/wav.py), APNG video
(functions/png.py:decode_apng)."""

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
    assert out.column("error").to_pylist()[0].startswith("PngError")


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


def test_planted_orientation_is_undone():
    # a tall raster tagged orientation=6 (90° CW to display) must come
    # back upright: decoded dims swap and pixels match np.rot90(img, -1)
    from horizon_ocr_python_ray.functions.png import encode_png
    from horizon_ocr_python_ray.stages.multimodal import (
        _decode_image, render_page_raster)

    grey = render_page_raster(1, 7, 40, 24)
    for o, want in [(1, grey), (3, grey[::-1, ::-1]),
                    (6, np.rot90(grey, -1)), (8, np.rot90(grey, 1)),
                    (5, grey.swapaxes(0, 1))]:
        out = _decode_image(encode_png(grey, orientation=o), {})
        assert out.shape == want.shape, o
        assert (out == want).all(), o


def test_real_rasters_are_document_like():
    # planted text lines → bimodal-ish histogram: paper bright, ink dark
    from horizon_ocr_python_ray.stages.multimodal import render_page_raster

    img = render_page_raster(0, 42, 128, 64)
    assert img.shape == (64, 128)
    dark = (img < 100).mean()
    bright = (img > 200).mean()
    assert 0.05 < dark < 0.7       # glyph boxes present
    assert bright > 0.2            # paper background present
    # deterministic
    again = render_page_raster(0, 42, 128, 64)
    assert (img == again).all()


def test_preprocess_runs_on_real_pixels(ray_session):
    from horizon_ocr_python_ray.stages.multimodal import media_preprocess_for_n

    out = media_preprocess_for_n(30).to_pandas()
    assert len(out) == 10
    assert out.error.isna().all()
    assert (out.height > 0).all() and (out.width > 0).all()
    assert (out.noise_level > 0).any()  # salt noise is measurable


def test_video_motion_stage():
    from horizon_ocr_python_ray.stages.multimodal import VideoMotionStage

    t = gen_media_table(12, seed=11)
    vid = t.filter(pa.compute.equal(t.column("kind"), "video"))
    out = VideoMotionStage()(vid)
    assert out.num_rows == vid.num_rows
    rows = out.to_pylist()
    for r in rows:
        assert r["error"] is None
        assert r["n_frames"] >= 8
        assert r["motion_abs_sum"] > 0       # the pan moves every frame
        assert 0 < r["max_delta"] <= 255
    # deterministic
    again = VideoMotionStage()(vid)
    assert out.equals(again)
    # a corrupt payload isolates as an error row, not a thrown batch
    bad = pa.Table.from_arrays(
        [pa.array([99], pa.int64()), pa.array(["video"]),
         pa.array([b"not-a-png"], pa.binary()),
         pa.array([{"width": 0, "height": 0, "channels": 1,
                    "sample_rate": 0, "n_frames": 3}],
                  vid.schema.field("meta").type)],
        schema=vid.schema)
    err = VideoMotionStage()(bad).to_pylist()[0]
    assert err["error"].startswith("PngError")
    assert err["motion_abs_sum"] == 0


def test_audio_energy_probe_roundtrip():
    """The md5-noise probe fixture survives the real WAV container
    round-trip bit-exactly, and the engine's integer features agree
    with a direct recompute from the planted parameters — the Python
    half of the analytic media_audio_energy oracle."""
    import numpy as np

    from horizon_ocr_python_ray.stages.multimodal import (
        audio_energy_batch,
        gen_audio_probe_table,
    )
    from horizon_ocr_python_ray.stages.sketches import _md5_low64

    t = gen_audio_probe_table(8)
    got = audio_energy_batch(t).to_pandas()
    for i in range(8):
        n = 256 + _md5_low64(f"apn:42:{i}") % 1024
        s = np.array([_md5_low64(f"ap:42:{i}:{k}") % 32768 - 16384
                      for k in range(n)], np.int64)
        row = got[got.media_id == i].iloc[0]
        assert row.n_samples == n
        assert row.sum_sq == int((s * s).sum())
        assert row.peak_abs == int(np.abs(s).max())


def _display_coords(o, y, x, h, w):
    """Sensor (y, x) → display (yy, xx, H, W) under EXIF orientation
    ``o`` — the index-space twin of png.apply_orientation, written
    independently (used to check px_wsum end-to-end)."""
    if o == 1:
        return y, x, h, w
    if o == 2:
        return y, w - 1 - x, h, w
    if o == 3:
        return h - 1 - y, w - 1 - x, h, w
    if o == 4:
        return h - 1 - y, x, h, w
    if o == 5:
        return x, y, w, h
    if o == 6:
        return x, h - 1 - y, w, h
    if o == 7:
        return w - 1 - x, h - 1 - y, w, h
    return w - 1 - x, y, w, h


def test_media_probe_features_match_planted_parameters(ray_session):
    """The probe fixture's features are pure functions of the planted
    md5 parameters (the same identities the analytic SQL oracle
    replays): the engine must recover them through the REAL PNG / WAV /
    APNG codecs. Covers all 8 EXIF orientations via px_wsum and the
    pan-video identities (every frame sum == base sum; motion is
    (nf-1) × one circular-shift delta sum)."""
    import numpy as np

    from horizon_ocr_python_ray.stages.multimodal import (
        _VIDEO_PROBE_HW,
        _probe_image_params,
        _probe_image_pixels,
        _probe_video_base,
        media_features_probe_for_n,
        media_motion_probe_for_n,
    )
    from horizon_ocr_python_ray.stages.sketches import _md5_low64

    N = 27  # covers all 8 orientations and all 3 variants
    feat = media_features_probe_for_n(N).to_pandas()
    feat = {(int(r.media_id), r.feature): r.value for r in feat.itertuples()}
    for i in range(N):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h, v, o = _probe_image_params(42, i)
            px = _probe_image_pixels(42, i, h, w, v).astype(np.int64)
            assert feat[(i, "px_n")] == h * w
            assert feat[(i, "px_sum")] == px.sum()
            assert feat[(i, "px_sumsq")] == (px * px).sum()
            wsum = 0
            for y in range(h):
                for x in range(w):
                    yy, xx, _H, W = _display_coords(o, y, x, h, w)
                    wsum += int(px[y, x]) * (yy * W + xx)
            assert feat[(i, "px_wsum")] == wsum, (i, o)
        elif kind == "audio":
            n = 256 + _md5_low64(f"mpan:42:{i}") % 1024
            s = np.array([_md5_low64(f"mpa:42:{i}:{k}") % 32768 - 16384
                          for k in range(n)], np.int64)
            assert feat[(i, "n_samples")] == n
            assert feat[(i, "sum_sq")] == (s * s).sum()
            assert feat[(i, "peak_abs")] == np.abs(s).max()
        else:
            base, nf = _probe_video_base(42, i)
            b = base.astype(np.int64)
            assert feat[(i, "n_frames")] == nf
            assert feat[(i, "px_per_frame")] == _VIDEO_PROBE_HW ** 2
            assert feat[(i, "frames_sum")] == nf * b.sum()
            assert feat[(i, "frames_max")] == b.max()

    mot = media_motion_probe_for_n(N).to_pandas().set_index("media_id")
    for i in range(2, N, 3):
        base, nf = _probe_video_base(42, i)
        b = base.astype(np.int64)
        d = np.abs(np.roll(b, 2, axis=1) - b)
        row = mot.loc[i]
        assert row.n_frames == nf
        assert row.motion_abs_sum == (nf - 1) * d.sum()
        assert row.max_delta == d.max()


def test_media_probe_preprocess_threshold_replay(ray_session):
    """media_preprocess probe: readability flags replayed with the
    SQL-oracle formulas (population variance, clamped-edge Laplacian)
    agree with the engine's assess_readability on the decoded image,
    and the shape-preserving chain's dims follow orientation."""
    import numpy as np

    from horizon_ocr_python_ray.stages.multimodal import (
        _probe_image_params,
        _probe_image_pixels,
        media_preprocess_probe_for_n,
    )

    N = 27
    pre = media_preprocess_probe_for_n(N).to_pandas().set_index("media_id")
    for i in range(0, N, 3):
        w, h, v, o = _probe_image_params(42, i)
        px = _probe_image_pixels(42, i, h, w, v).astype(np.float64)
        H, W = (w, h) if o >= 5 else (h, w)
        row = pre.loc[i]
        assert row.error is None or row.error != row.error
        assert (row.height, row.width) == (H, W)
        assert row.n_pix == h * w
        assert row.pix_sum == px.sum()
        assert row.pix_sumsq == (px * px).sum()
        mean, std = px.mean(), px.std()
        p = np.pad(px, 1, mode="edge")
        lap = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * px
        lapvar = lap.var()
        issues = []
        if std < 30.0:
            issues.append("low_contrast")
        if lapvar < 100.0:
            issues.append("blurry")
        if mean < 50.0:
            issues.append("too_dark")
        elif mean > 230.0:
            issues.append("too_bright")
        if lapvar > 1000.0:
            issues.append("high_noise")
        if H < 500 or W < 500:
            issues.append("low_resolution")
        assert row.issues == ",".join(issues), (i, v)
        assert row.readability == (
            "good" if not issues else ("fair" if len(issues) <= 2 else "poor"))


def test_media_probe_ds_matches_driver_table(ray_session):
    """Distributed probe generation (ray.data.range → worker-side
    encode) is byte-identical to the driver-side table, both unfiltered
    and per-kind-pruned — so moving generation off the driver cannot
    move the oracle."""
    from horizon_ocr_python_ray.stages.multimodal import (
        gen_media_probe_table,
        media_probe_ds,
    )

    N = 24
    ref = gen_media_probe_table(N).sort_by("media_id")
    got = media_probe_ds(N).take_all()
    got_t = pa.Table.from_pylist(got, schema=ref.schema).sort_by("media_id")
    assert got_t.equals(ref)
    for kind, ordinal in (("image", 0), ("audio", 1), ("video", 2)):
        part = media_probe_ds(N, kind=kind).take_all()
        part_t = pa.Table.from_pylist(
            part, schema=ref.schema).sort_by("media_id")
        want = ref.take([i for i in range(N) if i % 3 == ordinal])
        assert part_t.equals(want), kind
