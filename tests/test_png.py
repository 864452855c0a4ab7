"""Pure-numpy PNG codec: round-trips, all five scanline filters decoded
against an independent forward-filter implementation, orientation
transforms, and malformed-payload rejection."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from horizon_ocr_python_ray.functions.png import (
    PngError,
    _chunk,
    apply_orientation,
    decode_png,
    encode_png,
)


def _img(h=13, w=17, c=3, seed=3):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_round_trip(c):
    img = _img(c=c)
    arr, meta = decode_png(encode_png(img))
    want = img if c > 1 else img[:, :, None]
    assert arr.shape == want.shape
    assert (arr == want).all()
    assert "orientation" not in meta


def test_orientation_tag_round_trip():
    img = _img(c=3)
    for o in range(1, 9):
        arr, meta = decode_png(encode_png(img, orientation=o))
        assert meta["orientation"] == o
        assert (arr == img).all()  # tag is metadata; pixels untouched
    with pytest.raises(PngError):
        encode_png(img, orientation=9)


# -- independent forward filter (spec §9) for decode verification -----------

def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _forward_filter(img: np.ndarray, ftype: int, c: int) -> bytes:
    h, w = img.shape[:2]
    flat = img.reshape(h, w * c).astype(np.int64)
    out = bytearray()
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        out.append(ftype)
        row = flat[y]
        for i in range(w * c):
            a = int(row[i - c]) if i >= c else 0
            b = int(prev[i])
            cc = int(prev[i - c]) if i >= c else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) >> 1, 4: _paeth(a, b, cc)}[ftype]
            out.append((int(row[i]) - pred) & 0xFF)
        prev = row
    return bytes(out)


def _assemble(img: np.ndarray, ftype: int, color: int, c: int) -> bytes:
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = _forward_filter(img, ftype, c)
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_all_filter_types_decode_exactly(ftype):
    img = _img(h=9, w=11, c=3, seed=ftype + 1)
    arr, _ = decode_png(_assemble(img, ftype, color=2, c=3))
    assert (arr == img).all()


def test_mixed_filters_greyscale():
    img = _img(h=8, w=6, c=1, seed=9)[:, :, None] if False else _img(h=8, w=6, c=1, seed=9)
    # hand-mix: alternate Up and Paeth rows
    h, w = img.shape
    flat = img.reshape(h, w).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(w, np.int64)
    for y in range(h):
        ftype = 2 if y % 2 == 0 else 4
        raw.append(ftype)
        row = flat[y]
        for i in range(w):
            a = int(row[i - 1]) if i >= 1 else 0
            b = int(prev[i])
            cc = int(prev[i - 1]) if i >= 1 else 0
            pred = b if ftype == 2 else _paeth(a, b, cc)
            raw.append((int(row[i]) - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _chunk(b"IEND", b""))
    arr, _ = decode_png(payload)
    assert (arr[:, :, 0] == img).all()


def test_multiple_idat_chunks():
    img = _img(h=4, w=5, c=3)
    payload = encode_png(img)
    # split the single IDAT into two
    sig_end = 8
    pos = sig_end
    parts = [payload[:sig_end]]
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if tag == b"IDAT":
            parts.append(_chunk(b"IDAT", body[: len(body) // 2]))
            parts.append(_chunk(b"IDAT", body[len(body) // 2:]))
        else:
            parts.append(payload[pos:pos + 12 + length])
        pos += 12 + length
    arr, _ = decode_png(b"".join(parts))
    assert (arr == img).all()


def test_rejects_garbage_and_corruption():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"not a png at all")
    good = bytearray(encode_png(_img(h=4, w=4)))
    good[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(PngError):
        decode_png(bytes(good))
    with pytest.raises(PngError, match="truncated|missing"):
        decode_png(bytes(encode_png(_img(h=4, w=4))[:30]))


def test_orientation_transforms_exact():
    # asymmetric 2x3 so every transform is distinguishable
    m = np.arange(6, dtype=np.uint8).reshape(2, 3)
    got = {o: apply_orientation(m, o) for o in range(1, 9)}
    assert (got[1] == m).all()
    assert (got[2] == m[:, ::-1]).all()
    assert (got[3] == m[::-1, ::-1]).all()
    assert (got[4] == m[::-1, :]).all()
    assert (got[5] == m.T).all()
    assert (got[6] == np.rot90(m, -1)).all()
    assert (got[7] == m.T[::-1, ::-1]).all()
    assert (got[8] == np.rot90(m, 1)).all()
    # rotations/transposes change shape; flips don't
    assert got[5].shape == (3, 2) and got[6].shape == (3, 2)
    # applying 6 then undoing with 8 is identity
    assert (apply_orientation(apply_orientation(m, 6), 8) == m).all()


def test_apng_roundtrip_grey_and_rgb():
    from horizon_ocr_python_ray.functions.png import decode_apng, encode_apng

    rng = np.random.default_rng(3)
    grey = rng.integers(0, 256, (5, 12, 9), dtype=np.uint8)
    frames, meta = decode_apng(encode_apng(grey))
    assert meta["n_frames"] == 5 and len(meta["delays"]) == 5
    assert frames.shape == (5, 12, 9, 1)
    assert (frames[..., 0] == grey).all()
    rgb = rng.integers(0, 256, (3, 6, 7, 3), dtype=np.uint8)
    frames, meta = decode_apng(encode_apng(rgb, delay_num=2, delay_den=50))
    assert frames.shape == (3, 6, 7, 3) and (frames == rgb).all()
    assert meta["delays"][0] == (2, 50)


def test_apng_first_frame_is_plain_png_compatible():
    # baseline decoders read frame 0 from the IDAT — so must decode_png
    from horizon_ocr_python_ray.functions.png import decode_apng, encode_apng

    rng = np.random.default_rng(4)
    stack = rng.integers(0, 256, (4, 8, 8), dtype=np.uint8)
    payload = encode_apng(stack)
    first, _ = decode_png(payload)
    assert (first[..., 0] == stack[0]).all()
    # and a PLAIN png decodes as a 1-frame stack through decode_apng
    frames, meta = decode_apng(encode_png(stack[0]))
    assert meta["n_frames"] == 1 and (frames[0, :, :, 0] == stack[0]).all()


def test_apng_error_paths():
    from horizon_ocr_python_ray.functions.png import decode_apng, encode_apng

    with pytest.raises(PngError):
        decode_apng(b"junk")
    with pytest.raises(PngError, match="at least one frame"):
        encode_apng(np.zeros((0, 4, 4), np.uint8))
    good = encode_apng(np.zeros((2, 4, 4), np.uint8))
    with pytest.raises(PngError, match="truncated|declares"):
        decode_apng(good[:40])
