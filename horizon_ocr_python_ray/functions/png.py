"""Pure-Python/numpy PNG codec — the real image decode for the media
and document-raster pipelines.

The sandbox ships no PIL/cv2, but PNG needs only ``zlib`` (stdlib) and
numpy: chunk framing + CRC32, IDAT inflate, per-scanline unfiltering
(all five filter types of the PNG spec §9: None/Sub/Up/Average/Paeth).
This replaces the round-2 byte-tiling stub so every downstream
preprocess/crop kernel (``functions/imageproc.py``) operates on real
rasters. Reference parity: the reference decodes with
``cv2.imdecode`` (``/root/reference/docvision/io/image.py:150-185``)
and rasterizes PDFs (``io/pdf.py:117-142``); this codec is the
sandbox-feasible equivalent for its PNG inputs.

Supported: 8-bit greyscale (color type 0), RGB (2), RGBA (6),
non-interlaced. The encoder writes filter-0 scanlines (fastest to
decode) and an optional ``tEXt Orientation`` ancillary chunk carrying
an EXIF-style orientation tag 1–8 (PNG has no baseline EXIF; the tag
rides a standard text chunk so round-trips stay pure-PNG). EXIF
orientation semantics (``io/image.py:81-148``) are implemented in
:func:`apply_orientation` as numpy flips/rotations.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type → samples per pixel


class PngError(ValueError):
    pass


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, orientation: int | None = None,
               level: int = 6) -> bytes:
    """HxW (grey) or HxWx{3,4} uint8 → PNG bytes (filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, c = 0, 1
        rows = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, c = 2, 3
        rows = img
    elif img.ndim == 3 and img.shape[2] == 4:
        color, c = 6, 4
        rows = img
    else:
        raise PngError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * c), np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = rows.reshape(h, w * c)
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if orientation is not None:
        if not 1 <= int(orientation) <= 8:
            raise PngError(f"orientation {orientation} out of range 1..8")
        out.append(_chunk(b"tEXt", b"Orientation\x00" + str(int(orientation)).encode()))
    out.append(_chunk(b"IDAT", zlib.compress(raw.tobytes(), level)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _unfilter(raw: np.ndarray, h: int, w: int, c: int) -> np.ndarray:
    """Reverse per-scanline filtering (spec §9). Rows are sequential by
    construction; within-row recurrences (Sub/Average/Paeth) run as a
    per-pixel loop only on rows that use them — filter-0 rows (our
    encoder's output, and the overwhelmingly common case in synthetic
    fixtures) stay one vectorized copy."""
    stride = 1 + w * c
    raw = raw.reshape(h, stride)
    ftypes = raw[:, 0]
    data = raw[:, 1:]
    out = np.zeros((h, w * c), np.uint8)
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        f = int(ftypes[y])
        line = data[y].astype(np.int64)
        if f == 0:
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (1, 3, 4):
            cur = np.zeros(w * c, np.int64)
            for i in range(w * c):
                a = cur[i - c] if i >= c else 0      # left
                b = prev[i]                           # up
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    cc = int(prev[i - c]) if i >= c else 0
                    p = a + b - cc
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter type {f} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)


def decode_png(payload: bytes) -> tuple[np.ndarray, dict]:
    """PNG bytes → (HxWxC uint8 array, ancillary dict).

    The ancillary dict carries ``orientation`` (int 1–8) when a
    ``tEXt Orientation`` chunk is present. CRCs are verified; truncated
    or non-PNG payloads raise :class:`PngError`."""
    if not payload.startswith(_SIG):
        raise PngError("not a PNG (bad signature)")
    pos = len(_SIG)
    idat = []
    meta: dict = {}
    w = h = c = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise PngError(f"truncated chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise PngError(f"bad CRC in chunk {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace:
                raise PngError("interlaced PNG unsupported")
            if comp or filt:
                raise PngError("non-zero compression/filter method")
            c = _CHANNELS[color]
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"tEXt":
            key, _, val = body.partition(b"\x00")
            if key == b"Orientation":
                try:
                    meta["orientation"] = int(val)
                except ValueError:
                    pass
        elif tag == b"IEND":
            break
    if w is None:
        raise PngError("missing IHDR")
    if not idat:
        raise PngError("missing IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    expect = h * (1 + w * c)
    if len(raw) != expect:
        raise PngError(f"decompressed size {len(raw)} != expected {expect}")
    return _unfilter(raw, h, w, c), meta


# ---------------------------------------------------------------------------
# APNG (animated PNG) — the real video container for the media pipeline
# ---------------------------------------------------------------------------

def encode_apng(frames: np.ndarray, delay_num: int = 1,
                delay_den: int = 25, level: int = 6) -> bytes:
    """NxHxW (grey) or NxHxWx{3,4} uint8 → APNG bytes.

    Standard animated-PNG layout: ``acTL`` after IHDR, each frame led by
    an ``fcTL`` control chunk; frame 0's data rides the PNG ``IDAT``
    (so any baseline PNG decoder shows the first frame), later frames
    ride ``fdAT`` chunks. All frames are full-canvas (x/y offset 0,
    dispose 0 / blend SOURCE) — the simple, lossless profile."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        color, c = 0, 1
        rows = frames[:, :, :, None]
    elif frames.ndim == 4 and frames.shape[3] == 3:
        color, c = 2, 3
        rows = frames
    elif frames.ndim == 4 and frames.shape[3] == 4:
        color, c = 6, 4
        rows = frames
    else:
        raise PngError(f"unsupported frame stack shape {frames.shape}")
    n, h, w = frames.shape[:3]
    if n < 1:
        raise PngError("need at least one frame")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = [_SIG, _chunk(b"IHDR", ihdr),
           _chunk(b"acTL", struct.pack(">II", n, 0))]  # loop forever
    seq = 0

    def fctl() -> bytes:
        nonlocal seq
        body = struct.pack(">IIIIIHHBB", seq, w, h, 0, 0,
                           delay_num, delay_den, 0, 0)
        seq += 1
        return _chunk(b"fcTL", body)

    def raw_of(i: int) -> bytes:
        raw = np.empty((h, 1 + w * c), np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = rows[i].reshape(h, w * c)
        return zlib.compress(raw.tobytes(), level)

    out.append(fctl())
    out.append(_chunk(b"IDAT", raw_of(0)))
    for i in range(1, n):
        out.append(fctl())
        body = struct.pack(">I", seq) + raw_of(i)
        seq += 1
        out.append(_chunk(b"fdAT", body))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_apng(payload: bytes) -> tuple[np.ndarray, dict]:
    """APNG bytes → (NxHxWxC uint8 frame stack, meta dict).

    Meta carries ``n_frames`` (from ``acTL``) and ``delays`` (per-frame
    (num, den) pairs from the ``fcTL`` chunks). A plain PNG (no acTL)
    decodes as a 1-frame stack. Only the full-canvas profile written by
    :func:`encode_apng` is supported (offsets 0, blend SOURCE)."""
    if not payload.startswith(_SIG):
        raise PngError("not a PNG (bad signature)")
    pos = len(_SIG)
    w = h = c = None
    n_frames = 1
    delays: list[tuple[int, int]] = []
    frame_data: list[list[bytes]] = []
    cur: list[bytes] | None = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(payload):
            raise PngError(f"truncated chunk {tag!r}")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise PngError(f"bad CRC in chunk {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or color not in _CHANNELS or interlace:
                raise PngError("unsupported IHDR for APNG decode")
            c = _CHANNELS[color]
        elif tag == b"acTL":
            n_frames, _plays = struct.unpack(">II", body)
        elif tag == b"fcTL":
            (_seq, fw, fh, fx, fy, dnum, dden, _disp,
             _blend) = struct.unpack(">IIIIIHHBB", body)
            if (fw, fh, fx, fy) != (w, h, 0, 0):
                raise PngError("sub-canvas APNG frames unsupported")
            delays.append((dnum, dden))
            cur = []
            frame_data.append(cur)
        elif tag == b"IDAT":
            if cur is None:  # plain PNG: no fcTL before IDAT
                cur = []
                frame_data.append(cur)
            cur.append(body)
        elif tag == b"fdAT":
            if cur is None:
                raise PngError("fdAT before any fcTL")
            cur.append(body[4:])  # strip sequence number
        elif tag == b"IEND":
            break
    if w is None:
        raise PngError("missing IHDR")
    if len(frame_data) != n_frames:
        raise PngError(
            f"acTL declares {n_frames} frames, found {len(frame_data)}")
    frames = []
    expect = h * (1 + w * c)
    for chunks in frame_data:
        if not chunks:
            raise PngError("frame with no data chunks")
        raw = np.frombuffer(zlib.decompress(b"".join(chunks)), np.uint8)
        if len(raw) != expect:
            raise PngError(f"frame size {len(raw)} != expected {expect}")
        frames.append(_unfilter(raw, h, w, c))
    return np.stack(frames), {"n_frames": n_frames, "delays": delays}


#: EXIF orientation → (transpose?, flip axes) per TIFF/EXIF tag 274.
def apply_orientation(img: np.ndarray, orientation: int) -> np.ndarray:
    """Undo an EXIF-style orientation tag (1–8) so the returned raster
    is display-upright — the numpy equivalent of the reference's
    orientation handling (``io/image.py:81-148``)."""
    o = int(orientation)
    if o == 1:
        return img
    if o == 2:
        return img[:, ::-1]
    if o == 3:
        return img[::-1, ::-1]
    if o == 4:
        return img[::-1]
    if o == 5:
        return img.swapaxes(0, 1)                 # transpose (main diagonal)
    if o == 6:
        return np.rot90(img, -1)                  # 90° clockwise
    if o == 7:
        return img.swapaxes(0, 1)[::-1, ::-1]     # transverse (anti-diagonal)
    if o == 8:
        return np.rot90(img, 1)                   # 90° counter-clockwise
    raise PngError(f"orientation {orientation} out of range 1..8")
