#!/usr/bin/env python
"""Independent reference implementation of the targeted re-OCR ladder —
the oracle source for the ``pages_reocr`` driver query.

WHY THIS EXISTS. ``pages_reocr``'s counters are pixel-kernel outputs
(percentiles, run counts, CLAHE, adaptive thresholds over rendered
rasters) that SQL cannot recompute, so a DuckDB-analytic oracle like the
media queries' md5-replay is impossible: the interesting (selected)
lines are exactly the noise-degraded ones, and the noise is seeded RNG,
not a closed form. The previous oracle read a golden parquet generated
by running THE PIPELINE ITSELF — a green row pinned determinism, not
truth. This tool replaces that: it computes the expected per-strategy
counters with a SECOND, FROM-SPEC implementation that shares with the
engine only the input substrate (corpus generation, payload decoding,
and ``functions/raster.rasterize_page`` — the rendering of the input
pixels, i.e. the data, not the system under test). Everything the A8
claim is about — crop geometry, pixel features, head confidences, the
enhancement chain, worst-first selection, the four strategies, accept
margins, counter aggregation (reference ``ocr/targeted_reocr.py:82-654``
semantics) — is re-derived here from the documented spec in
independently written code. Agreement between the two implementations
(this tool regenerates ``data/reocr_expected.json``; the driver compares
the pipeline against SQL VALUES literals built from it; pytest runs the
differential live at sf0.001) is differential verification: a bug must
now appear identically in two separately written programs to pass.

Float-expression pinning: four spots are bit-sensitive (CLAHE's bilinear
mix, the separable unsharp accumulation, the integral-image mean, the
lerped percentile). There the SPEC includes the float evaluation order,
so this file evaluates those expressions in the documented order (or
calls the numpy primitive, e.g. ``np.percentile``, which is a library,
not the system under test); all structure around them — geometry,
thresholds, routing, selection, strategy logic, aggregation — is
independent code.

Usage::

    python tools/reocr_reference.py            # regenerate expected json
    python tools/reocr_reference.py --check    # also diff vs the pipeline

RERUN (and commit the json) whenever functions/raster.py, the enhance
chain in functions/imageproc.py, stages/reocr.py, or the corpus
generator changes intentionally.
"""

from __future__ import annotations

import base64
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXPECTED_PATH = os.path.join(REPO, "data", "reocr_expected.json")

#: Driver-compare corpus tiers: sf0.001 → 500 pages rows, sf0.01 → 5000,
#: sf0.1 → 50000 (the bench scale, so off-driver sf0.1 differentials
#: also have an oracle row set).
SFS = (0.001, 0.01, 0.1)

# -- spec constants (reference ReOCRConfig, targeted_reocr.py:44-77) --------
THRESH = 0.70          # first-pass confidence below this is re-OCR'd
MARGIN = 0.05          # accepted gain must reach this to count improved
MAX_LINES = 50         # worst-first per-page cap
PAD = 8                # crop padding
MIN_HW = 10            # minimum crop height/width
JITTER_CUT = 0.07      # printed/handwritten router threshold
STRATEGIES = ("ensemble", "primary_only", "secondary_only", "sequential")
FIELDS = ("n_pages", "n_lines", "n_selected", "n_improved", "n_failed",
          "improved_primary", "improved_secondary", "sum_gain_e4")


# ---------------------------------------------------------------------------
# Independent kernel implementations (spec: functions/raster.py docstrings
# + functions/imageproc.py reference citations)
# ---------------------------------------------------------------------------

def ref_crop(img: np.ndarray, bbox) -> np.ndarray | None:
    """Padded crop, expanded to 10×10 minimum around its center; None if
    the expanded crop still misses the minimum (page-edge case)."""
    h, w = img.shape
    x1, y1 = int(bbox[0]) - PAD, int(bbox[1]) - PAD
    x2, y2 = int(bbox[2]) + PAD, int(bbox[3]) + PAD
    x1, y1, x2, y2 = max(x1, 0), max(y1, 0), min(x2, w), min(y2, h)
    if x2 - x1 < MIN_HW:
        mid = (x1 + x2) // 2
        x1 = max(0, mid - MIN_HW // 2)
        x2 = min(w, x1 + MIN_HW)
    if y2 - y1 < MIN_HW:
        mid = (y1 + y2) // 2
        y1 = max(0, mid - MIN_HW // 2)
        y2 = min(h, y1 + MIN_HW)
    c = img[y1:y2, x1:x2]
    return None if (c.shape[0] < MIN_HW or c.shape[1] < MIN_HW) else c


def ref_features(crop: np.ndarray) -> tuple[float, int, float, float]:
    """(sep, runs, iso, jitter) per the crop_features spec."""
    if crop.size == 0 or crop.shape[0] < 3:
        return 0.0, 0, 1.0, 0.0
    g = crop.astype(np.float64)
    # percentile is a numpy primitive (library, not system under test)
    p10, p50 = np.percentile(g, (10, 50))
    sep = (p50 - p10) / 255.0
    if sep < 0.0:
        sep = 0.0
    ink_mask = g < (p50 - 40.0)
    per_col = ink_mask.sum(axis=0)
    strong = per_col > 0.12 * crop.shape[0]
    # runs: count maximal True-segments of `strong`
    runs = 0
    prev = False
    for v in strong:
        if v and not prev:
            runs += 1
        prev = bool(v)
    n_ink = int(ink_mask.sum())
    if n_ink == 0:
        return float(sep), runs, 1.0, 0.0
    # 8-neighbour counts via correlation with a ones(3,3) kernel minus self
    m = ink_mask.astype(np.int64)
    pm = np.pad(m, 1)
    neigh = np.zeros_like(m)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            neigh = neigh + pm[dy:dy + m.shape[0], dx:dx + m.shape[1]]
    neigh = neigh - m
    iso = float(np.count_nonzero((neigh <= 1) & ink_mask)) / n_ink
    jitter = 0.0
    has_ink = per_col > 0
    if int(has_ink.sum()) >= 4:
        rows = np.arange(crop.shape[0], dtype=np.float64)
        centroids = ((ink_mask * rows[:, None]).sum(axis=0)[has_ink]
                     / per_col[has_ink])
        jitter = float(centroids.std() / crop.shape[0])
    return float(sep), runs, iso, jitter


def ref_match(runs: int, n_chars: int, n_words: int) -> float:
    lo = n_words if n_words >= 1 else 1
    hi = (n_chars if n_chars >= 1 else 1) * 1.25
    if runs < lo:
        return runs / lo
    if runs > hi:
        v = 1.0 - (runs - hi) / max(n_chars, 1)
        return v if v > 0.0 else 0.0
    return 1.0


def ref_conf(feats, n_chars: int, n_words: int, head: str) -> float:
    sep, runs, iso, jitter = feats
    match = ref_match(runs, n_chars, n_words)
    iso_pen = 1.0 - 3.0 * iso
    if iso_pen < 0.0:
        iso_pen = 0.0
    if head == "secondary":
        jp = 1.0 - 4.0 * jitter
        if jp < 0.05:
            jp = 0.05
        c = (sep ** 0.5) * (0.3 + 0.7 * match) * iso_pen * jp
    elif head == "handwritten":
        c = (sep ** 0.7) * match * iso_pen * 0.93
    else:
        jp = 1.0 - 3.0 * jitter
        if jp < 0.1:
            jp = 0.1
        c = (sep ** 0.7) * match * iso_pen * jp
    c = min(max(float(c), 0.01), 0.999)
    return round(c, 4)


# -- enhancement chain (spec: enhance_crop — upscale 2× → median denoise →
# CLAHE 3.0 → unsharp 2.0 → adaptive binarize → 2×2 open) --------------------

def ref_resize2x(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    oh, ow = int(h * 2.0), int(w * 2.0)
    ri = np.arange(oh) * h // oh
    ci = np.arange(ow) * w // ow
    return img[np.ix_(ri, ci)]


def ref_median3(img: np.ndarray) -> np.ndarray:
    p = np.pad(img, 1, mode="edge")
    h, w = img.shape
    windows = np.empty((9, h, w), dtype=img.dtype)
    k = 0
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            windows[k] = p[dy:dy + h, dx:dx + w]
            k += 1
    windows.sort(axis=0)
    return windows[4]  # median of 9 = 5th order statistic


def ref_clahe(img: np.ndarray, clip: float = 3.0, tiles: int = 8) -> np.ndarray:
    h, w = img.shape
    th = (h + tiles - 1) // tiles
    tw = (w + tiles - 1) // tiles
    maps = np.empty((tiles, tiles, 256), dtype=np.float64)
    for ty in range(tiles):
        for tx in range(tiles):
            block = img[ty * th:ty * th + th, tx * tw:tx * tw + tw]
            if block.size == 0:
                maps[ty, tx] = np.arange(256, dtype=np.float64)
                continue
            hist = np.zeros(256, dtype=np.float64)
            np.add.at(hist, block.reshape(-1), 1.0)
            limit = clip * block.size / 256.0
            if limit < 1.0:
                limit = 1.0
            spill = float(np.maximum(hist - limit, 0.0).sum())
            hist = np.minimum(hist, limit) + spill / 256.0
            cdf = np.cumsum(hist)
            maps[ty, tx] = (cdf / cdf[-1]) * 255.0
    fy = (np.arange(h) + 0.5) / th - 0.5
    fx = (np.arange(w) + 0.5) / tw - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, tiles - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, tiles - 1)
    y1 = np.minimum(y0 + 1, tiles - 1)
    x1 = np.minimum(x0 + 1, tiles - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]
    lut = img.astype(np.int64)
    m00 = maps[y0[:, None], x0[None, :], lut]
    m01 = maps[y0[:, None], x1[None, :], lut]
    m10 = maps[y1[:, None], x0[None, :], lut]
    m11 = maps[y1[:, None], x1[None, :], lut]
    # spec-pinned float evaluation order of the bilinear mix
    out = (m00 * (1 - wy) * (1 - wx) + m01 * (1 - wy) * wx
           + m10 * wy * (1 - wx) + m11 * wy * wx)
    return np.clip(out, 0, 255).astype(np.uint8)


def ref_unsharp(img: np.ndarray, strength: float = 2.0,
                sigma: float = 1.0) -> np.ndarray:
    radius = max(1, int(round(3 * sigma)))
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    kern = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    kern = kern / kern.sum()
    g = img.astype(np.float64)
    h, w = g.shape
    # spec-pinned accumulation order: tap 0 .. tap 2r, rows then columns
    p = np.pad(g, ((0, 0), (radius, radius)), mode="edge")
    acc = kern[0] * p[:, 0:w]
    for j in range(1, 2 * radius + 1):
        acc = acc + kern[j] * p[:, j:j + w]
    p = np.pad(acc, ((radius, radius), (0, 0)), mode="edge")
    blur = kern[0] * p[0:h, :]
    for j in range(1, 2 * radius + 1):
        blur = blur + kern[j] * p[j:j + h, :]
    out = g * strength - blur * (strength - 1.0)
    return np.clip(out, 0, 255).astype(np.uint8)


def ref_binarize(img: np.ndarray, block: int = 31, c: float = 10.0) -> np.ndarray:
    h, w = img.shape
    r = block // 2
    p = np.pad(img.astype(np.float64), r + 1, mode="edge")
    ii = p.cumsum(axis=0).cumsum(axis=1)
    # spec-pinned integral-image difference order
    s = (ii[block:block + h, block:block + w]
         - ii[:h, block:block + w]
         - ii[block:block + h, :w]
         + ii[:h, :w])
    mean = s / float(block * block)
    return np.where(img.astype(np.float64) > mean - c, 255, 0).astype(np.uint8)


def ref_open2(img: np.ndarray) -> np.ndarray:
    if img.shape[0] < 2 or img.shape[1] < 2:
        return img
    er = np.minimum.reduce([img[:-1, :-1], img[:-1, 1:],
                            img[1:, :-1], img[1:, 1:]])
    er = np.pad(er, ((0, 1), (0, 1)), mode="edge")
    di = np.maximum.reduce([er[:-1, :-1], er[:-1, 1:],
                            er[1:, :-1], er[1:, 1:]])
    return np.pad(di, ((0, 1), (0, 1)), mode="edge")


def ref_enhance(crop: np.ndarray) -> np.ndarray:
    out = ref_resize2x(crop)
    out = ref_median3(out)
    out = ref_clahe(out, clip=3.0)
    out = ref_unsharp(out, strength=2.0)
    out = ref_binarize(out)
    return ref_open2(out)


# ---------------------------------------------------------------------------
# Ladder semantics (spec: reference targeted_reocr.py:82-654)
# ---------------------------------------------------------------------------

def _hypothesis(rec: dict) -> tuple[int, int]:
    """(n_chars, n_words) of the decoded recognition hypothesis."""
    text = base64.b64decode(rec["g"].encode("ascii"))[::-1].decode("utf-8")
    n_chars = len(text) if text else 1
    n_words = len(text.split()) if text.split() else 1
    return n_chars, n_words


def ref_page_counters(page: dict, key: str) -> dict[str, dict[str, int]]:
    """One decoded payload page → per-strategy counter contributions."""
    from horizon_ocr_python_ray.functions.raster import rasterize_page

    img = rasterize_page(page, key)  # shared input substrate
    lines = page["lines"]
    per_line = []
    for rec in lines:
        crop = ref_crop(img, rec["bbox"])
        if crop is None:
            per_line.append(None)
            continue
        feats = ref_features(crop)
        head = "handwritten" if feats[3] > JITTER_CUT else "printed"
        n_chars, n_words = _hypothesis(rec)
        conf = ref_conf(feats, n_chars, n_words, head)
        per_line.append((crop, head, n_chars, n_words, conf))

    candidates = [(pl[4], i) for i, pl in enumerate(per_line)
                  if pl is not None and pl[4] < THRESH]
    candidates.sort()
    chosen = [i for _, i in candidates[:MAX_LINES]]

    agg = {s: dict.fromkeys(FIELDS, 0) for s in STRATEGIES}
    for s in STRATEGIES:
        agg[s]["n_pages"] = 1
        agg[s]["n_lines"] = len(lines)
    for i in chosen:
        crop, head, n_chars, n_words, old = per_line[i]
        ef = ref_features(ref_enhance(crop))
        prim = ref_conf(ef, n_chars, n_words, head)
        sec = ref_conf(ef, n_chars, n_words, "secondary")
        # ensemble tie semantics: strictly-greater wins; on a
        # primary/secondary tie the LAST strict improvement checked
        # (secondary) holds only if it strictly beats primary's value
        ens, ens_eng = old, ""
        if prim > ens:
            ens, ens_eng = prim, "primary"
        if sec > ens:
            ens, ens_eng = sec, "secondary"
        outcome = {
            "ensemble": (ens, ens_eng),
            "primary_only": (prim, "primary") if prim > old else (old, ""),
            "secondary_only": (sec, "secondary") if sec > old else (old, ""),
            "sequential": ((prim, "primary") if prim > old + MARGIN
                           else ((sec, "secondary") if sec > old
                                 else (old, ""))),
        }
        for s in STRATEGIES:
            new, eng = outcome[s]
            a = agg[s]
            a["n_selected"] += 1
            if (new - old) >= MARGIN:
                a["n_improved"] += 1
                if eng == "primary":
                    a["improved_primary"] += 1
                elif eng == "secondary":
                    a["improved_secondary"] += 1
                a["sum_gain_e4"] += int(round((new - old) * 10_000))
            else:
                a["n_failed"] += 1
    return agg


def _doc_pages(corpus_dir: str):
    """Yield (key, page) for every well-formed doc-payload page of the
    corpus — read directly from the pages parquet, no Ray."""
    import glob as _glob
    import json as _json

    import pyarrow.parquet as pq

    from horizon_ocr_python_ray.functions.docformat import DOC_MAGIC

    for path in sorted(_glob.glob(os.path.join(corpus_dir, "pages",
                                               "*.parquet"))):
        t = pq.read_table(path, columns=["url", "html"])
        for url, payload in zip(t.column("url").to_pylist(),
                                t.column("html").to_pylist()):
            if payload is None or not payload.startswith(DOC_MAGIC):
                continue
            try:
                pages = _json.loads(
                    payload[len(DOC_MAGIC):].decode("utf-8"))["pages"]
            except (ValueError, KeyError):
                continue  # corrupt planted payloads are the extract
                # pipeline's error channel, not re-OCR work
            for page in pages:
                yield f"{url}:{page.get('page', 0)}", page


def _one(args):
    key, page = args
    return ref_page_counters(page, key)


def reference_counters(corpus_dir: str, limit: int | None = None,
                       processes: int = 0) -> dict[str, dict[str, int]]:
    """Per-strategy counters over the corpus' doc pages (the whole-query
    expected value). ``limit`` bounds pages for the fast pytest
    differential; ``processes`` > 1 fans pages over a process pool."""
    total = {s: dict.fromkeys(FIELDS, 0) for s in STRATEGIES}
    work = list(_doc_pages(corpus_dir))
    if limit is not None:
        work = work[:limit]
    if processes and processes > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=processes) as pool:
            results = pool.map(_one, work, chunksize=8)
    else:
        results = map(_one, work)
    for agg in results:
        for s in STRATEGIES:
            for f in FIELDS:
                total[s][f] += agg[s][f]
    return total


def main() -> None:
    check = "--check" in sys.argv
    from horizon_ocr_python_ray import ensure_corpus, sf_to_rows

    expected: dict[str, dict[str, dict[str, int]]] = {}
    for sf in SFS:
        corpus = ensure_corpus(sf)
        got = reference_counters(corpus, processes=os.cpu_count() or 8)
        expected[str(sf_to_rows(sf))] = got
        print(f"sf={sf}: " + json.dumps(got["ensemble"]))
    with open(EXPECTED_PATH, "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)
    print(f"wrote {EXPECTED_PATH}")

    if check:
        import ray

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=16,
                     include_dashboard=False, logging_level="ERROR")
        from horizon_ocr_python_ray import read_pages
        from horizon_ocr_python_ray.stages.reocr import build_reocr_pipeline

        for sf in SFS:
            corpus = ensure_corpus(sf)
            t = build_reocr_pipeline(
                read_pages(corpus, columns=["url", "html"]))
            pipe = {r["strategy"]: {f: r[f] for f in FIELDS}
                    for r in t.to_pylist()}
            want = expected[str(sf_to_rows(sf))]
            status = "MATCH" if pipe == want else "DIFF"
            print(f"sf={sf}: pipeline vs reference → {status}")
            if pipe != want:
                for s in STRATEGIES:
                    if pipe[s] != want[s]:
                        print(f"  {s}: pipeline={pipe[s]}")
                        print(f"  {s}: reference={want[s]}")
                sys.exit(1)
        ray.shutdown()


if __name__ == "__main__":
    main()
