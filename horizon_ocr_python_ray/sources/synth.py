"""Deterministic synthetic Common-Crawl-style corpus + golden fixtures.

Produces the driver-hinted input table ``(url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string)`` (BASELINE.json input_hint) and a
paired ``golden`` table ``(url, extracted_text, spans, route, content_hash)``
— the byte-identity oracle (FIXTURES.md §1–2). Mirrors the reference's
fully-synthetic fixture strategy (``/root/reference/tests/conftest.py:23-103``)
lifted to Parquet/Arrow.

Determinism: each row's RNG is ``random.Random(f"{seed}:{i}")`` (CPython
seeds str via SHA-512 — stable across processes and PYTHONHASHSEED).
Golden text is computed from construction knowledge — the generator lays
lines on a known grid and knows which paragraphs are main content — NOT by
running the extractor, so the byte-identity test is independent.

Route mix (FIXTURES.md): html ~70%, doc ~15%, image ~5%, empty(text) ~8%,
dup ~2% (byte-identical ``html`` under a different url). Hosts are drawn
from a Zipf-skewed pool so a few heavy hosts exercise skew handling.
"""

from __future__ import annotations

import hashlib
import os
import random
from bisect import bisect_left

import pyarrow as pa
import pyarrow.parquet as pq

from ..config import (
    REOCR_ACCEPT_MARGIN,
    REOCR_CONFIDENCE_THRESHOLD,
    TEXT_JOIN_SEPARATOR,
)
from ..functions.docformat import encode_doc_payload, encode_image_payload, make_line

_WORDS = (
    "data engine stream batch arrow block shard record table column field "
    "vector index query layout page line text token parse merge fuse route "
    "cache hash split model actor worker cluster node spill shuffle window "
    "sample filter reduce extract detect score rank span offset anchor host "
    "crawl corpus archive snapshot content marker signal margin budget tier "
    "region nation order part supply event label metric lineage manifest"
).split()

_LANGS = ("en", "de", "fr", "es", "unknown")

_N_HOSTS = 50

SPAN_TYPE = pa.list_(
    pa.struct([("start", pa.int64()), ("end", pa.int64()), ("kind", pa.string())])
)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

GOLDEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("extracted_text", pa.string()),
        ("spans", SPAN_TYPE),
        ("route", pa.string()),
        ("content_hash", pa.string()),
    ]
)

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _host_cdf() -> list[float]:
    weights = [1.0 / (rank + 1) ** 1.1 for rank in range(_N_HOSTS)]
    total = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / total
        cdf.append(acc)
    return cdf


_HOST_CDF = _host_cdf()


def _pick_host(rng: random.Random) -> str:
    idx = bisect_left(_HOST_CDF, rng.random())
    return f"host{idx:03d}.example.org"


def _sentence(rng: random.Random, lo: int = 6, hi: int = 14) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(rng: random.Random) -> str:
    # Main-content paragraphs stay comfortably above HTML_MIN_BLOCK_CHARS
    # so retention is unambiguous under the extraction heuristics.
    out = " ".join(_sentence(rng) for _ in range(rng.randint(1, 3)))
    while len(out) < 60:
        out += " " + _sentence(rng)
    return out


def _title(rng: random.Random) -> str:
    return " ".join(w.capitalize() for w in (rng.choice(_WORDS) for _ in range(rng.randint(3, 6))))


def _sha256(payload: bytes | None, text: str | None) -> str:
    h = hashlib.sha256()
    if payload:
        h.update(b"B:")
        h.update(payload)
    else:
        h.update(b"T:")
        h.update((text or "").encode("utf-8"))
    return h.hexdigest()


def _spans_from_parts(parts: list[tuple[str, str]]) -> tuple[str, list[dict]]:
    """parts: [(text, kind)] → (joined text, span dicts)."""
    sep = TEXT_JOIN_SEPARATOR
    out, spans, pos = [], [], 0
    for text, kind in parts:
        start = pos
        out.append(text)
        pos += len(text)
        spans.append({"start": start, "end": pos, "kind": kind})
        pos += len(sep)
    return sep.join(out), spans


# ---------------------------------------------------------------------------
# Route payload builders — each returns (html_bytes|None, text_col, golden_parts)
# ---------------------------------------------------------------------------

def _build_html(rng: random.Random, i: int) -> tuple[bytes, str, list[tuple[str, str]]]:
    title = _title(rng)
    golden: list[tuple[str, str]] = [(title, "title")]
    nav_links = "".join(
        f'<li><a href="/s/{k}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a></li>'
        for k in range(rng.randint(3, 7))
    )
    body: list[str] = [
        "<nav><ul>", nav_links, "</ul></nav>",
        f"<header><div>{_sentence(rng, 3, 6)}</div></header>",
        f"<h1>{title}</h1>",
    ]
    n_sections = rng.randint(1, 3)
    for _ in range(n_sections):
        if rng.random() < 0.5:
            head = _title(rng)
            body.append(f"<h2>{head}</h2>")
            golden.append((head, "heading"))
        for _ in range(rng.randint(1, 3)):
            para = _paragraph(rng)
            html_para = para
            if rng.random() < 0.3:
                # entity round-trip: golden carries the decoded form
                para_amp = para.replace(".", " & more.", 1)
                html_para = para_amp.replace("&", "&amp;")
                para = para_amp
            if rng.random() < 0.3:
                # inline link inside main content — low link density, kept
                w = rng.choice(_WORDS)
                html_para += f' See <a href="/ref">{w}</a> notes here today.'
                para += f" See {w} notes here today."
            body.append(f"<p>{html_para}</p>")
            golden.append((para, "paragraph"))
    if rng.random() < 0.5:
        body.append(f"<p>{_sentence(rng, 2, 4)[:30]}</p>")  # short teaser → dropped
    if rng.random() < 0.6:
        items = "".join(
            f'<li><a href="/r/{k}">{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a></li>'
            for k in range(rng.randint(3, 6))
        )
        body.append(f"<div><ul>{items}</ul></div>")  # link farm → dropped
    body.append(
        f'<aside><p>{_paragraph(rng)}</p></aside>'
        f"<footer><p>Copyright {2020 + i % 6} host. All rights reserved notice.</p></footer>"
    )
    html = (
        "<!DOCTYPE html><html><head><title>" + title + "</title></head><body>"
        + "".join(body)
        + "</body></html>"
    )
    return html.encode("utf-8"), "", golden


def _grid_lines(
    rng: random.Random, i: int, page_no: int, kv_header: bool
) -> tuple[list[dict], list[str]]:
    """Build one page of line records on a known grid.

    Returns (shuffled line records, golden line texts in grid order).
    """
    golden_texts: list[str] = []
    recs: list[dict] = []
    y = 40.0
    if kv_header and page_no == 0:
        total = rng.randint(100, 9999) + rng.randint(0, 99) / 100.0
        tax = round(total * 0.1, 2)
        subtotal = round(total - tax, 2)
        kv_lines = [
            f"Invoice Number: INV-{i:06d}",
            f"Date: 2024-{rng.randint(1,12):02d}-{rng.randint(1,28):02d}",
            f"Subtotal: ${subtotal:,.2f}",
            f"Tax: ${tax:,.2f}",
            f"Total: ${total:,.2f}",
        ]
        for text in kv_lines:
            recs.append(make_line(text, (50.0, y, 50.0 + 8 * len(text), y + 28.0), rng.uniform(0.85, 0.99)))
            golden_texts.append(text)
            y += 40.0
    for _ in range(rng.randint(3, 7)):
        n_cols = rng.randint(1, 2)
        xs = (50.0, 520.0)
        for c in range(n_cols):
            clean = _sentence(rng, 4, 9)
            conf = rng.uniform(0.75, 0.99)
            if rng.random() < 0.25:
                # low-confidence line: payload text is the corrupted first
                # pass; the "aggressive second pass" (alt) holds the clean
                # text at a higher confidence. Golden applies the accept
                # margin rule arithmetically — independent of the kernel.
                conf = rng.uniform(0.30, 0.69)
                corrupted = "".join("#" if rng.random() < 0.15 else ch for ch in clean)
                alt_conf = min(0.999, conf + rng.uniform(0.0, 0.30))
                accepted = alt_conf >= conf + REOCR_ACCEPT_MARGIN and conf < REOCR_CONFIDENCE_THRESHOLD
                recs.append(
                    make_line(
                        corrupted,
                        (xs[c], y, xs[c] + 8 * len(clean), y + 28.0),
                        conf,
                        alt_text=clean,
                        alt_conf=alt_conf,
                    )
                )
                golden_texts.append(clean if accepted else corrupted)
            else:
                recs.append(make_line(clean, (xs[c], y, xs[c] + 8 * len(clean), y + 28.0), conf))
                golden_texts.append(clean)
        y += 40.0
    rng.shuffle(recs)
    return recs, golden_texts


def _build_doc(rng: random.Random, i: int) -> tuple[bytes, str, list[tuple[str, str]]]:
    n_pages = rng.randint(1, 4)
    pages, golden_parts = [], []
    for p in range(n_pages):
        recs, texts = _grid_lines(rng, i, p, kv_header=True)
        pages.append({"page": p, "w": 1000.0, "h": 1400.0, "lines": recs})
        golden_parts.extend((t, "line") for t in texts)
    return encode_doc_payload(pages), "", golden_parts


def _build_image(rng: random.Random, i: int) -> tuple[bytes, str, list[tuple[str, str]]]:
    recs, texts = _grid_lines(rng, i, 0, kv_header=False)
    payload = encode_image_payload({"w": 1000.0, "h": 1400.0, "lines": recs})
    return payload, "", [(t, "line") for t in texts]


def _build_empty(rng: random.Random, i: int) -> tuple[None, str, list[tuple[str, str]]]:
    lines = [_sentence(rng) for _ in range(rng.randint(2, 5))]
    raw_parts: list[str] = []
    for ln in lines:
        raw_parts.append(("  " if rng.random() < 0.4 else "") + ln + ("  " if rng.random() < 0.3 else ""))
        if rng.random() < 0.3:
            raw_parts.append("")  # blank line — normalized away
    raw = "\r\n".join(raw_parts) if rng.random() < 0.5 else "\n".join(raw_parts)
    return None, raw, [(t, "line") for t in lines]


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------

def _decide_rows(n_rows: int, seed: int):
    """Phase 1 (sequential, cheap): replicate exactly the per-row RNG
    consumption that precedes payload building — host pick (1 draw), route
    draw (1 draw), dup-source pick (1 randrange) — without building any
    payload. Returns (hosts, routes, src_idx) where ``routes[i]`` is the
    *storage* route ("dup" rows reference ``src_idx[i]``)."""
    hosts: list[str] = []
    routes: list[str] = []
    srcs: list[int] = []
    pool: list[int] = []  # indices of rows eligible as dup sources
    for i in range(n_rows):
        rng = random.Random(f"{seed}:{i}")
        hosts.append(_pick_host(rng))
        r = rng.random()
        if r < 0.70 or (r >= 0.98 and not pool):
            route = "html"
        elif r < 0.85:
            route = "doc"
        elif r < 0.90:
            route = "image"
        elif r < 0.98:
            route = "text"
        else:
            route = "dup"
        src = -1
        if route == "dup":
            src = pool[rng.randrange(len(pool))]
        elif route != "text" and len(pool) < 256:
            pool.append(i)
        routes.append(route)
        srcs.append(src)
    return hosts, routes, srcs


def _build_row(i: int, seed: int, route: str):
    """Build row ``i``'s payload with an RNG in the exact state the
    sequential generator would have it in (host + route draws consumed)."""
    rng = random.Random(f"{seed}:{i}")
    rng.random()  # host pick
    rng.random()  # route draw
    if route == "html":
        return _build_html(rng, i)
    if route == "doc":
        return _build_doc(rng, i)
    if route == "image":
        return _build_image(rng, i)
    return _build_empty(rng, i)


def _build_chunk(args):
    """Worker: build payload+golden for a slice of rows. Dup rows rebuild
    their SOURCE row's payload (deterministic — identical bytes to the
    sequential generator at ~2% duplicated work)."""
    seed, items = args  # items: [(i, route, src, src_route)]
    out = []
    for i, route, src, src_route in items:
        if route == "dup":
            html_b, text_col, parts = _build_row(src, seed, src_route)
            eff_route = src_route
        else:
            html_b, text_col, parts = _build_row(i, seed, route)
            eff_route = route
        extracted, spans = _spans_from_parts(parts)
        out.append((html_b, text_col, extracted, spans, eff_route,
                    _sha256(html_b, text_col)))
    return out


#: Row count above which payload building fans out over processes.
_PARALLEL_GEN_MIN_ROWS = 20_000


def gen_corpus(n_rows: int, seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """Generate (pages table, golden table) with ``n_rows`` pages.

    Two phases so large corpora build in parallel with byte-identical
    output: a sequential decision pass (route mix + dup-source choice,
    pure RNG bookkeeping) and an embarrassingly parallel payload-build
    pass (each row's RNG is keyed ``f"{seed}:{i}"`` — no cross-row
    state)."""
    hosts, routes, srcs = _decide_rows(n_rows, seed)
    items = [(i, routes[i], srcs[i], routes[srcs[i]] if srcs[i] >= 0 else "")
             for i in range(n_rows)]

    if n_rows >= _PARALLEL_GEN_MIN_ROWS:
        import multiprocessing as mp

        nproc = min(16, os.cpu_count() or 1)
        chunk = -(-n_rows // (nproc * 4))
        jobs = [(seed, items[k:k + chunk]) for k in range(0, n_rows, chunk)]
        with mp.get_context("fork").Pool(nproc) as pool:
            built = [row for part in pool.map(_build_chunk, jobs) for row in part]
    else:
        built = _build_chunk((seed, items))

    urls, tss, htmls, texts, langs = [], [], [], [], []
    g_text, g_spans, g_route, g_hash = [], [], [], []
    for i, (html_b, text_col, extracted, spans, eff_route, h) in enumerate(built):
        urls.append(f"https://{hosts[i]}/p/{i:08d}")
        tss.append(_EPOCH_US + i * 1_000_000)
        htmls.append(html_b)
        texts.append(text_col)
        langs.append(_LANGS[i % len(_LANGS)])
        g_text.append(extracted)
        g_spans.append(spans)
        g_route.append(eff_route)
        g_hash.append(h)

    pages = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )
    golden = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(g_text, pa.string()),
            pa.array(g_spans, SPAN_TYPE),
            pa.array(g_route, pa.string()),
            pa.array(g_hash, pa.string()),
        ],
        schema=GOLDEN_SCHEMA,
    )
    return pages, golden


def sf_to_rows(sf: float) -> int:
    """Scale factor → pages rows (TESTDATA tiers: sf0.001→500, sf0.01→5k, sf0.1→50k)."""
    return max(1, int(round(sf * 500_000)))


def sf_from_dir(sf_dir: str) -> float:
    """Parse '.../sf0.01' → 0.01."""
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        return float(base[2:])
    raise ValueError(f"cannot parse scale factor from {sf_dir!r}")


def corpus_dir(sf: float, seed: int = 42, root: str = "/tmp/hopr_corpus") -> str:
    return os.path.join(root, f"seed{seed}_sf{sf:g}")


def ensure_corpus(sf: float, seed: int = 42, root: str = "/tmp/hopr_corpus") -> str:
    """Write (once, atomically) pages.parquet + golden.parquet for a scale
    factor; return the directory. Multiple shard files are written so Ray
    gets parallel read tasks."""
    d = corpus_dir(sf, seed, root)
    pages_path = os.path.join(d, "pages")
    golden_path = os.path.join(d, "golden.parquet")
    done = os.path.join(d, "_DONE")
    if os.path.exists(done):
        return d
    n = sf_to_rows(sf)
    pages, golden = gen_corpus(n, seed)
    tmp = d + ".tmp"
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    # shard pages so read_parquet parallelizes
    n_shards = max(1, min(64, n // 250))
    per = -(-pages.num_rows // n_shards)
    for s in range(n_shards):
        chunk = pages.slice(s * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(tmp, "pages", f"part-{s:04d}.parquet"))
    pq.write_table(golden, os.path.join(tmp, "golden.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(f"n={n} seed={seed}\n")
    if not os.path.exists(done):
        try:
            os.replace(tmp, d)
        except OSError:
            pass  # concurrent creator won
    assert os.path.exists(pages_path) and os.path.exists(golden_path)
    return d
