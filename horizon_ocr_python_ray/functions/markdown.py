"""Markdown rendering of extraction results (reference S10 analog,
``/root/reference/docvision/io/markdown.py:379-498``): a pure formatting
``map_batches`` body over result rows — never in the hot path, not part
of the byte-identity correctness surface (the survey's call), but a
user-facing sink the reference ships.

Span kinds map to Markdown structure: ``title`` → ``#``, ``heading`` →
``##``, everything else → paragraph text. Deterministic."""

from __future__ import annotations

import pyarrow as pa


def render_markdown(url: str, text: str, spans: list[dict], route: str,
                    error: str | None) -> str:
    lines: list[str] = [f"<!-- url: {url} | route: {route} -->", ""]
    if error:
        lines.append(f"> **extraction error:** `{error}`")
        lines.append("")
    for span in spans or []:
        seg = text[span["start"]:span["end"]]
        kind = span.get("kind", "paragraph")
        if kind == "title":
            lines.append(f"# {seg}")
        elif kind == "heading":
            lines.append(f"## {seg}")
        else:
            lines.append(seg)
        lines.append("")
    return "\n".join(lines).rstrip() + "\n"


def markdown_batch(batch: pa.Table) -> pa.Table:
    urls = batch.column("url").to_pylist()
    texts = batch.column("extracted_text").to_pylist()
    spans = batch.column("spans").to_pylist()
    routes = batch.column("route").to_pylist()
    errors = batch.column("error").to_pylist()
    mds = [render_markdown(u, t, s, r, e)
           for u, t, s, r, e in zip(urls, texts, spans, routes, errors)]
    return pa.Table.from_arrays(
        [pa.array(urls, pa.string()), pa.array(mds, pa.string())],
        names=["url", "markdown"],
    )
