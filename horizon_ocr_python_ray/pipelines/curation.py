"""The curation funnel: one streaming pass from raw crawl to training-
ready document counts.

Composes the engine's curation operators in the order a Common-Crawl
training-data pipeline applies them, and reports the funnel — how many
pages survive each gate:

1. ``extracted``   — pages that produced text (the extraction pipeline);
2. ``url_dedup``   — earliest crawl per canonical URL (tracking-variant
   re-crawls collapse, `functions/urlnorm.py`);
3. ``content_dedup`` — one representative per content hash (byte-dup
   payloads under different URLs collapse; rep = min url);
4. ``lang_en``     — language-ID gate (`functions/textstats.lang_id`);
5. ``quality``     — minimum token count;
6. ``train``       — the stable md5 train split (`stages/sampling.py`).

Scale shape: a single streaming pass with exactly two narrow shuffles
(canonical_url, then content_hash over the url-reps only — each carries
hash/url/ts/flag columns, never payloads). Stage counts ride along as
group sizes folded into the representative rows, so the funnel needs no
re-execution per stage and no driver-side pass: the final 6-row table
comes out of one tiny aggregation.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, ExtractConfig
from ..functions.textstats import lang_id, token_count
from ..functions.urlnorm import canonicalize_urls
from ..stages.sampling import EVAL_PERMILLE_DEFAULT, _md5_low64
from .extract import build_extract_pipeline

#: Quality gate: minimum whitespace tokens for a training document.
MIN_TOKENS_DEFAULT = 30


def _enrich(batch: pa.Table, min_tokens: int, eval_permille: int) -> pa.Table:
    texts = batch.column("extracted_text").to_pylist()
    urls = batch.column("url").to_pylist()
    langs = [lang_id(t or "") for t in texts]
    toks = [token_count(t or "") for t in texts]
    train = [_md5_low64(u) % 1000 >= eval_permille for u in urls]
    return (batch
            .append_column("canonical_url", canonicalize_urls(batch.column("url")))
            .append_column("pred_lang", pa.array(langs, pa.string()))
            .append_column("n_tokens", pa.array(toks, pa.int64()))
            .append_column("is_train", pa.array(train, pa.bool_())))


def _keep_earliest(group: pa.Table) -> pa.Table:
    """URL-dedup rep: earliest (warc_ts, url); group size rides along."""
    order = pc.sort_indices(group, sort_keys=[("warc_ts", "ascending"),
                                              ("url", "ascending")])
    rep = group.take(order[:1])
    return rep.append_column("n_pages_url", pa.array([group.num_rows], pa.int64()))


def _keep_min_url(group: pa.Table) -> pa.Table:
    """Content-dedup rep among url-reps: min url; fold both group sizes."""
    order = pc.sort_indices(group, sort_keys=[("url", "ascending")])
    rep = group.take(order[:1])
    total = pc.sum(group.column("n_pages_url")).as_py() or 0
    rep = rep.drop_columns(["n_pages_url"])
    return (rep
            .append_column("n_pages_total", pa.array([total], pa.int64()))
            .append_column("n_url_reps", pa.array([group.num_rows], pa.int64())))


def curation_funnel(pages_ds, cfg: ExtractConfig | None = None,
                    min_tokens: int = MIN_TOKENS_DEFAULT,
                    eval_permille: int = EVAL_PERMILLE_DEFAULT):
    """pages → 6-row funnel table (stage, n_rows), single streaming pass."""
    cfg = cfg or DEFAULT_CONFIG
    out = build_extract_pipeline(pages_ds, cfg)
    enriched = out.map_batches(
        lambda t: _enrich(t, min_tokens, eval_permille), batch_format="pyarrow"
    ).select_columns(["url", "warc_ts", "canonical_url", "content_hash",
                      "pred_lang", "n_tokens", "is_train"])

    url_reps = enriched.groupby("canonical_url").map_groups(
        _keep_earliest, batch_format="pyarrow")
    content_reps = url_reps.groupby("content_hash").map_groups(
        _keep_min_url, batch_format="pyarrow")

    def funnel_partial(t: pa.Table) -> pa.Table:
        en = pc.equal(t.column("pred_lang"), "en")
        qual = pc.and_(en, pc.greater_equal(t.column("n_tokens"), min_tokens))
        train = pc.and_(qual, t.column("is_train"))
        vals = [
            pc.sum(t.column("n_pages_total")).as_py() or 0,
            pc.sum(t.column("n_url_reps")).as_py() or 0,
            t.num_rows,
            pc.sum(pc.cast(en, pa.int64())).as_py() or 0,
            pc.sum(pc.cast(qual, pa.int64())).as_py() or 0,
            pc.sum(pc.cast(train, pa.int64())).as_py() or 0,
        ]
        return pa.Table.from_arrays(
            [pa.array(list(range(1, 7)), pa.int64()),
             pa.array(vals, pa.int64())],
            names=["stage_idx", "partial"],
        )

    from ray.data.aggregate import Sum

    partials = content_reps.map_batches(funnel_partial, batch_format="pyarrow")
    agg = partials.groupby("stage_idx").aggregate(Sum("partial", alias_name="n_rows"))

    _STAGES = ["extracted", "url_dedup", "content_dedup", "lang_en", "quality", "train"]

    def name_stages(t: pa.Table) -> pa.Table:
        idx = t.column("stage_idx").to_pylist()
        return pa.Table.from_arrays(
            [t.column("stage_idx"),
             pa.array([_STAGES[i - 1] for i in idx], pa.string()),
             t.column("n_rows")],
            names=["stage_idx", "stage", "n_rows"],
        )

    return agg.map_batches(name_stages, batch_format="pyarrow")
