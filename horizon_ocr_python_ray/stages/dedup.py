"""Exact dedup: hash-partition by content hash, extract once, fan back out.

The reference's content-addressed response cache
(``/root/reference/docvision/azure/response_cache.py:66-91``) skips
recomputation for byte-identical inputs. The distributed restatement:

1. ``groupby(content_hash)`` — ONE all-to-all shuffle. Uniformly
   distributed hash keys double as the skew-breaking repartition before
   the heavy actor stage (a hot host's pages scatter across partitions).
2. ``map_groups`` collapses each group to its representative row (minimum
   ``url`` — a total, deterministic choice) and carries the other members
   in a ``members`` list column (url, warc_ts, lang per member). Group
   cardinality is the duplicate multiplicity — tiny — so no join back is
   needed: after extraction, :func:`explode_members` restores one output
   row per input url. Zero additional shuffles.
"""

from __future__ import annotations

import pyarrow as pa

MEMBER_TYPE = pa.list_(
    pa.struct([("url", pa.string()), ("warc_ts", pa.timestamp("us")), ("lang", pa.string())])
)


def collapse_group(group: pa.Table) -> pa.Table:
    """One content-hash group → one representative row + members column."""
    urls = group.column("url").to_pylist()
    tss = group.column("warc_ts").to_pylist()
    langs = group.column("lang").to_pylist()
    order = sorted(range(len(urls)), key=lambda i: urls[i])
    rep = order[0]
    members = [{"url": urls[i], "warc_ts": tss[i], "lang": langs[i]} for i in order]
    rep_row = group.slice(rep, 1)
    return rep_row.append_column("members", pa.array([members], MEMBER_TYPE))


def dedup_collapse(ds):
    """sniffed dataset → one row per distinct content_hash (+ members)."""
    return ds.groupby("content_hash").map_groups(collapse_group, batch_format="pyarrow")


def explode_members(batch: pa.Table) -> pa.Table:
    """Extraction results on representatives → one row per member url.

    Expects columns: members, route, content_hash, extracted_text, spans,
    error. Emits (url, warc_ts, lang, route, content_hash, extracted_text,
    spans, error).
    """
    members_col = batch.column("members").to_pylist()
    keep = ["route", "content_hash", "extracted_text", "spans", "error"]
    idx, urls, tss, langs = [], [], [], []
    for i, members in enumerate(members_col):
        for m in members:
            idx.append(i)
            urls.append(m["url"])
            tss.append(m["warc_ts"])
            langs.append(m["lang"])
    taken = batch.select(keep).take(pa.array(idx, pa.int64()))
    arrays = [
        pa.array(urls, pa.string()),
        pa.array(tss, pa.timestamp("us")),
        pa.array(langs, pa.string()),
    ] + [taken.column(c) for c in keep]
    return pa.Table.from_arrays(arrays, names=["url", "warc_ts", "lang"] + keep)
