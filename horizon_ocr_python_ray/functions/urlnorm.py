"""URL canonicalization for crawl dedup (vectorized, RE2 on Arrow).

A Common-Crawl-scale corpus carries the same page under many URL
variants — tracking parameters (``utm_*``, ``ref``, ``fbclid``, ...),
session ids, fragments. Canonicalizing before grouping collapses those
re-crawls without touching payload bytes (the reference's
content-addressed ResponseCache, ``/root/reference/docvision/webapp/
response_cache.py``, solves the same problem by content hash; URL
canonicalization is the cheaper first-pass key that needs no payload
read at all — it prunes re-crawls at the *scan*, which is what matters
at 100 TB).

The rule is deliberately small and is mirrored 1:1 by the DuckDB oracle
(both run RE2, so regex semantics are identical):

1. lowercase;
2. drop the fragment (``#...``);
3. drop tracking key=value pairs WITH their ``?``/``&`` separator;
4. promote the first surviving ``&`` to ``?`` when step 3 consumed the
   original ``?``;
5. strip a trailing ``?`` or ``&``.

Query-parameter ORDER is preserved (no param sort) — reordered params
are treated as distinct URLs, the conservative choice for a dedup key.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: Tracking keys dropped during canonicalization (step 3).
TRACKING_KEYS = "utm_[a-z0-9_]+|ref|sessionid|fbclid|gclid|msclkid"

_FRAGMENT_RE = r"#.*$"
_TRACKING_RE = rf"[?&](?:{TRACKING_KEYS})=[^&#]*"
_PROMOTE_RE = r"^([^?]*)&"
_TRAILING_RE = r"[?&]+$"


def canonicalize_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Vectorized canonicalization of a string array (zero Python loop)."""
    u = pc.utf8_lower(urls)
    u = pc.replace_substring_regex(u, pattern=_FRAGMENT_RE, replacement="")
    u = pc.replace_substring_regex(u, pattern=_TRACKING_RE, replacement="")
    u = pc.replace_substring_regex(u, pattern=_PROMOTE_RE, replacement=r"\1?")
    u = pc.replace_substring_regex(u, pattern=_TRAILING_RE, replacement="")
    return u


def canonicalize_url(url: str) -> str:
    """Scalar convenience wrapper (tests, single lookups)."""
    return canonicalize_urls(pa.array([url], pa.string()))[0].as_py()


def oracle_sql_expr(col: str = "url") -> str:
    """The same rule as DuckDB SQL (both engines are RE2 — semantics
    match exactly). Used by the driver oracle."""
    return (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"lower({col}), '#.*$', ''), "
        f"'[?&](?:{TRACKING_KEYS})=[^&#]*', '', 'g'), "
        "'^([^?]*)&', '\\1?'), '[?&]+$', '')"
    )
