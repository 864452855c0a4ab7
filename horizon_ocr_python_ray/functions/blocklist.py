"""Domain-blocklist URL filtering — the crawl-hygiene gate.

Every web-corpus pipeline front-loads a domain blocklist (spam, adult,
tracker, malware hosts — C4 §2.2's "bad domains", the RefinedWeb URL
filter stage): a page is blocked when its host IS a listed domain or is
a SUBDOMAIN of one (registrable-suffix semantics: ``a.b.example.net``
matches ``example.net``; ``notexample.net`` does not). First matching
list entry wins, so the audit column names the responsible rule
deterministically.

Scale shape: the blocklist is a small broadcast side (a module constant
here; at 100 TB a ``ray.put`` list read once per worker) probed inside a
stateless ``map_batches`` — zero shuffles, and the probe is one Arrow
kernel per blocklist entry (exact ``is_in``-style equality + an
``ends_with`` suffix test), never a per-row Python loop. A 100k-entry
production list swaps the per-entry kernels for one reversed-host
prefix ``searchsorted`` against the sorted reversed blocklist; the
semantics (and this operator's output) are identical.

Host extraction reuses ``stages/skew.host_of_array`` (the vectorized
RE2 kernel every host-keyed stage shares); the DuckDB oracle mirrors it
with the engine's standard host SQL idiom.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.skew import host_of_array

#: Blocked registrable domains, priority order (first match names the
#: rule). Deterministic test corpus entries + a suffix-only entry that
#: matches nothing at small sf (exercises the subdomain rule).
BLOCKLIST = (
    "host007.example.org",
    "host013.example.org",
    "host021.example.org",
    "tracker.example.net",
)


def blocklist_filter_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """(url, ...) → (url, host, blocked_by) for every row; ``blocked_by``
    is the first matching blocklist entry or '' when the page is allowed
    (callers drop ``blocked_by != ''`` rows; keeping the audit column
    makes the decision replayable)."""
    host = host_of_array(batch.column(url_col))
    blocked_by = pa.array([""] * len(host), pa.string())
    # Walk the list in REVERSE so earlier entries overwrite later ones —
    # first-match-wins with one if_else kernel per entry.
    for dom in reversed(BLOCKLIST):
        hit = pc.or_(pc.equal(host, dom),
                     pc.ends_with(host, pattern="." + dom))
        blocked_by = pc.if_else(hit, dom, blocked_by)
    return pa.table({
        "url": batch.column(url_col),
        "host": host,
        "blocked_by": blocked_by,
    })
