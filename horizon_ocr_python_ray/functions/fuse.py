"""Candidate fusion: per-field-name grouped reduce with selectable
strategy.

Re-expresses the reference fuser (``/root/reference/docvision/kie/fuse.py``):
field-name normalization (``:173-175``), quality filter with the
single-source confidence threshold (``:110-171``, threshold ``:135``),
candidate dedup on (source, value) (``:203-206``), weighted vote
(``:293-323``), consensus (``:342-373``), highest-confidence and
validator-priority selection (``:277-291, :325-340``), and status
determination from matching-source + validation counts (``:375-408``).

All functions are pure; the grouped reduce runs per document inside a
batch function — fields of one document never cross workers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..config import FUSE_MIN_SINGLE_SOURCE_CONFIDENCE, FuseConfig
from .validators import (
    check_document_consistency,
    infer_data_type,
    looks_like_amount,
    looks_like_date,
    normalize_value,
    validate_field,
)

_NAME_NORM_RE = re.compile(r"[ \-]+")


def normalize_field_name(name: str) -> str:
    return _NAME_NORM_RE.sub("_", (name or "").strip().lower())


@dataclass(frozen=True)
class Candidate:
    name: str
    value: str
    confidence: float
    source: str


@dataclass
class FusedField:
    name: str
    value: str
    normalized_value: str | None
    data_type: str
    confidence: float
    status: str
    n_candidates: int
    validators: list[dict] = field(default_factory=list)


def _value_key(value: str) -> str:
    return (value or "").strip().lower()


def quality_filter(cands: list[Candidate], cfg: FuseConfig) -> list[Candidate]:
    """Drop empty values; drop low-confidence single-source candidates;
    drop type-implausible values for amount/date-named fields."""
    by_name_sources: dict[str, set[str]] = {}
    for c in cands:
        by_name_sources.setdefault(c.name, set()).add(c.source)
    out = []
    for c in cands:
        if not (c.value or "").strip():
            continue
        if (
            len(by_name_sources[c.name]) == 1
            and c.confidence < cfg.min_single_source_confidence
        ):
            continue
        lname = c.name.lower()
        if any(k in lname for k in ("total", "amount", "subtotal", "tax")) and not looks_like_amount(c.value):
            continue
        if "date" in lname and not looks_like_date(c.value):
            continue
        out.append(c)
    return out


def _dedup(cands: list[Candidate]) -> list[Candidate]:
    seen: set[tuple[str, str]] = set()
    out = []
    for c in cands:
        key = (c.source, _value_key(c.value))
        if key not in seen:
            seen.add(key)
            out.append(c)
    return out


def _select_weighted_vote(cands: list[Candidate], weights: dict[str, float]) -> Candidate:
    groups: dict[str, list[Candidate]] = {}
    for c in cands:
        groups.setdefault(_value_key(c.value), []).append(c)
    def score(key: str) -> float:
        return sum(c.confidence * weights.get(c.source, 0.5) for c in groups[key])
    best_key = max(sorted(groups), key=score)
    return max(groups[best_key], key=lambda c: (c.confidence, c.source))


def _select_consensus(cands: list[Candidate], weights: dict[str, float]) -> Candidate:
    groups: dict[str, set[str]] = {}
    for c in cands:
        groups.setdefault(_value_key(c.value), set()).add(c.source)
    best = max(sorted(groups), key=lambda k: len(groups[k]))
    n_sources_total = len({c.source for c in cands})
    if len(groups[best]) * 2 > n_sources_total:  # strict majority
        winner_cands = [c for c in cands if _value_key(c.value) == best]
        return max(winner_cands, key=lambda c: (c.confidence, c.source))
    return _select_weighted_vote(cands, weights)


def _select_highest_confidence(cands: list[Candidate], _w: dict[str, float]) -> Candidate:
    return max(cands, key=lambda c: (c.confidence, c.source, _value_key(c.value)))


_STRATEGIES = {
    "weighted_vote": _select_weighted_vote,
    "consensus": _select_consensus,
    "highest_confidence": _select_highest_confidence,
}


def _determine_status(winner: Candidate, cands: list[Candidate], validators: list[dict]) -> str:
    if validators and any(not v["passed"] for v in validators):
        return "validation_failed"
    if validators and all(v["passed"] for v in validators):
        return "validated"
    matching_sources = {
        c.source for c in cands if _value_key(c.value) == _value_key(winner.value)
    }
    if len(matching_sources) >= 2:
        return "confident"
    if winner.confidence < 0.5:
        return "uncertain"
    return "single_source"


def fuse_fields(
    candidates: list[Candidate],
    cfg: FuseConfig,
    run_validators: bool = True,
) -> list[FusedField]:
    """All candidates of ONE document → fused fields, sorted by name."""
    weights = dict(cfg.source_weights)
    cands = [
        Candidate(normalize_field_name(c.name), c.value, c.confidence, c.source)
        for c in candidates
    ]
    cands = quality_filter(_dedup(cands), cfg)
    by_name: dict[str, list[Candidate]] = {}
    for c in cands:
        by_name.setdefault(c.name, []).append(c)

    select = _STRATEGIES.get(cfg.strategy, _select_weighted_vote)
    fused: list[FusedField] = []
    winners: dict[str, str] = {}
    for name in sorted(by_name):
        group = by_name[name]
        winner = select(group, weights)
        data_type = infer_data_type(name, winner.value)
        norm = normalize_value(data_type, winner.value)
        winners[name] = norm if norm is not None else winner.value
        vres = validate_field(name, winner.value, data_type) if run_validators else []
        fused.append(
            FusedField(
                name=name,
                value=winner.value,
                normalized_value=norm,
                data_type=data_type,
                confidence=winner.confidence,
                status="",  # set after consistency pass
                n_candidates=len(group),
                validators=vres,
            )
        )
    if run_validators:
        consistency = check_document_consistency(winners)
        cons_by_field = {"total": [], "subtotal": [], "tax": [], "date": [], "due_date": []}
        for v in consistency:
            if v["name"] == "total_equals_subtotal_plus_tax":
                for f in ("total", "subtotal", "tax"):
                    cons_by_field[f].append(v)
            else:
                for f in ("date", "due_date"):
                    cons_by_field[f].append(v)
        for f in fused:
            f.validators = f.validators + cons_by_field.get(f.name, [])
    for f in fused:
        group = by_name[f.name]
        winner = next(c for c in group if _value_key(c.value) == _value_key(f.value))
        f.status = _determine_status(winner, group, f.validators)
    return fused
