"""Nested KIE parsing: JSON / XML-ish tag islands in extracted text →
dotted/indexed field names.

Re-expresses the reference's Donut output parser and field explosion
(``/root/reference/docvision/kie/donut_runner.py:179-236`` — JSON regex
rescue, ``<s_k>v</s_k>`` tags with ``<sep/>``-delimited lists, recursive;
``:261-364`` — nested dict → flat fields with ``a.b[0].c`` names) and the
GPT head's namespaced promotion of structured payloads
(``azure/gpt_vision_kie.py:455-541``). Pure functions — used by the
``fields_stage`` nested head.
"""

from __future__ import annotations

import json
import re
from typing import Any

_JSON_ISLAND_RE = re.compile(r"\{.*\}", re.DOTALL)
_TAG_RE = re.compile(r"<s_(\w+)>(.*?)</s_\1>", re.DOTALL)


def parse_structured(output: str) -> dict[str, Any]:
    """Model-output text → nested dict. JSON island first, then XML-ish
    ``<s_k>`` tags (recursive, ``<sep/>`` lists). Returns {} when neither
    parses — the flat ``Key: Value`` head is a separate source."""
    m = _JSON_ISLAND_RE.search(output)
    if m:
        try:
            parsed = json.loads(m.group())
            if isinstance(parsed, dict):
                return parsed
        except json.JSONDecodeError:
            pass
    result: dict[str, Any] = {}
    for match in _TAG_RE.finditer(output):
        key, value = match.group(1), match.group(2).strip()
        if "<" in value:
            if "<sep/>" in value:
                items = []
                for segment in value.split("<sep/>"):
                    segment = segment.strip()
                    if segment:
                        nested = parse_structured(segment)
                        if nested:
                            items.append(nested)
                result[key] = items if items else value
            else:
                nested = parse_structured(value)
                result[key] = nested if nested else value
        else:
            result[key] = value
    return result


def _scalar_str(value: Any) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float) and value == int(value):
        return str(int(value))
    return str(value)


def explode_fields(data: dict[str, Any], prefix: str = "") -> list[tuple[str, str]]:
    """Nested dict → [(dotted_name, value_str)] rows, reference naming:
    dicts nest with ``.``, lists index with ``[i]`` (dict items recurse
    as ``name[i].``)."""
    out: list[tuple[str, str]] = []
    for key, value in data.items():
        name = f"{prefix}{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.extend(explode_fields(value, f"{name}."))
        elif isinstance(value, list):
            for i, item in enumerate(value):
                if isinstance(item, dict):
                    out.extend(explode_fields(item, f"{name}[{i}]."))
                else:
                    out.append((f"{name}[{i}]", _scalar_str(item)))
        else:
            out.append((name, _scalar_str(value)))
    return out
