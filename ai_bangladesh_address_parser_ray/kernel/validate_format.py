"""Validation, formatting and suggestion utilities.

Behavioral twins of ``/root/reference/src/core/utils/address_utils.py``:
- validate_address (:9-66): completeness fraction over the 9 fields,
  required = {district or area}, postal format check,
  score = 0.7*required + 0.3*completeness
- format_address (:69-128): full / short / postal / minimal styles
- suggest (top-k prefix/substring over the gazetteer dim — dim is tiny so it
  runs driver-side)
"""

from __future__ import annotations

import re
from typing import Dict, List

from .compare import seq_ratio
from .gazetteer import AREAS, area_display
from . import normalizer  # noqa: F401  (re-export convenience)

FIELDS = [
    "house_number", "road", "area", "district", "division",
    "postal_code", "flat_number", "floor_number", "block_number",
]
_POSTAL_RE = re.compile(r"^\d{4}$")


def validate_address(components: Dict) -> Dict:
    present = [f for f in FIELDS if str(components.get(f) or "").strip()]
    missing = [f for f in FIELDS if f not in present]
    completeness = len(present) / len(FIELDS)

    invalid: List[str] = []
    postal = str(components.get("postal_code") or "").strip()
    if postal and not _POSTAL_RE.match(postal):
        invalid.append("postal_code")

    required_ok = bool(
        str(components.get("district") or "").strip()
        or str(components.get("area") or "").strip()
    )
    score = 0.7 * (1.0 if required_ok else 0.0) + 0.3 * completeness
    return {
        "is_valid": required_ok and not invalid,
        "completeness": completeness,
        "missing": missing,
        "invalid": invalid,
        "score": round(score, 3),
    }


def format_address(components: Dict, style: str = "full",
                   separator: str = ", ", include_postal: bool = True) -> str:
    c = {f: str(components.get(f) or "").strip() for f in FIELDS}
    parts: List[str] = []
    if style == "full":
        if c["flat_number"]:
            parts.append(f"Flat {c['flat_number']}")
        if c["floor_number"]:
            parts.append(f"Floor {c['floor_number']}")
        if c["house_number"]:
            parts.append(f"House {c['house_number']}")
        if c["block_number"]:
            parts.append(f"Block {c['block_number']}")
        if c["road"]:
            road = c["road"]
            parts.append(road if any(ch.isalpha() for ch in road)
                         else f"Road {road}")
        if c["area"]:
            parts.append(c["area"])
        if c["district"]:
            if include_postal and c["postal_code"]:
                parts.append(f"{c['district']}-{c['postal_code']}")
            else:
                parts.append(c["district"])
        elif include_postal and c["postal_code"]:
            parts.append(c["postal_code"])
    elif style == "short":
        if c["house_number"]:
            parts.append(f"H-{c['house_number']}")
        if c["road"]:
            parts.append(f"R-{c['road']}" if c["road"].isdigit() else c["road"])
        if c["area"]:
            parts.append(c["area"])
        if c["district"]:
            parts.append(c["district"])
    elif style == "postal":
        if c["area"]:
            parts.append(c["area"])
        if c["district"]:
            parts.append(c["district"])
        if c["postal_code"]:
            parts.append(c["postal_code"])
    elif style == "minimal":
        if c["area"]:
            parts.append(c["area"])
        if c["district"]:
            parts.append(c["district"])
    else:
        raise ValueError(f"unknown style: {style}")
    return separator.join(parts)


def suggest_areas(query: str, limit: int = 5) -> List[Dict]:
    """Top-k area suggestions: substring boost + SequenceMatcher score over
    the gazetteer dim (tiny -> driver-side), sorted desc then by name."""
    q = query.strip().lower()
    scored = []
    for name in AREAS:
        s = seq_ratio(q, name)
        if q in name or name.startswith(q):
            s = max(s, 0.9 + 0.1 * (len(q) / max(len(name), 1)))
        scored.append((round(s, 4), name))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [
        {"area": area_display(n), "district": AREAS[n][0],
         "division": AREAS[n][1], "score": s}
        for s, n in scored[:limit]
    ]
