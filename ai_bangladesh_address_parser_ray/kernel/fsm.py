"""Simple FSM-style first-match parser (pipeline stage 3, "fsm" source).

Behavioral twin of the reference's SimpleFSMParser
(``/root/reference/src/core/stages/fsm_parser.py:13-75``): a small bank of
first-match regexes with a flat 0.75 confidence when anything matched.
Runs alongside the richer regex stage and feeds the conflict resolver as an
independent evidence source.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

_HOUSE = [
    re.compile(r"House\s+No\s+(\d+[A-Za-z]?)", re.I),
    re.compile(r"House\s+No\s+(\d+/[A-Za-z])", re.I),
    re.compile(r"House\s+(\d+)", re.I),
    re.compile(r"\bH\s+(\d+)", re.I),
]
_ROAD = [
    re.compile(r"Road\s+No\s+(\d+[A-Za-z]?)", re.I),
    re.compile(r"Road\s+No\s+(\d+/[A-Za-z]?)", re.I),
    re.compile(r"Road\s+(\d+)", re.I),
    re.compile(r"\bR\s+(\d+)", re.I),
]
_POSTAL = re.compile(r"\b(\d{4})\b")
# skip the "No"/"Number" marker token so "Flat No- A 5" yields the value,
# not the literal word "No" (the \w+ twin otherwise surfaces the marker as
# a false-positive flat when the richer regex bank found nothing)
_FLAT = re.compile(r"Flat\s+(?:(?:No|Number|Num)\W{0,2}\s*)?(\w+)", re.I)
_FLOOR = re.compile(r"Floor\s+(\d+)", re.I)
_BLOCK = re.compile(r"Block\s+([A-Z0-9]+)")

FSM_CONFIDENCE = 0.75


def fsm_parse(text: str) -> Dict[str, Optional[str]]:
    """First-match parse; returns {component: value|None}.

    Literal prefilters: each bank's keyword is a required literal of its
    regex (e.g. the first three house forms cannot match without "house"
    in the string), so one substring probe on the lowercased text skips
    the search outright — regex search was 36% of kernel time profiled."""
    out: Dict[str, Optional[str]] = {
        "house_number": None, "road": None, "postal_code": None,
        "flat_number": None, "floor_number": None, "block_number": None,
    }
    low = text.lower()
    for rx in (_HOUSE if "house" in low else _HOUSE[3:]):
        m = rx.search(text)
        if m:
            out["house_number"] = m.group(1)
            break
    for rx in (_ROAD if "road" in low else _ROAD[3:]):
        m = rx.search(text)
        if m:
            out["road"] = m.group(1)
            break
    m = _POSTAL.search(text)
    if m and m.end() > len(text) * 0.5:
        out["postal_code"] = m.group(1)
    if "flat" in low:
        m = _FLAT.search(text)
        if m:
            out["flat_number"] = m.group(1)
    if "floor" in low:
        m = _FLOOR.search(text)
        if m:
            out["floor_number"] = m.group(1)
    if "block" in low:
        m = _BLOCK.search(text)
        if m:
            out["block_number"] = m.group(1)
    return out
