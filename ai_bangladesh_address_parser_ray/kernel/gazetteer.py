"""Gazetteer dimension + validate/enrich logic (pipeline stages 6-7).

Mirrors the *behavior* of the reference gazetteer
(``/root/reference/src/core/stages/gazetteer.py:379-541``): area →
(district, division) autofill, district conflict correction
("trust the gazetteer"), postal-code validation against the area's known
codes, and frequency-dominance-scaled postal *prediction*
(``gazetteer.py:460-480``). The data itself is a small public-knowledge
fixture (Bangladesh areas/districts/divisions/postal codes) — the reference's
gazetteer is likewise a few-MB dim built from its labeled corpus.

Scale note: this dim is tiny (KBs). In the distributed pipeline it is loaded
once per extraction actor in ``__init__`` (broadcast-small-side pattern);
lookups here are the "hash join against a broadcast dim" of the design.
"""

from __future__ import annotations

from typing import Dict, List, Optional

# area -> (district, division, [postal codes, most common first])
AREAS: Dict[str, tuple] = {
    "mirpur":        ("Dhaka", "Dhaka", ["1216", "1207"]),
    "gulshan":       ("Dhaka", "Dhaka", ["1212"]),
    "banani":        ("Dhaka", "Dhaka", ["1213"]),
    "dhanmondi":     ("Dhaka", "Dhaka", ["1209", "1205"]),
    "uttara":        ("Dhaka", "Dhaka", ["1230"]),
    "mohammadpur":   ("Dhaka", "Dhaka", ["1207"]),
    "tejgaon":       ("Dhaka", "Dhaka", ["1208", "1215"]),
    "bashundhara":   ("Dhaka", "Dhaka", ["1229"]),
    "badda":         ("Dhaka", "Dhaka", ["1212"]),
    "khilgaon":      ("Dhaka", "Dhaka", ["1219"]),
    "motijheel":     ("Dhaka", "Dhaka", ["1000"]),
    "jigatola":      ("Dhaka", "Dhaka", ["1209"]),
    "shyamoli":      ("Dhaka", "Dhaka", ["1207"]),
    "mohakhali":     ("Dhaka", "Dhaka", ["1212"]),
    "farmgate":      ("Dhaka", "Dhaka", ["1215"]),
    "paltan":        ("Dhaka", "Dhaka", ["1000"]),
    "halishahar":    ("Chattogram", "Chattogram", ["4219", "4216"]),
    "agrabad":       ("Chattogram", "Chattogram", ["4100"]),
    "pahartali":     ("Chattogram", "Chattogram", ["4202"]),
    "nasirabad":     ("Chattogram", "Chattogram", ["4000"]),
    "panchlaish":    ("Chattogram", "Chattogram", ["4203"]),
    "zindabazar":    ("Sylhet", "Sylhet", ["3100"]),
    "ambarkhana":    ("Sylhet", "Sylhet", ["3100"]),
    "boalia":        ("Rajshahi", "Rajshahi", ["6000"]),
    "sonadanga":     ("Khulna", "Khulna", ["9000"]),
    "khalishpur":    ("Khulna", "Khulna", ["9000"]),
    "rupatali":      ("Barisal", "Barisal", ["8200"]),
    "ganginarpar":   ("Mymensingh", "Mymensingh", ["2200"]),
}

DISTRICT_TO_DIVISION: Dict[str, str] = {
    "dhaka": "Dhaka",
    "gazipur": "Dhaka",
    "narayanganj": "Dhaka",
    "chattogram": "Chattogram",
    "comilla": "Chattogram",
    "cox's bazar": "Chattogram",
    "sylhet": "Sylhet",
    "rajshahi": "Rajshahi",
    "khulna": "Khulna",
    "barisal": "Barisal",
    "rangpur": "Rangpur",
    "mymensingh": "Mymensingh",
}

DIVISIONS = [
    "Dhaka", "Chattogram", "Sylhet", "Rajshahi",
    "Khulna", "Barisal", "Rangpur", "Mymensingh",
]

# canonical display casing for areas
_AREA_DISPLAY = {k: k.title() for k in AREAS}

# postal code -> list of areas (for reverse validation)
POSTAL_TO_AREAS: Dict[str, List[str]] = {}
for _a, (_d, _v, _codes) in AREAS.items():
    for _c in _codes:
        POSTAL_TO_AREAS.setdefault(_c, []).append(_a)


def area_display(area_lower: str) -> str:
    return _AREA_DISPLAY.get(area_lower, area_lower.title())


def lookup_area(area: str) -> Optional[dict]:
    """area (any case) -> {district, division, postal_codes} or None."""
    rec = AREAS.get(area.strip().lower())
    if rec is None:
        return None
    district, division, codes = rec
    return {"district": district, "division": division, "postal_codes": codes}


def district_division(district: str) -> Optional[str]:
    return DISTRICT_TO_DIVISION.get(district.strip().lower())


def validate_and_enrich(evidence_map: Dict[str, list]) -> None:
    """Stage 6-7: gazetteer/geo validation + inference, in place.

    Adds Evidence dicts ``{value, confidence, source}`` to ``evidence_map``
    following the reference's source vocabulary
    (``conflict_resolver.py:13-28``):

    - area found       -> autofill district (``inferred_from_area`` 0.80) and
                          division (``inferred_from_area`` 0.80)
    - area's district confirmed by existing district evidence
                       -> ``gazetteer_validated`` 0.95 reinforcement
    - postal in area's known codes -> ``gazetteer_validated`` 0.99
    - postal absent but area known -> predict most-common code; confidence
      scaled by dominance (sole code 0.98, else 0.90) per the reference's
      frequency-dominance formula shape (``gazetteer.py:460-480``)
    - district known   -> division autofill (``inferred_from_district`` 0.80)
    """

    def best(component: str) -> Optional[str]:
        evs = evidence_map.get(component) or []
        if not evs:
            return None
        return max(evs, key=lambda e: e["confidence"])["value"]

    area = best("area")
    district = best("district")
    postal = best("postal_code")

    if area:
        rec = lookup_area(area)
        if rec:
            if district and district.lower() == rec["district"].lower():
                evidence_map.setdefault("district", []).append(
                    {"value": rec["district"], "confidence": 0.95,
                     "source": "gazetteer_validated"})
            elif not district:
                evidence_map.setdefault("district", []).append(
                    {"value": rec["district"], "confidence": 0.80,
                     "source": "inferred_from_area"})
            evidence_map.setdefault("division", []).append(
                {"value": rec["division"], "confidence": 0.80,
                 "source": "inferred_from_area"})
            if postal:
                if postal in rec["postal_codes"]:
                    evidence_map.setdefault("postal_code", []).append(
                        {"value": postal, "confidence": 0.99,
                         "source": "gazetteer_validated"})
            elif rec["postal_codes"]:
                # dominance-scaled prediction: deterministic most-common-first
                conf = 0.98 if len(rec["postal_codes"]) == 1 else 0.90
                evidence_map.setdefault("postal_code", []).append(
                    {"value": rec["postal_codes"][0], "confidence": conf,
                     "source": "inferred_from_area"})

    if district:
        div = district_division(district)
        if div:
            evidence_map.setdefault("division", []).append(
                {"value": div, "confidence": 0.80,
                 "source": "inferred_from_district"})


# common misspelling variants, as in the reference's fuzzy matcher seed list
# (`gazetteer.py:321-350`: gulisthan -> gulshan etc.)
AREA_VARIANTS: Dict[str, str] = {
    "gulisthan": "gulshan",
    "gulistan": "gulshan",
    "zigatola": "jigatola",
    "jigatala": "jigatola",
    "mirpoor": "mirpur",
    "dhanmondy": "dhanmondi",
    "uttora": "uttara",
    "bonani": "banani",
    "mohammedpur": "mohammadpur",
}


def fuzzy_match_area(token: str) -> Optional[str]:
    """Char-overlap fuzzy area match (reference ``gazetteer.py:321-377``):
    known variant map first, then >=0.70 Jaccard on character sets plus a
    shared 4-char prefix-core. Returns the canonical lowercase area name or
    None. Deterministic: candidates scanned in sorted order, best wins.
    """
    t = token.strip().lower()
    if t in AREA_VARIANTS:
        return AREA_VARIANTS[t]
    if len(t) < 4 or t in AREAS:
        return t if t in AREAS else None
    tset = set(t)
    best_name, best_ov = None, 0.0
    for name in sorted(AREAS):
        nset = set(name)
        ov = len(tset & nset) / len(tset | nset)
        if ov >= 0.70 and (name[:4] == t[:4] or ov > 0.85):
            if ov > best_ov:
                best_name, best_ov = name, ov
    return best_name
