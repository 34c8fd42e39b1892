"""Per-field regex extractors (pipeline stage 4, "regex" evidence source).

A curated re-expression of the reference's prioritized pattern banks
(``/root/reference/src/regex/{house_number,road,area,district,postal_code,
flat_number,floor_number,block}_processor.py``): priority-ordered compiled
patterns with positional and cross-field false-positive guards. Patterns are
compiled at import time so ``map_batches`` tasks pay zero setup.

Every extractor takes the *normalized* text (see ``normalizer.py``) and
returns ``(value, confidence) | None`` deterministically (first matching
pattern in priority order wins, as in the reference's priority scoring,
``house_number_processor.py:997-1110``).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

from .gazetteer import AREAS, DISTRICT_TO_DIVISION, DIVISIONS, area_display

Hit = Optional[Tuple[str, float]]

_NUMTOK = r"\d+(?:/[A-Za-z0-9]+)?"

# ---------------------------------------------------------------- house
# NOTE: patterns run on NORMALIZED text — the normalizer rewrites `#`
# to " No " and `:` to " ", so the reference's `House# 12` / `H:51`
# forms arrive here as `House No 12` / `H 51` (one bank covers both).
_HOUSE_KW = r"(?:House|Home|Hous|Bari|Basa|Basha)"
# Banglish alphabet prefixes (`Kha-32/1`, `CHO 55/A`, `JA-10/1/A`; reference
# `house_number_processor.py:131-137`) — multi-letter forms only: the
# reference's single-letter `k/g` alternatives false-positive on initials
_BANGLISH = r"(?:kha|gha|jha|chha|cho|cha|ka|kh|ja|ga|ch|gh)"
_HOUSE_PATTERNS = [
    (re.compile(rf"\b{_HOUSE_KW}\s*No\.?\s*-?\s*({_NUMTOK}[A-Za-z]?)",
                re.I), 0.95),
    (re.compile(rf"\bHolding\s*(?:No\.?\s*)?-?\s*({_NUMTOK})", re.I), 0.92),
    (re.compile(rf"\b(?:Building|Bldg)\s*(?:No\.?\s*)?[\s-]*"
                rf"({_NUMTOK}[A-Za-z]?)\b", re.I), 0.92),
    (re.compile(rf"\bPlot\s*(?:No\.?\s*)?[\s-]*({_NUMTOK}[A-Za-z]?)\b",
                re.I), 0.92),
    # ranges / multiples: "House 8+9", "House 98-99" (reference :173-175)
    (re.compile(rf"\b{_HOUSE_KW}\s*-?\s*(\d+\s*[+&]\s*\d+)\b", re.I), 0.90),
    (re.compile(rf"\b{_HOUSE_KW}\s*-?\s*(\d+\s*-\s*\d+)\b", re.I), 0.90),
    # combo "House 60 Kha 7" (reference house_number_processor.py:181) —
    # must outrank the generic number pattern below or it stops at "60"
    (re.compile(rf"\b{_HOUSE_KW}\s+(\d+\s+{_BANGLISH}\s+\d+)\b", re.I), 0.90),
    (re.compile(rf"\b{_HOUSE_KW}\s*-?\s*({_NUMTOK}[A-Za-z]?)\b", re.I), 0.90),
    # Banglish prefix + number chain: Kha/50, Kha-32/1, CHO 55/A
    (re.compile(rf"\b({_BANGLISH}\s*[-/]?\s*\d+(?:/[A-Za-z0-9]+)*)"
                rf"(?=\s*[,(]|\s|$)", re.I), 0.90),
    # "H# 12" / "H# CB 11/12" arrive as "H No 12" / "H No CB 11/12"
    (re.compile(rf"\bH\s*No\.?\s*-?\s*({_NUMTOK}[A-Za-z]?)\b", re.I), 0.92),
    (re.compile(r"\bH\s*No\.?\s*([A-Z]{1,3}\s*\d+(?:/[A-Za-z0-9]+)*)\b",
                re.I), 0.92),
    (re.compile(rf"\bH\s*[@]\s*({_NUMTOK}[A-Za-z]?)\b", re.I), 0.88),
    (re.compile(rf"\bH\s*[-.]?\s*({_NUMTOK})\b", re.I), 0.85),
    # letter-valued: "House No. F/30", "House C/36", "House J57" (:194-205)
    (re.compile(rf"\b{_HOUSE_KW}\s*(?:No\.?\s*)?-?\s*"
                rf"([A-Za-z]\s*/\s*\d+[A-Za-z]?)\b", re.I), 0.90),
    (re.compile(rf"\b{_HOUSE_KW}\s+([A-Za-z]-?\d+[A-Za-z]?)\b", re.I), 0.88),
    # reversed "12 no house" / "3/B no basa" (:228-231)
    (re.compile(rf"\b({_NUMTOK}[A-Za-z]?)\s+No\.?\s+"
                rf"(?:House|Basa|Basha)\b", re.I), 0.90),
    # mahol/mahal household unit (:246)
    (re.compile(r"\b(?:Mahol|Mahal)\s*-?\s*(\d+[A-Za-z]?)\b", re.I), 0.85),
]
# bare-number positionals — no keyword claims the value, so an extra
# left-context guard rejects numbers owned by road/flat/block/… (the
# reference applies its standalone bank only after keyword banks miss and
# vetoes context words, house_number_processor.py:253-281)
_HOUSE_POSITIONAL = [
    # leading positional: "105/A, Central Road ...", "10/1/D North Bashabo",
    # "43-R/5 Indira Road", "25A Dilu Road" (multi-segment compounds)
    (re.compile(r"^\s*(\d{1,4}[A-Za-z]?"
                r"(?:\s*[/-]\s*[A-Za-z0-9]{1,4}){0,3})\s*[, ]"), 0.75),
    # standalone compound "9/2(a)," / "345/3-5," / "27/A/1," before a comma
    (re.compile(r"\b(\d{1,4}[A-Za-z]?(?:\s*[/-]\s*[A-Za-z0-9()]{1,4}){1,3})"
                r"\s*,"), 0.72),
]
_STRUCT_BEFORE = re.compile(
    r"\b(?:Road|Rd|Lane|Line|Goli|Flat|Block|Floor|Level|Sector|Plot|Ward|"
    r"Apartment|Post|Postal|Zip|Holding|Building|Bldg)"
    r"\s*(?:No\.?\s*)?[-.]?\s*$", re.I)
_POSTAL_SHAPE = re.compile(r"^\d{4}$")
# guard: "2 No Road / 3 No Lane / 6 No ward" — the number names a road or
# ward, not a house (reference `_is_road_goli_number`, :404-447)
_ROAD_GOLI_AFTER = re.compile(
    r"^\s*No\.?\s+(?:\w+\s+){0,2}?(?:Road|Lane|Goli|Ward|Gate|Sector|"
    r"Thana|Upazila|Checkpost)\b", re.I)
# guard: institutional context right before the number — "Ward 12",
# "Mosque 5" etc. name the institution's unit, not a house (reference
# institutional skip, house_number_processor.py:612-700)
_INSTITUTION_BEFORE = re.compile(
    r"(?:hospital|college|university|school|mosque|masjid|bank|ward)"
    r"[\s,]*$", re.I)


def _house_guards_ok(text: str, m, val: str, n: int) -> bool:
    # guard: phone-shaped (>5 digits in one run) can never be a house
    if len(re.sub(r"\D", "", val)) > 5:
        return False
    # guard: a bare 4-digit token in the trailing third is postal-shaped
    # (reference guard `_is_postal_code`, house_number_processor.py:447)
    if _POSTAL_SHAPE.match(val) and m.start(1) > 0.66 * n:
        return False
    if _ROAD_GOLI_AFTER.match(text[m.end(1):]):
        return False
    if _INSTITUTION_BEFORE.search(text[: m.start(1)][-30:]):
        return False
    return True


def extract_house(text: str) -> Hit:
    n = len(text) or 1
    for rx, conf in _HOUSE_PATTERNS:
        m = rx.search(text)
        if not m:
            continue
        val = m.group(1)
        if _house_guards_ok(text, m, val, n):
            return val, conf
    for rx, conf in _HOUSE_POSITIONAL:
        m = rx.search(text)
        if not m:
            continue
        val = m.group(1)
        # bare numbers additionally must not be claimed by a structural
        # keyword immediately to the left
        if _STRUCT_BEFORE.search(text[: m.start(1)][-24:]):
            continue
        if _house_guards_ok(text, m, val, n):
            return val, conf
    return None


# ----------------------------------------------------------------- road
# Bangla road forms (`রোড/লেন/গলি`, reference road_processor.py) arrive
# post-normalization as Road/Lane/Lane, so the Latin bank covers them; Goli
# appears verbatim when written in Latin script ("Nasir Goli").
_ROAD_PATTERNS = [
    (re.compile(r"\b(?:Road|Rd)\s*No\.?\s*-?\s*"
                r"(\d+(?:/[A-Za-z0-9]+)?[A-Za-z]?)", re.I), 0.95),
    (re.compile(r"\b(?:Road|Rd)\s*-?\s*(\d+[A-Za-z]?)\b", re.I), 0.90),
    # "2 No Road" — the road-goli form the house guard rejects
    (re.compile(r"\b(\d+)\s*No\.?\s+(?:Road|Goli|Lane)\b", re.I), 0.90),
    (re.compile(r"\bLane\s*(?:No\.?)?\s*-?\s*(\d+[A-Za-z]?)\b", re.I), 0.88),
    # "Line #16" arrives as "Line No 16"; "Line-16" (road_processor.py:149-150)
    (re.compile(r"\bLine\s*(?:No\.?\s*)?-?\s*(\d+[A-Za-z]?)\b", re.I), 0.88),
    # ordinal lane: "2nd Lane" (:152)
    (re.compile(r"\b(\d+(?:st|nd|rd|th)\s+Lane)\b", re.I), 0.90),
    # numbered avenue: "Avenue 2" / "Avenue-5" (:156-157)
    (re.compile(r"\bAvenue\s*-?\s*(\d+)\b", re.I), 0.88),
    # letter-prefixed road number: "Road-N05" (:200)
    (re.compile(r"\b(?:Road|Rd)\s*-\s*([A-Za-z]\d+[A-Za-z]?)\b", re.I), 0.85),
    (re.compile(r"\bR\s*[-.]\s*(\d+[A-Za-z]?)\b", re.I), 0.80),
]
_NAMED_ROAD = re.compile(
    r"\b(?:Road|Lane|Line|Avenue|Street|Goli|Sarani|Sarak)\b\s*$", re.I)
_FEET_ROAD = re.compile(r"\b(\d+\s*feet\s*road)\b", re.I)
# bare "60 Feet" names a road in Dhaka usage (reference road bank :184)
_FEET_BARE = re.compile(r"\b(\d+\s*feet)\b", re.I)
# mid-segment named road: "South Fuller Road Residential Area" -> capture
# "South Fuller Road" (reference allows \s in the lookahead, :175-176)
_NAMED_ROAD_MID = re.compile(
    r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,3}\s+(?:Road|Lane|Avenue))\b")


def extract_road(text: str) -> Hit:
    for rx, conf in _ROAD_PATTERNS:
        m = rx.search(text)
        if m:
            return m.group(1), conf
    m = _FEET_ROAD.search(text)
    if m:
        return m.group(1), 0.90
    # named roads: a comma segment ending in Road/Lane/Line/Avenue/Goli/...
    for seg in text.split(","):
        seg = seg.strip()
        if seg and _NAMED_ROAD.search(seg) and len(seg) <= 48:
            return seg, 0.85
    m = _NAMED_ROAD_MID.search(text)
    if m:
        return m.group(1), 0.80
    m = _FEET_BARE.search(text)
    if m:
        return m.group(1), 0.78
    return None


# ----------------------------------------------------------------- area
_AREA_RE = re.compile(
    r"\b(" + "|".join(sorted(AREAS, key=len, reverse=True)) + r")\b", re.I
)


def extract_area(text: str) -> Hit:
    # LAST mention wins: the reference's intelligent scorer boosts
    # candidates later in the string (position ratio / before-city boost,
    # area_processor.py:965-1118) — "Shewrapara, Mirpur, Dhaka" is
    # labeled Mirpur, the parent area closest to the city
    last = None
    for m in _AREA_RE.finditer(text):
        last = m
    if last:
        return area_display(last.group(1).lower()), 0.90
    return None


# ------------------------------------------------------------- district
_DISTRICTS = sorted(DISTRICT_TO_DIVISION, key=len, reverse=True)
_DISTRICT_EXPLICIT = re.compile(r"\bDistrict\s*-?\s*([A-Za-z' ]+?)\b", re.I)
_DISTRICT_RE = re.compile(
    r"\b(" + "|".join(re.escape(d) for d in _DISTRICTS) + r")\b", re.I
)
_DISTRICT_DISPLAY = {d: d.title() for d in DISTRICT_TO_DIVISION}
_DISTRICT_DISPLAY["cox's bazar"] = "Cox's Bazar"


def extract_district(text: str) -> Hit:
    m = _DISTRICT_EXPLICIT.search(text)
    if m and m.group(1).strip().lower() in DISTRICT_TO_DIVISION:
        return _DISTRICT_DISPLAY[m.group(1).strip().lower()], 0.95
    # last mention wins: districts come at the tail of Bangladeshi addresses
    last = None
    for m in _DISTRICT_RE.finditer(text):
        last = m
    if last:
        return _DISTRICT_DISPLAY[last.group(1).lower()], 0.90
    return None


# ------------------------------------------------------------- division
_DIVISION_EXPLICIT = re.compile(
    r"\b(" + "|".join(DIVISIONS) + r")\s+Division\b", re.I
)
_DIVISION_DISPLAY = {d.lower(): d for d in DIVISIONS}


def extract_division(text: str) -> Hit:
    m = _DIVISION_EXPLICIT.search(text)
    if m:
        return _DIVISION_DISPLAY[m.group(1).lower()], 0.95
    return None


# -------------------------------------------------------------- country
# CityResult.country parity (reference district_processor.py:177-212):
# explicit mention -> position-scaled confidence; default Bangladesh 0.95
_COUNTRY_VARIANTS = [
    ("Bangladesh", ["bangladesh", "bd", "b.d.", "b.d", "bdesh", "বাংলাদেশ"]),
    ("India", ["india", "ভারত"]),
    ("Pakistan", ["pakistan", "পাকিস্তান"]),
    ("Myanmar", ["myanmar", "burma"]),
    ("Nepal", ["nepal", "নেপাল"]),
    ("Bhutan", ["bhutan"]),
    ("Sri Lanka", ["sri lanka", "srilanka", "ceylon"]),
]


def extract_country(text: str) -> Tuple[str, float]:
    """Always returns a value (the reference defaults to Bangladesh 0.95)."""
    if not text:
        return "Bangladesh", 0.95
    low = text.lower()
    for country, variations in _COUNTRY_VARIANTS:
        for v in variations:
            if re.search(rf"\b{re.escape(v)}\b", low):
                if low.endswith(v) or low.endswith(v + "."):
                    return country, 1.00
                segs = text.split(",")
                if segs and v in segs[-1].lower():
                    return country, 0.98
                return country, 0.90
    return "Bangladesh", 0.95


# --------------------------------------------------------------- postal
_POSTAL_EXPLICIT = re.compile(
    r"\b(?:Post\s*Code|Postal\s*Code|Post|P\.?O\.?|Zip)\s*-?\s*(\d{4})\b", re.I
)
# city-dash requires a KNOWN place-name prefix ("Dhaka-1216") — the
# reference's city-dash pattern bank enumerates actual city/area names
# (postal_code_processor.py:122-202), never arbitrary words ("file - 8684")
# or structural tokens (H-12 / Road-8 / Flat-D2). The allowlist is the
# single-word tokens of every gazetteer area, district, division and geo
# upazila (names are matched post-normalization, so canonical spellings).
_CITY_DASH = re.compile(r"\b([A-Za-z]{3,})\s*-\s*(\d{4})\b")


def _place_words():
    from .geo import UPAZILAS
    words = set()
    for name in (set(AREAS) | set(DISTRICT_TO_DIVISION)
                 | {d.lower() for d in DIVISIONS} | set(UPAZILAS)):
        for w in re.split(r"[^a-z]+", name.lower()):
            if len(w) >= 3:
                words.add(w)
    return words


_CITY_DASH_OK = _place_words()
_FOUR_DIGIT = re.compile(r"\b(\d{4})\b")
_POSTAL_BAD_CTX = re.compile(r"\b(?:House|Road|Flat|H|R)\s*(?:No\.?\s*)?-?\s*$", re.I)


def _postal_valid(code: str) -> bool:
    return code.isdigit() and 1000 <= int(code) <= 9999


def extract_postal(text: str) -> Hit:
    m = _POSTAL_EXPLICIT.search(text)
    if m and _postal_valid(m.group(1)):
        return m.group(1), 1.00
    for m in _CITY_DASH.finditer(text):
        if (m.group(1).lower() in _CITY_DASH_OK
                and _postal_valid(m.group(2))):
            return m.group(2), 0.98
    # standalone 4-digit near the end, guarded against house/road/flat context
    n = len(text) or 1
    last = None
    for m in _FOUR_DIGIT.finditer(text):
        last = m
    if last and _postal_valid(last.group(1)):
        prefix = text[: last.start(1)]
        if _POSTAL_BAD_CTX.search(prefix):
            return None
        pos = last.start(1) / n
        if pos >= 0.8:
            return last.group(1), 0.85
        if pos >= 0.5:
            return last.group(1), 0.70
    return None


# ----------------------------------------------------------------- flat
_FLAT_PATTERNS = [
    (re.compile(r"\bFlat\s*(?:No\.?\s*)?-?\s*([A-Za-z0-9]+(?:-[A-Za-z0-9]+)?)\b", re.I), 0.90),
    (re.compile(r"\bApartment\s*-?\s*([A-Za-z0-9]+)\b", re.I), 0.85),
]


def extract_flat(text: str) -> Hit:
    for rx, conf in _FLAT_PATTERNS:
        m = rx.search(text)
        if m and m.group(1).lower() not in ("no", "number"):
            return m.group(1), conf
    return None


# ---------------------------------------------------------------- floor
_FLOOR_PATTERNS = [
    # "Lift N" outranks an ordinal floor in the reference corpus labels
    # ("7th Floor (Lift-6)" -> floor 6; floor_number_processor.py lift bank)
    (re.compile(r"\bLift\s*(?:No\.?\s*)?[-:]?\s*(\d+)\b", re.I), 0.92),
    (re.compile(r"\b(\d+)\s*(?:st|nd|rd|th)\s*Floor\b", re.I), 0.90),
    (re.compile(r"\bFloor\s*-?\s*([A-Za-z0-9]+)\b", re.I), 0.85),
    (re.compile(r"\bLevel\s*(?:No\.?\s*)?-?\s*(\d+)\b", re.I), 0.80),
]


def extract_floor(text: str) -> Hit:
    for rx, conf in _FLOOR_PATTERNS:
        m = rx.search(text)
        if m:
            return m.group(1), conf
    return None


# ---------------------------------------------------------------- block
_BLOCK_PATTERNS = [
    (re.compile(r"\bBlock\s*-?\s*([A-Za-z0-9]+)\b", re.I), 0.90),
    (re.compile(r"\bSector\s*-?\s*(\d+[A-Za-z]?)\b", re.I), 0.85),
    (re.compile(r"\b([A-Za-z0-9]{1,3})\s+Block\b", re.I), 0.80),
]


def extract_block(text: str) -> Hit:
    for rx, conf in _BLOCK_PATTERNS:
        m = rx.search(text)
        if m:
            return m.group(1), conf
    return None


REGEX_EXTRACTORS = {
    "house_number": extract_house,
    "road": extract_road,
    "area": extract_area,
    "district": extract_district,
    "division": extract_division,
    "postal_code": extract_postal,
    "flat_number": extract_flat,
    "floor_number": extract_floor,
    "block_number": extract_block,
}
