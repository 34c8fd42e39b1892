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

from .gazetteer import (AREAS, AREA_CORRECTIONS, AREA_VARIANTS,
                        DISTRICT_TO_DIVISION, DISTRICT_VARIANTS, DIVISIONS,
                        area_display)

Hit = Optional[Tuple[str, float]]

# Bangla letters survive normalization (only numerals/places/keywords are
# transliterated), and the labeled corpus keeps Bangla suffix letters in
# house ids ("126/সি", "216/2/গ") — suffix classes must accept them
_BN = "ঀ-৿"
_NUMTOK = rf"\d+(?:/[A-Za-z0-9{_BN}]+)?"

# ---------------------------------------------------------------- house
# NOTE: patterns run on NORMALIZED text — the normalizer rewrites `#`
# to " No " and `:` to " ", so the reference's `House# 12` / `H:51`
# forms arrive here as `House No 12` / `H 51` (one bank covers both).
_HOUSE_KW = r"(?:House|Home|Hous|Bari|Basa|Basha)"
# Banglish alphabet prefixes (`Kha-32/1`, `CHO 55/A`, `JA-10/1/A`; reference
# `house_number_processor.py:131-137`) — multi-letter forms only: the
# reference's single-letter `k/g` alternatives false-positive on initials
_BANGLISH = r"(?:kha|gha|jha|chha|cho|cha|ka|kh|ja|ga|ch|gh)"
# "House # 12" / "House No: 12" arrive as "House No 12" / "House No No 12"
_HNO = r"(?:(?:No|Number|Num)\.?\s*[-–]?\s*){0,2}"
_HNO1 = r"(?:(?:No|Number|Num)\.?\s*[-–]?\s*){1,2}"   # at least one No token
_HOUSE_PATTERNS = [
    # requires a No/Number token so ranges/combos below still win for
    # bare "House 8+9" / "House 60 Kha 7"
    (re.compile(rf"\b{_HOUSE_KW}\s*{_HNO1}[-–]?\s*({_NUMTOK}[A-Za-z]?)",
                re.I), 0.95),
    # letter-digit house ids after the keyword: "House No. B40", "House#F25"
    (re.compile(rf"\b{_HOUSE_KW}\s*{_HNO}[-–]?\s*"
                rf"([A-Za-z]{{1,2}}-?\d+(?:/[A-Za-z0-9]+)*)\b", re.I), 0.93),
    # "Holding No New: 97" keeps an adjective between No and the number
    (re.compile(rf"\bHolding\s*{_HNO}[-–]?\s*(?:New\s+)?"
                rf"([A-Za-z]{{0,2}}-?{_NUMTOK})", re.I), 0.92),
    (re.compile(rf"\b(?:Building|Bldg)\s*{_HNO}[\s-]*"
                rf"({_NUMTOK}[A-Za-z]?)\b", re.I), 0.92),
    (re.compile(rf"\bPlot\s*{_HNO}[\s-]*({_NUMTOK}[A-Za-z]?)\b",
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
    (re.compile(rf"\bH\s*{_HNO}[-–]?\s*({_NUMTOK}[A-Za-z]?)\b", re.I), 0.92),
    (re.compile(rf"\bH\s*{_HNO}([A-Z]{{1,3}}\s*\d+(?:/[A-Za-z0-9]+)*)\b",
                re.I), 0.92),
    (re.compile(rf"\bH\s*[@]\s*({_NUMTOK}[A-Za-z]?)\b", re.I), 0.88),
    (re.compile(rf"\bH\s*[-.]?\s*({_NUMTOK})\b", re.I), 0.85),
    # letter-valued: "House No. F/30", "House C/36", "House J57" (:194-205)
    (re.compile(rf"\b{_HOUSE_KW}\s*{_HNO}[-–]?\s*"
                rf"([A-Za-z]\s*/\s*\d+[A-Za-z]?)\b", re.I), 0.90),
    (re.compile(rf"\b{_HOUSE_KW}\s+([A-Za-z]-?\d+[A-Za-z]?)\b", re.I), 0.88),
    # reversed "12 no house" / "818 No. Building" / "21 Bhobon" (:228-231)
    (re.compile(rf"\b({_NUMTOK}[A-Za-z]?)\s+(?:No|Number)\.?\s+"
                rf"(?:House|Basa|Basha|Building|Bldg|Bhobon)\b", re.I), 0.90),
    (re.compile(rf"\b({_NUMTOK})\s+(?:Bhobon|Bhaban)\b", re.I), 0.85),
    # mahol/mahal household unit (:246)
    (re.compile(r"\b(?:Mahol|Mahal)\s*-?\s*(\d+[A-Za-z]?)\b", re.I), 0.85),
    # "12-Storey Govt Office Building" / "10-story Building" / "13-Tala
    # Building": the storey-count phrase IS the building's id in the
    # labeled corpus (reference standalone bank's N-storey forms)
    (re.compile(r"\b(\d{1,2}[-\s]?(?:storey|storied|story|tala))\b",
                re.I), 0.80),
    # villa-suffix letter compound: "Aziz Villa BA-A/3" (reference letter
    # bank's dash-slash form)
    (re.compile(r"\b([A-Za-z]{1,2}-[A-Za-z]\s*/\s*\d+[A-Za-z]?)\b"), 0.80),
    # leading single-letter marker: "U#19, Noorjahan Road" arrives as
    # "U No 19"; the whole marker phrase is the labeled value (H has its
    # own bank above that keeps only the number)
    (re.compile(r"^\s*([A-GI-Z]\s*No\.?\s*\d{1,4})\b", re.I), 0.84),
]
# required-literal prefilters for the keyword bank above, aligned by
# index: each gate is an any-of tuple of lowercase substrings PROVABLY
# required by its pattern (pattern can match => a gate literal is in the
# lowercased text), so a missing literal skips the regex search outright.
# None = always search. Profiled: regex search was 36% of kernel time,
# ~20 searches/string in this bank alone.
_HOUSE_KW_GATE = ("hous", "home", "bari", "bas")
_HOUSE_GATES = [
    _HOUSE_KW_GATE,                       # 0  house-kw + No token
    _HOUSE_KW_GATE,                       # 1  house-kw letter-digit
    ("holding",),                         # 2
    ("building", "bldg"),                 # 3
    ("plot",),                            # 4
    _HOUSE_KW_GATE,                       # 5  range 8+9
    _HOUSE_KW_GATE,                       # 6  range 98-99
    _HOUSE_KW_GATE,                       # 7  combo 60 Kha 7
    _HOUSE_KW_GATE,                       # 8  generic number
    None,                                 # 9  banglish prefix
    None, None, None, None,               # 10-13 single-letter H forms
    _HOUSE_KW_GATE,                       # 14 letter/digit
    _HOUSE_KW_GATE,                       # 15 letter-digit
    ("hous", "bas", "building", "bldg", "bhobon"),   # 16 reversed
    ("bh",),                              # 17 Bhobon/Bhaban
    ("mah",),                             # 18 Mahol/Mahal
    ("stor", "tala"),                     # 19 N-storey
    ("-",),                               # 20 villa dash compound
    ("no",),                              # 21 leading letter marker
]
assert len(_HOUSE_GATES) == len(_HOUSE_PATTERNS)
_HOUSE_BANK = [(rx, conf, gate) for (rx, conf), gate
               in zip(_HOUSE_PATTERNS, _HOUSE_GATES)]

# bare-number positionals — no keyword claims the value, so an extra
# left-context guard rejects numbers owned by road/flat/block/… (the
# reference applies its standalone bank only after keyword banks miss and
# vetoes context words, house_number_processor.py:253-281)
_HOUSE_COMPOUND = rf"\d{{1,4}}[A-Za-z]?(?:\s*[/-]\s*[A-Za-z0-9(){_BN}]{{1,4}}){{1,3}}"
# leading COMPOUND ("1152/C Greenhouse, House No 45" is labeled 1152/C in
# the reference corpus): outranks the keyword bank — tried ABOVE it
_HOUSE_LEAD_COMPOUND = re.compile(
    rf"^\s*({_HOUSE_COMPOUND})\s*[, ]")
# leading number-dash-NAME holding id, gated on a following building word
# ("125-Ramna Tower", "63-Dewan Bari")
_HOUSE_LEAD_DASHNAME = re.compile(
    r"^\s*(\d{1,3}-[A-Z][a-z]{3,})\s+"
    r"(?:Tower|Bari|Bhaban|Bhavan|Villa|Manjil|Mansion|Complex|Plaza)\b")
_HOUSE_POSITIONAL = [
    # leading positional: "105/A, Central Road ...", "25A Dilu Road"
    (re.compile(rf"^\s*(\d{{1,4}}[A-Za-z]?"
                rf"(?:\s*[/-]\s*[A-Za-z0-9{_BN}]{{1,4}}){{0,3}})"
                rf"\s+[A-Za-z{_BN}]"), 0.75),
    # segment-initial number before a word: ", 229 East Kazipara",
    # ", 73 Dilkhusa", ", 25-27 Kazi Nazrul Islam Avenue" (the reference
    # house bank's positional patterns, house_number_processor.py:760-860)
    (re.compile(rf"(?:^|,)\s*(\d{{1,4}}[A-Za-z]?"
                rf"(?:\s*[/-]\s*[A-Za-z0-9{_BN}]{{1,4}}){{0,3}})"
                rf"\s+[A-Za-z{_BN}]"), 0.74),
    # segment-initial compound, even at segment end: ", 865/1"
    (re.compile(rf"(?:^|,)\s*({_HOUSE_COMPOUND})\s*(?:[,(]|$)"), 0.73),
    # standalone compound "9/2(a)," / "345/3-5," / "27/A/1," before a comma
    (re.compile(rf"\b({_HOUSE_COMPOUND})\s*,"), 0.72),
    # trailing compound at end of string: "Ahmadbag 2nd len basabo
    # 135/3/A-1" (reference standalone bank applies at any position)
    (re.compile(rf"(?:^|[,\s])({_HOUSE_COMPOUND})\s*\.?\s*$"), 0.71),
    # leading bare token before a comma or parenthetical ("134, South
    # Kamalapur", "269 (Quick Sultan)"): weakest — short letter-suffixed
    # leaders ("7B,") are usually flat ids
    (re.compile(r"^\s*(\d{1,4}[A-Za-z]?)\s*[,(]"), 0.70),
    # leading bare number right before a digit compound ("215 2/3 Abedin
    # Kibria House" is labeled 215 in the reference corpus)
    (re.compile(r"^\s*(\d{1,4})\s+\d{1,4}\s*/"), 0.70),
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
    # guard: phone-shaped (>5 digits in ONE run) can never be a house;
    # compounds/ranges like "1803/2115" or "370-371" total more than 5
    # digits but every run is short
    if max((len(r) for r in re.findall(r"\d+", val)), default=0) > 5:
        return False
    # guard: a bare 4-digit token in the trailing third is postal-shaped
    # (reference guard `_is_postal_code`, house_number_processor.py:447)
    if _POSTAL_SHAPE.match(val) and m.start(1) > 0.66 * n:
        return False
    if _ROAD_GOLI_AFTER.match(text[m.end(1):]):
        return False
    # "60 Feet ..." names a road width, never a house (reference feet-road
    # form, road_processor.py; the house bank must not eat its number)
    if re.match(r"\s*feet\b", text[m.end(1):], re.I):
        return False
    return True


def extract_house(text: str) -> Hit:
    n = len(text) or 1
    # leading "125-Ramna Tower" / "63-Dewan Bari": number-dash-name is the
    # holding id when a building word follows (labeled corpus keeps the
    # dash-name, not just the number)
    m = _HOUSE_LEAD_DASHNAME.match(text)
    if m:
        return m.group(1), 0.90
    # leading slash/dash compound outranks the keyword bank (reference
    # corpus labels "1152/C Greenhouse, House# 45" as 1152/C)
    m = _HOUSE_LEAD_COMPOUND.search(text)
    if m and _house_guards_ok(text, m, m.group(1), n):
        # ...unless the lead is a short single-digit id ("9-C,") AND an
        # explicit House-with-No token follows ("House No 390/A"): the
        # reference corpus labels the explicit form then
        lead = m.group(1)
        if len(re.match(r"\d+", lead).group(0)) == 1:
            me = _HOUSE_PATTERNS[0][0].search(text)
            if me and _house_guards_ok(text, me, me.group(1), n):
                return me.group(1), _HOUSE_PATTERNS[0][1]
        return lead, 0.92
    low = text.lower()
    for rx, conf, gate in _HOUSE_BANK:
        if gate is not None and not any(g in low for g in gate):
            continue
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
        # the institutional skip applies only to the standalone bank
        # (reference house_number_processor.py:612-700) — an explicit
        # keyword form like "School, 21 Bhobon" keeps the number, and a
        # slash/dash compound ("Masjid, 5/1/H") is a holding id, not the
        # institution's unit number
        if ("/" not in val and "-" not in val
                and _INSTITUTION_BEFORE.search(text[: m.start(1)][-30:])):
            continue
        if _house_guards_ok(text, m, val, n):
            return val, conf
    # last resort: a feet-road width number becomes the house id when NO
    # other candidate exists ("Madani Avenue, 100 Feet Road" -> house 100
    # in the labeled corpus; with any competing candidate the feet number
    # stays with the road, which is why _house_guards_ok vetoes it above)
    if "feet" in low:
        m = re.search(r"\b(\d{1,3})\s*(?:ty)?\s*feet\b", text, re.I)
        if m:
            return m.group(1), 0.70
    return None


# ----------------------------------------------------------------- road
# Bangla road forms (`রোড/লেন/গলি`, reference road_processor.py) arrive
# post-normalization as Road/Lane/Lane, so the Latin bank covers them; Goli
# appears verbatim when written in Latin script ("Nasir Goli").
#
# Priority order reconstructed from the reference's labeled corpus: lanes
# beat roads ("Road 1, Lane 2" -> Lane 2), avenues beat roads ("Road 12,
# Avenue 6" -> Avenue 6); between road forms the EXPLICIT numbered marker
# beats a named segment when both appear ("House 100, Road No. 8, O R
# Nizam Road" is labeled Road No. 8 — corpus prefers the marker 7:2), and
# a named segment beats the residual numbered forms otherwise.
_ROAD_NO = r"(?:(?:No|Number|Num)\.?\s*[-–]?\s*){0,2}"
_LANE_NUM = re.compile(rf"\bLane\s*{_ROAD_NO}[-–]?\s*(\d+[A-Za-z]?)\b", re.I)
_LANE_ORD = re.compile(r"\b(\d+(?:st|nd|rd|th)\s+(?:Lane|Len))\b", re.I)
_AVE_NUM = re.compile(rf"\bAvenue\s*{_ROAD_NO}[-–]?\s*(\d+)\b", re.I)
_ROAD_NUM = [
    (re.compile(rf"\b(?:Road|Rd)\s*{_ROAD_NO}[-–]?\s*"
                r"([A-Za-z]?\d+(?:/[A-Za-z0-9]+)?[A-Za-z]?)", re.I), 0.95),
    # "2 No Road" — the road-goli form the house guard rejects
    (re.compile(r"\b(\d+)\s*No\.?\s+(?:Road|Goli|Lane)\b", re.I), 0.90),
    # "Line #16" arrives as "Line No 16"; "Line-16" (road_processor.py:149-150)
    (re.compile(rf"\bLine\s*{_ROAD_NO}[-–]?\s*(\d+[A-Za-z]?)\b", re.I), 0.88),
    # "R # 9" / "R-9" / "R. 9" arrive as "R No 9" / "R-9" / "R. 9"
    (re.compile(rf"\bR\s*{_ROAD_NO}[-.]?\s*(\d+[A-Za-z]?)\b", re.I), 0.80),
]
_NAMED_TAIL = re.compile(
    r"\b(?:Road|Rd|Lane|Line|Avenue|Street|Goli|Sarani|Sarak|Shoroni|"
    r"Sharani|Sarani|Soroni)\b\.?\s*$", re.I)
_SEG_PAREN = re.compile(r"\s*\([^)]*\)\s*$")
_FEET_ROAD = re.compile(r"\b(\d+\s*feet\s*road)\b", re.I)
# bare "60 Feet" names a road in Dhaka usage (reference road bank :184)
_FEET_BARE = re.compile(r"\b(\d+\s*feet)\b", re.I)
# mid-segment named road: "South Fuller Road Residential Area" -> capture
# "South Fuller Road" (reference allows \s in the lookahead, :175-176)
_NAMED_ROAD_MID = re.compile(
    r"\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+){0,3}\s+(?:Road|Lane|Avenue|Rd))\b")
_NAMED_GOLI_MID = re.compile(
    r"\b((?:\d+\s+)?[A-Za-z]+(?:\s+[A-Za-z]+){0,3}\s+Goli)\b", re.I)
# a named-road segment must not be a different field's phrase, and
# "2 No Road" is the numbered road-goli form, not a named road
_NAMED_VETO = re.compile(
    r"\b(?:House|Flat|Block|Floor|Sector|Plot|Holding|Post|feet|No|Number)"
    r"\b", re.I)
# last-resort unicode named forms (round-4 miss taxonomy): Bangla-script
# or lowercase road names the ASCII-cased mid pattern cannot see —
# "বনশ্রি Road", "shohid Faruq road", "(লাংগলের Lane)" — plus the numbered
# named-lane form "১১ নং শিরিশ দাস লেন" -> "11 No শিরিশ দাস Lane"
_NAMED_NO_LANE = re.compile(
    r"\b(\d+\s*No\.?(?:\s+[^\s,()]+){1,3}\s+(?:Lane|Road))\b", re.I)
_NAMED_ROAD_ANY = re.compile(
    r"((?:[^\s,()]+\s+){1,3}(?:Road|Lane|Avenue|Street))\b", re.I)


def _named_segments(text: str, kinds) -> Optional[str]:
    """First comma-segment (trailing parenthetical stripped) ending in one
    of the given keywords; the reference's named-road bank. A segment that
    IS a gazetteer area name ("Elephant Road", "Green Road" — Dhaka
    neighborhoods named after their road) is the AREA, not the road:
    treating it as the road would overwrite the discriminating road number
    ("Road 1" vs "Road 6") for every entity in that neighborhood."""
    for seg in text.split(","):
        seg = _SEG_PAREN.sub("", seg.strip()).strip()
        m = _NAMED_TAIL.search(seg)
        if (seg and m and len(seg) <= 48
                and m.group(0).strip().rstrip(".").lower() in kinds
                and not _NAMED_VETO.search(seg[:m.start()])):
            low = seg.lower()
            if low in AREAS or AREA_VARIANTS.get(low) in AREAS:
                continue
            return seg
    return None


def extract_road(text: str) -> Hit:
    # literal prefilters throughout: every form below requires one of a
    # few keyword literals (lane/road/avenue/...), so a lowercase substring
    # probe skips the regex search when the keyword is absent (profiled:
    # ~9 searches/string in this bank before gating)
    low = text.lower()
    has_lane = "lane" in low or "len" in low
    has_road = "road" in low or "rd" in low
    has_ave = "avenue" in low
    # 1. lanes (ordinal, named, numbered)
    if has_lane:
        m = _LANE_ORD.search(text)
        if m:
            return m.group(1), 0.90
        named = _named_segments(text, {"lane", "len"})
        if named:
            return named, 0.90
        m = _LANE_NUM.search(text)
        if m and m.group(1).lower() not in _FLAT_STOP_ROAD:
            return m.group(1), 0.88
    # 2. avenues (numbered, named)
    if has_ave:
        m = _AVE_NUM.search(text)
        if m:
            return m.group(1), 0.88
        named = _named_segments(text, {"avenue"})
        if named:
            return named, 0.87
    # 3. explicit numbered marker BEFORE named segments: when both
    # "Road No. 8" and a named road ("O R Nizam Road") appear, the
    # marker is the addressee's road and the name is the through-road
    # (labeled corpus prefers the marker 7:2)
    if has_road:
        m = _ROAD_NUM[0][0].search(text)
        if m and m.group(1).lower() not in _FLAT_STOP_ROAD:
            return m.group(1), _ROAD_NUM[0][1]
    # 4. named road segment ("Nuria Madrasha Road", "Mirpur Rd")
    if has_road or any(k in low for k in ("sarani", "sarak", "shoroni",
                                          "sharani", "soroni")):
        named = _named_segments(text, {"road", "rd", "sarani", "sarak",
                                       "shoroni", "sharani", "soroni"})
        if named:
            return named, 0.86
    # 5. remaining numbered road forms
    if has_road or has_lane or "goli" in low:
        m = _ROAD_NUM[1][0].search(text)
        if m and m.group(1).lower() not in _FLAT_STOP_ROAD:
            return m.group(1), _ROAD_NUM[1][1]
    if "line" in low:
        m = _ROAD_NUM[2][0].search(text)
        if m and m.group(1).lower() not in _FLAT_STOP_ROAD:
            return m.group(1), _ROAD_NUM[2][1]
    m = _ROAD_NUM[3][0].search(text)
    if m and m.group(1).lower() not in _FLAT_STOP_ROAD:
        return m.group(1), _ROAD_NUM[3][1]
    if "feet" in low:
        m = _FEET_ROAD.search(text)
        if m:
            return m.group(1), 0.90
    # 5. goli / street / mid-string named forms
    if "goli" in low or "street" in low or "line" in low:
        named = _named_segments(text, {"goli", "street", "line"})
        if named:
            return named, 0.84
    if "goli" in low:
        m = _NAMED_GOLI_MID.search(text)
        if m:
            return m.group(1), 0.82
    if has_road or has_lane or has_ave:
        m = _NAMED_ROAD_MID.search(text)
        if m:
            return m.group(1), 0.80
    if "feet" in low:
        m = _FEET_BARE.search(text)
        if m:
            return m.group(1), 0.78
    # last-resort unicode/lowercase named forms (see pattern bank notes)
    if has_lane or has_road:
        m = _NAMED_NO_LANE.search(text)
        if m:
            return m.group(1), 0.76
    m = _NAMED_ROAD_ANY.search(text) \
        if (has_road or has_lane or has_ave or "street" in low) else None
    if m:
        val = m.group(1).strip()
        prefix = val.rsplit(" ", 1)[0]
        low = val.lower()
        if (not _NAMED_VETO.search(prefix)
                and low not in AREAS
                and AREA_VARIANTS.get(low) not in AREAS):
            return val, 0.74
    return None


_FLAT_STOP_ROAD = {"no", "number", "num"}


# ----------------------------------------------------------------- area
# Candidate collection + multi-factor scoring — a curated re-expression of
# the reference's "intelligent area extraction" (area_processor.py:729-1118):
# known-vocab scan with before-city boost, landmark-phrase penalty,
# directional-prefix bonus, plus the contextual banks (Thana X, X Sadar,
# X Residential Area, unknown-segment-before-city). The SURFACE spelling is
# returned (the reference's contextual patterns capture raw text; its
# labeled corpus uses surface spellings) — canonicalization for
# blocking/enrichment happens via gazetteer.canonical_area.
_AREA_ALL = sorted(set(AREAS) | set(AREA_VARIANTS)
                   - {"cantt", "cant"},       # see _CANTT_RE: bare "cant"
                   key=len, reverse=True)     # is the English word
# reference regex form, kept as the ORACLE for the token-scan twin below
# (tests assert span equality); the scan is what runs in the hot path —
# a 170-way alternation costs ~0.1 ms/string in Python re, the token scan
# is two dict probes per word
_AREA_RE = re.compile(
    r"(?<![A-Za-z])("
    + "|".join(re.escape(a) for a in _AREA_ALL)
    + r")(?![A-Za-z])", re.I)
_AREA_WORD1 = {k for k in _AREA_ALL if " " not in k}
_AREA_WORD2 = {tuple(k.split(" ")) for k in _AREA_ALL if k.count(" ") == 1}
_AREA_WORD3 = {tuple(k.split(" ")) for k in _AREA_ALL if k.count(" ") == 2}
# first-word gates: skip the tuple build unless this word can start a
# multi-word name (same trick as geo.scan_address's first-word set)
_AREA_FIRST2 = {t[0] for t in _AREA_WORD2}
_AREA_FIRST3 = {t[0] for t in _AREA_WORD3}
_TOKEN_SPAN_RE = re.compile(r"[A-Za-z]+")


def _area_matches(text: str):
    """(start, end, surface) spans, element-equal to _AREA_RE.finditer:
    token-aligned (the regex boundaries are letter lookarounds), two-word
    names win over their one-word prefix at the same start (the regex
    alternation is longest-first), non-overlapping."""
    toks = [(m.start(), m.end(), m.group(0).lower())
            for m in _TOKEN_SPAN_RE.finditer(text)]
    out = []
    i = 0
    n = len(toks)
    while i < n:
        s1, e1, w1 = toks[i]
        if i + 2 < n and w1 in _AREA_FIRST3:
            s2, e2, w2 = toks[i + 1]
            s3, e3, w3 = toks[i + 2]
            if ((w1, w2, w3) in _AREA_WORD3 and text[e1:s2] == " "
                    and text[e2:s3] == " "):
                out.append((s1, e3, text[s1:e3]))
                i += 3
                continue
        if i + 1 < n and w1 in _AREA_FIRST2:
            s2, e2, w2 = toks[i + 1]
            if (w1, w2) in _AREA_WORD2 and text[e1:s2] == " ":
                out.append((s1, e2, text[s1:e2]))
                i += 2
                continue
        if w1 in _AREA_WORD1:
            out.append((s1, e1, text[s1:e1]))
        i += 1
    return out
_LANDMARK_RE = re.compile(
    r"\b(?:opposite|opp|near|nearby|beside|behind|adjacent|in front of|"
    r"next to|close to|after|before)\b", re.I)
_AREA_NUM_AFTER = re.compile(r"\s*(?:Sector\s+)?-?\s?\d{1,2}(?!\d)")
_DIR_BEFORE_RE = re.compile(
    r"\b(?:north|south|east|west|middle|uttar|dakshin|purbo|paschim|"
    r"moddho|uttor|dokkhin)\s*$", re.I)
# "Thana: Gandaria" / "P.S. Double Mooring": the name after the marker is
# the police precinct, an administrative tag — the labeled area is usually
# a DIFFERENT segment (the reference's exclusion predicates demote
# administrative context, area_processor.py:1040-1080)
_THANA_BEFORE_RE = re.compile(
    r"\b(?:thana|p\.?s\.?|police\s+station)\s*[:.\-]?\s*$", re.I)
_THANA_RE = re.compile(
    r"\b(?:Thana|PS|P\.S\.)\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+){0,2})\b|"
    r"\b([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+){0,2}\s+Thana)\b")
_RESA_RE = re.compile(
    r"\b([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+){0,2})\s+"
    r"(?:Residential\s+Area|R/A)\b")
_GRAM_RE = re.compile(
    r"\b(?:Gram|Village)\s+([A-Z][A-Za-z]+(?:\s+[A-Z][A-Za-z]+){0,2})\b",
    re.I)
_OLD_DHAKA_RE = re.compile(r"\b((?:Old|Puran|Poran)\s+Dhaka)\b", re.I)
_SEG_TRAIL_NUM = re.compile(r"[\s–-]*\d{1,4}\s*$")
_UNKNOWN_SEG = re.compile(r"^[A-Za-z]+(?:\s+[A-Za-z]+){0,2}$")
_UNKNOWN_VETO = re.compile(
    r"\b(?:tower|building|bldg|bazar|bazaar|market|hospital|school|college|"
    r"university|road|rd|lane|goli|avenue|street|store|mosque|masjid|"
    r"mosjid|moshjid|complex|plaza|center|centre|hotel|house|home|villa|"
    r"mansion|garden|park|gate|station|bank|office|hall|club|field|math|"
    r"mor|more|point|side|quarter|quarters|tola|railgate|signal|"
    r"bangladesh|sadar|thana|cantonment|cantt|cant|division|district|"
    r"no|number|ward|union|post|floor|level|block|sector|flat|city)\b",
    re.I)
# the reference's main_area_names / common_areas get a ranking bonus
# (area_processor.py:335+, intelligent_score Factor 1)
_MAIN_AREAS = {
    "uttara", "dhanmondi", "gulshan", "banani", "rampura", "khilgaon",
    "mirpur", "mohammadpur", "tejgaon", "motijheel", "farmgate", "shyamoli",
    "adabor", "mohakhali", "baridhara", "banasree", "meradia", "shantinagar",
    "wari", "lalbagh", "azimpur", "bashabo", "jatrabari", "demra",
    "hazaribagh", "badda", "khilkhet", "bashundhara", "nikunja", "agrabad",
    "halishahar", "panchlaish", "katalgonj", "nasirabad", "chawkbazar",
    "ambarkhana", "zindabazar", "sapura", "sonadanga", "fatullah",
    "siddhirganj", "kochukhet", "sitakunda", "pahartali",
}
# tail after a candidate that still leaves it "in the last segment":
# parentheticals, punctuation, digits, a trailing "Bangladesh"
_TAIL_PAREN = re.compile(r"\([^)]*\)")
_TAIL_END = re.compile(r"^[\s\d,.()/\-]*(?:bangladesh)?[\s\d,.()/\-]*$",
                       re.I)


def _area_title(s: str) -> str:
    return " ".join(w.capitalize() for w in s.split())


def _city_suffix_tokens():
    # built lazily: _DISTRICT_DISPLAY is defined later in the module
    toks = set(_DISTRICT_DISPLAY) | {d.lower() for d in DIVISIONS} \
        | {"chittagong", "ctg", "chottogram"}
    return sorted(toks, key=len, reverse=True)


_CITY_AFTER_RE = None       # compiled on first use (needs _DISTRICT_DISPLAY)
_CANTT_RE = None
_CITY_SEG_RE = None


def _ensure_city_res():
    global _CITY_AFTER_RE, _CANTT_RE, _CITY_SEG_RE
    if _CITY_AFTER_RE is not None:
        return
    city_alt = "|".join(re.escape(t) for t in _city_suffix_tokens())
    # "Mirpur 1, Dhaka-1216": optional small numeric suffix, separators,
    # then a district/division name — the reference's massive
    # before-city-immediate boost (area_processor.py:786-796)
    # a short parenthetical between the area and the city does not break
    # the adjacency ("Lalkhan Bazar (Opposite ...), Chattogram"); "Dhaka
    # Sena Nibas" is the cantonment, not the city terminator
    _CITY_AFTER_RE = re.compile(
        rf"^(?:\s*-?\s*\d{{1,2}})?\s*[,.]?\s*"
        rf"(?:\([^()]{{0,60}}\)\s*[,.]?\s*)?\(?\s*(?:{city_alt})"
        rf"(?![A-Za-z])(?!\s+Sena\b)", re.I)
    _CANTT_RE = re.compile(
        rf"\b((?:{city_alt})\s+Cant(?:t|onment)?)\b", re.I)
    # a whole comma-segment that IS a city (optionally with postal suffix)
    _CITY_SEG_RE = re.compile(rf"^(?:{city_alt})(?![A-Za-z])", re.I)


def extract_area(text: str) -> Hit:
    _ensure_city_res()
    n = len(text) or 1
    cands = []          # (score, position, surface)

    for m_start, m_end, m_text in _area_matches(text):
        key = m_text.lower()
        canon = AREA_VARIANTS.get(key, key)
        # spacing/dash variants and the reference's typo-correction list
        # render as the canonical display ("Aftabnagar" -> "Aftab Nagar",
        # "gulisthan" -> "Gulshan", gazetteer.py:321-350); other spelling
        # variants keep the surface form, like the reference's contextual
        # capture (area_processor.py:900-960)
        if canon != key and (key in AREA_CORRECTIONS
                             or key.replace(" ", "").replace("-", "")
                             == canon.replace(" ", "").replace("-", "")):
            surface = area_display(canon)
        else:
            surface = _area_title(m_text)
        s = 0.62
        if canon in _MAIN_AREAS:
            s += 0.07
        seg_start = text.rfind(",", 0, m_start) + 1
        if _LANDMARK_RE.search(text[seg_start:m_start]):
            s -= 0.40
        if _CITY_AFTER_RE.match(text[m_end:m_end + 30]):
            s += 0.35
        tail = _TAIL_PAREN.sub("", text[m_end:])
        if _TAIL_END.match(tail):
            s += 0.10          # last-segment position (end_position boost)
        if m_start / n >= 0.5:
            s += 0.05
        if _DIR_BEFORE_RE.search(text[max(0, m_start - 10):m_start]):
            s += 0.08
        if _THANA_BEFORE_RE.search(text[max(0, m_start - 18):m_start]):
            s -= 0.45          # administrative precinct tag, not the area
            # (outweighs the before-city boost: "Thana: Khulshi,
            # Chattogram" names the precinct, the area sits elsewhere)
        if _AREA_NUM_AFTER.match(text[m_end:m_end + 12]):
            s += 0.08          # "Mirpur 10" / "Uttara Sector 12" (Factor 5)
        cands.append((s, m_start, surface))

    # literal prefilters for the contextual banks (see _HOUSE_GATES note):
    # each gate literal is required by its pattern, probe once on the
    # lowercased text instead of running the search
    low = text.lower()
    m = _CANTT_RE.search(text) if "cant" in low else None
    if m:
        # "<City> Cantonment" is a thana-level locality; the labeled corpus
        # prefers it over sub-localities even when those sit before the
        # city token — outrank the known-vocab + before-city ceiling
        cands.append((1.15, m.start(1), _area_title(m.group(1))))
    if "old" in low or "puran" in low or "poran" in low:
        m = _OLD_DHAKA_RE.search(text)
        if m:
            cands.append((0.90, m.start(1), _area_title(m.group(1))))
    # gate literals: "Thana ..."/"... Thana" -> "thana"; "PS X" -> "ps";
    # "P.S. X" -> "p.s" (NOT "ps" — the dot breaks the substring)
    m = _THANA_RE.search(text) \
        if ("thana" in low or "ps" in low or "p.s" in low) else None
    if m:
        g = m.group(1) or m.group(2)
        if not _UNKNOWN_VETO.search(re.sub(r"\bthana\b", "", g, flags=re.I)):
            # "Thana X" (marker first) names the precinct — keep it only as
            # a floor BELOW the gazetteer base so any known area elsewhere
            # in the string outranks it; "X Thana" (name first) is the
            # locality usage and keeps the stronger score
            s_thana = 0.60 if m.group(1) else 0.66
            cands.append((s_thana, m.start(), _area_title(g)))
    m = _RESA_RE.search(text) \
        if ("residential" in low or "r/a" in low) else None
    if m and not _UNKNOWN_VETO.search(m.group(1)):
        cands.append((0.66, m.start(1), _area_title(m.group(1))))
    m = _GRAM_RE.search(text) \
        if ("gram" in low or "village" in low) else None
    if m and not _UNKNOWN_VETO.search(m.group(1)):
        cands.append((0.64, m.start(1), _area_title(m.group(1))))
    # "<District> Sadar" used as the locality name
    if "sadar" in low:
        for dm in _SADAR_RE.finditer(text):
            cands.append((0.85, dm.start(1), _area_title(dm.group(1))))

    # unknown comma-segment immediately before the city segment
    segs = text.split(",")
    off = 0
    offsets = []
    for seg in segs:
        offsets.append(off)
        off += len(seg) + 1
    for i in range(1, len(segs)):
        seg = segs[i].strip()
        if not _CITY_SEG_RE.match(_SEG_TRAIL_NUM.sub("", seg).strip()):
            continue
        j = i - 1
        while j >= 0 and not segs[j].strip():
            j -= 1
        if j < 0:
            continue
        prev = _SEG_TRAIL_NUM.sub("", segs[j].strip()).strip()
        if (_UNKNOWN_SEG.match(prev) and 4 <= len(prev) <= 28
                and not _UNKNOWN_VETO.search(prev)
                and not _CITY_SEG_RE.match(prev)):
            # below the known-vocab base: a known area anywhere outranks
            # an unknown segment, even one right before the city
            cands.append((0.58, offsets[j], _area_title(prev)))
        break

    if not cands or max(c[0] for c in cands) < 0.45:
        # reference last resort: the intelligent score picks the best
        # remaining comma-segment as the area when every bank missed
        # (area_processor.py:965-1118); its dominant factor is position —
        # later segments win — with structural/institution vetoes
        for i in range(len(segs) - 1, -1, -1):
            seg = _TAIL_PAREN.sub("", segs[i]).strip(" .-–")
            if not (5 <= len(seg) <= 34):
                continue
            if not re.fullmatch(r"[A-Za-z]+(?:\s+[A-Za-z]+){0,4}", seg):
                continue
            # proper-noun gate: place names carry a capital; an all-
            # lowercase segment is conversational filler, not a locality
            # (keeps the fallback silent on non-address turns)
            if not re.search(r"\b[A-Z]", seg):
                continue
            if _FALLBACK_VETO.search(seg) or _CITY_SEG_RE.match(seg):
                continue
            return _area_title(seg), 0.66
        return None
    s, _pos, surface = max(cands, key=lambda c: (round(c[0], 3), c[1],
                                                 len(c[2])))
    if s < 0.45:
        return None
    return surface, max(0.66, min(0.95, s))


_SADAR_RE = None            # compiled after the district section below
# vetoes for the last-resort segment fallback: structural tokens and
# institutions that never name a locality on their own (tower/homes/stadium
# stay allowed — the labeled corpus keeps those as the area when they are
# the only remaining segment)
_FALLBACK_VETO = re.compile(
    r"\b(?:mosque|masjid|mosjid|moshjid|road|rd|lane|goli|avenue|street|"
    r"floor|flat|block|sector|house|basa|hospital|school|madrasa|college|"
    r"university|bank|market|bazar|bazaar|thana|upazila|union|district|"
    r"division|post|ward|no|number|bangladesh|near|beside|opposite|side|"
    r"lift|level)\b", re.I)


# ------------------------------------------------------------- district
# canonical display per surface key: DISTRICT_TO_DIVISION keys title-cased,
# overridden by the reference's variant list (DISTRICT_VARIANTS: Cumilla ->
# Comilla, Bogura -> Bogra, CoxsBazar, Bangla names, ...) — the reference
# CANONICALIZES districts (district_processor.py:148-159 + english_cities
# variants) even though it preserves area surface forms.
_DISTRICT_DISPLAY = {d: d.title() for d in DISTRICT_TO_DIVISION}
_DISTRICT_DISPLAY.update({
    "cumilla": "Comilla", "bogura": "Bogra",
    "cox's bazar": "CoxsBazar", "coxs bazar": "CoxsBazar",
    "coxsbazar": "CoxsBazar",
})
_DISTRICT_DISPLAY.update(DISTRICT_VARIANTS)
_DISTRICTS = sorted(_DISTRICT_DISPLAY, key=len, reverse=True)
_DISTRICT_EXPLICIT = re.compile(
    r"\b(?:District|Dist|জেলা)\.?\s*[-–]?\s*([A-Za-zঀ-৿' ]+?)\b",
    re.I)
_DISTRICT_RE = re.compile(
    r"(?<![A-Za-zঀ-৿])("
    + "|".join(re.escape(d) for d in _DISTRICTS)
    + r")(?![A-Za-zঀ-৿])", re.I
)
# "<District> Sadar" used as a locality/area name ("Faridpur Sadar",
# "Khulna Sadar") — consumed by extract_area above
_SADAR_RE = re.compile(
    r"\b((?:" + "|".join(re.escape(d) for d in _DISTRICTS if d.isascii())
    + r")\s+Sadar)\b", re.I)


def inline_gate_table():
    """Gate contract for the road/area inline literal prefilters: every
    (pattern, gate-literals) pair where the extractor skips the regex
    search unless one literal occurs in the lowercased text. The
    invariant test (tests/test_kernel.py) asserts pattern-match =>
    gate-pass over the reference corpus plus adversarial synthetics, so
    a wrong gate cannot silently disable a form (the round-4 "P.S."
    gap, ADVICE r4: 'p.s.' contains no 'ps' substring). Keep this table
    in sync with the ``in low`` conditions in extract_road/extract_area."""
    _ensure_city_res()
    return [
        # extract_road
        (_LANE_ORD, ("lane", "len")),
        (_LANE_NUM, ("lane", "len")),
        (_AVE_NUM, ("avenue",)),
        (_ROAD_NUM[0][0], ("road", "rd")),
        (_ROAD_NUM[1][0], ("road", "rd", "lane", "len", "goli")),
        (_ROAD_NUM[2][0], ("line",)),
        (_FEET_ROAD, ("feet",)),
        (_FEET_BARE, ("feet",)),
        (_NAMED_GOLI_MID, ("goli",)),
        (_NAMED_ROAD_MID, ("road", "rd", "lane", "len", "avenue")),
        (_NAMED_NO_LANE, ("lane", "len", "road", "rd")),
        (_NAMED_ROAD_ANY, ("road", "rd", "lane", "len", "avenue",
                           "street")),
        # extract_area
        (_CANTT_RE, ("cant",)),
        (_OLD_DHAKA_RE, ("old", "puran", "poran")),
        (_THANA_RE, ("thana", "ps", "p.s")),
        (_RESA_RE, ("residential", "r/a")),
        (_GRAM_RE, ("gram", "village")),
        (_SADAR_RE, ("sadar",)),
    ]


def extract_district(text: str) -> Hit:
    m = _DISTRICT_EXPLICIT.search(text)
    if m:
        cand = m.group(1).strip().lower()
        if cand in _DISTRICT_DISPLAY:
            return _DISTRICT_DISPLAY[cand], 0.95
        cand2 = m.group(1).strip()
        if cand2 in _DISTRICT_DISPLAY:          # Bangla keys are case-exact
            return _DISTRICT_DISPLAY[cand2], 0.95
    # last mention wins: districts come at the tail of Bangladeshi addresses
    last = None
    for m in _DISTRICT_RE.finditer(text):
        last = m
    if last:
        k = last.group(1).lower()
        return _DISTRICT_DISPLAY.get(k, _DISTRICT_DISPLAY.get(
            last.group(1), k.title())), 0.90
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
        # mid-string ", 6207, Rajshahi": a 4-digit immediately followed by
        # a district name is the city-postal-city sandwich — strong enough
        # to clear the 0.80 postal threshold (reference area-postal form)
        after = text[last.end(1):].lstrip(" ,").lower()
        if pos >= 0.4 and any(
                after.startswith(d) for d in DISTRICT_TO_DIVISION):
            return last.group(1), 0.85
        # city-space-postal mid-string ("..., Dhaka 1204, Civil Chowdhury
        # Vila"): a 4-digit immediately PRECEDED by a district name is the
        # reference's city-postal form (postal_code_processor.py city bank)
        before = prefix.rstrip(" ,-–").lower()
        if pos >= 0.3 and any(
                before.endswith(d) for d in DISTRICT_TO_DIVISION):
            return last.group(1), 0.85
        # postal followed by a known upazila then its district ("CUET-4349,
        # Raozan, Chattogram") — the geo sandwich still holds
        from .geo import UPAZILAS
        if pos >= 0.25 and any(
                after.startswith(u) for u in UPAZILAS):
            return last.group(1), 0.82
        if pos >= 0.5:
            return last.group(1), 0.70
    return None


# ----------------------------------------------------------------- flat
# `#` arrives as " No " post-normalization, and "Flat No # 1/A" therefore as
# "Flat No No 1/A": allow up to two No/Number tokens before the value
# (reference flat bank's `#`/`No` forms, flat_number_processor.py).
_NO_TOK = r"(?:(?:No|Number|Num|Nong)\.?\s*[-–]?\s*){0,2}"
_FLAT_VAL = r"([A-Za-z0-9]+(?:[-/][A-Za-z0-9]+)*)"
_FLAT_PATTERNS = [
    (re.compile(rf"\bFlat\s*{_NO_TOK}[-–]?\s*{_FLAT_VAL}", re.I), 0.90),
    (re.compile(rf"\b(?:Apartment|Apt)\.?\s*{_NO_TOK}[-–]?\s*{_FLAT_VAL}",
                re.I), 0.88),
    (re.compile(rf"\b(?:Unit|Suite)\s*{_NO_TOK}[-–]?\s*{_FLAT_VAL}",
                re.I), 0.85),
    # "6th Floor, 6B" / "3rd Floor, 29 No Shop": the short alnum token
    # right after a floor segment is the flat/unit id (reference flat
    # bank's positional forms, flat_number_processor.py:617-930)
    (re.compile(r"\b(?:Floor|Level)\s*,\s*([A-Za-z]?\d{1,3}[A-Za-z]?)"
                r"\s*(?:[,.(]|$|\bNo\b)", re.I), 0.75),
    # parenthesized unit letter-digit right after the house compound:
    # "House No. 586/1 (D1)" (reference flat bank's parenthetical form)
    (re.compile(r"\d(?:/[A-Za-z0-9]+)*\s*\(\s*([A-Za-z]\d{1,2})\s*\)"),
     0.72),
]
_FLAT_STOP = {"no", "number", "num", "name", "nong"}
# required-literal prefilters, aligned with _FLAT_PATTERNS (see the house
# bank's _HOUSE_GATES note)
_FLAT_GATES = [("flat",), ("apartment", "apt"), ("unit", "suite"),
               ("floor", "level"), ("(",)]
assert len(_FLAT_GATES) == len(_FLAT_PATTERNS)


def extract_flat(text: str) -> Hit:
    low = text.lower()
    for (rx, conf), gate in zip(_FLAT_PATTERNS, _FLAT_GATES):
        if not any(g in low for g in gate):
            continue
        m = rx.search(text)
        if m and m.group(1).lower() not in _FLAT_STOP:
            return m.group(1), conf
    return None


# ---------------------------------------------------------------- floor
_FLOOR_PATTERNS = [
    # "Lift N" outranks an ordinal floor in the reference corpus labels
    # ("7th Floor (Lift-6)" -> floor 6; floor_number_processor.py lift bank)
    (re.compile(rf"\bLift\s*{_NO_TOK}[-:]?\s*(\d+)\b", re.I), 0.92),
    # Bangla ordinal suffixes (৩য়/৪র্থ/৫ম) survive normalization as a
    # Bangla letter glued to the ASCII digit ("5ম Floor"); the reference
    # floor bank's Bangla forms (floor_number_processor.py bangla patterns)
    (re.compile(r"\b(\d+(?:/[A-Za-z0-9])?)\s*(?:st|nd|rd|th|ম|য়|র্থ|ষ্ঠ)?"
                r"\s*Floor(?![A-Za-z])", re.I), 0.90),
    (re.compile(rf"\bFloor\s*{_NO_TOK}[-–]?\s*([A-Za-z0-9]+)\b", re.I), 0.85),
    (re.compile(rf"\bLevel\s*{_NO_TOK}[-–]?\s*(\d+)\b", re.I), 0.80),
    # "3 tola(i)" Banglish floor ordinal (reference floor bank's tola forms)
    (re.compile(r"\b(\d{1,2})\s*tola", re.I), 0.78),
]


# aligned required-literal prefilters (see _HOUSE_GATES note)
_FLOOR_GATES = [("lift",), ("floor",), ("floor",), ("level",), ("tola",)]
assert len(_FLOOR_GATES) == len(_FLOOR_PATTERNS)


def extract_floor(text: str) -> Hit:
    low = text.lower()
    for (rx, conf), gate in zip(_FLOOR_PATTERNS, _FLOOR_GATES):
        if not any(g in low for g in gate):
            continue
        m = rx.search(text)
        if m and m.group(1).lower() not in _FLAT_STOP:
            return m.group(1), conf
    return None


# ---------------------------------------------------------------- block
# Bangla block letters ("ব্লক - চ" arrives as "Block - চ") map to their
# Banglish names, mirroring the reference's bangla_to_banglish table
# (block_processor.py:252-259)
_BN_BLOCK_LETTERS = {
    "চ": "Cha", "ক": "Ka", "গ": "Ga", "জ": "Ja", "ড": "Da",
    "প": "Pa", "ব": "Ba", "ম": "Ma", "র": "Ra", "ল": "La",
    "এ": "A", "ই": "E", "খ": "Kha", "ছ": "Cha", "ঠ": "Tha",
    "থ": "Tha", "ফ": "Pha", "ভ": "Bha", "শ": "Sha", "স": "Sa", "হ": "Ha",
}
_BLOCK_BN_RE = re.compile(
    r"\bBlock\s*(?:(?:No|Number)\.?\s*)?[-–]?\s*([" +
    "".join(_BN_BLOCK_LETTERS) + r"])(?![ঀ-৿A-Za-z0-9])")
_BLOCK_PATTERNS = [
    (re.compile(rf"\bBlock\s*{_NO_TOK}[-–]?\s*([A-Za-z0-9]+)\b", re.I), 0.90),
    (re.compile(rf"\b(?:Sector|Section|Sec)\s*{_NO_TOK}[-–]?\s*"
                rf"(\d+[A-Za-z]?)\b", re.I), 0.85),
    (re.compile(r"\b([A-Za-z0-9]{1,3})\s+Block\b", re.I), 0.80),
]
_BLOCK_STOP = _FLAT_STOP


# aligned required-literal prefilters (see _HOUSE_GATES note); "sec" is a
# prefix of Sector/Section/Sec so one probe covers the alternation
_BLOCK_GATES = [("block",), ("sec",), ("block",)]
assert len(_BLOCK_GATES) == len(_BLOCK_PATTERNS)


def extract_block(text: str) -> Hit:
    low = text.lower()
    if "block" in low:
        m = _BLOCK_BN_RE.search(text)
        if m:
            return _BN_BLOCK_LETTERS[m.group(1)], 0.92
    for (rx, conf), gate in zip(_BLOCK_PATTERNS, _BLOCK_GATES):
        if not any(g in low for g in gate):
            continue
        m = rx.search(text)
        if m and m.group(1).lower() not in _BLOCK_STOP:
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
