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
    # widened toward the reference's area vocabulary (its labeled corpus +
    # common_areas list, area_processor.py:123-133): public Bangladesh
    # neighborhood -> district/division/postcode facts
    "rampura":       ("Dhaka", "Dhaka", ["1219"]),
    "banasree":      ("Dhaka", "Dhaka", ["1219"]),
    "khilkhet":      ("Dhaka", "Dhaka", ["1229"]),
    "jatrabari":     ("Dhaka", "Dhaka", ["1204"]),
    "adabor":        ("Dhaka", "Dhaka", ["1207"]),
    "moghbazar":     ("Dhaka", "Dhaka", ["1217"]),
    "azimpur":       ("Dhaka", "Dhaka", ["1205"]),
    "aftab nagar":   ("Dhaka", "Dhaka", ["1212"]),
    "demra":         ("Dhaka", "Dhaka", ["1360"]),
    "lalbagh":       ("Dhaka", "Dhaka", ["1211"]),
    "agargaon":      ("Dhaka", "Dhaka", ["1207"]),
    "kafrul":        ("Dhaka", "Dhaka", ["1206"]),
    "shewrapara":    ("Dhaka", "Dhaka", ["1216"]),
    "lalmatia":      ("Dhaka", "Dhaka", ["1207"]),
    "pallabi":       ("Dhaka", "Dhaka", ["1216"]),
    "bashabo":       ("Dhaka", "Dhaka", ["1214"]),
    "wari":          ("Dhaka", "Dhaka", ["1203"]),
    "malibagh":      ("Dhaka", "Dhaka", ["1217"]),
    "baridhara":     ("Dhaka", "Dhaka", ["1212"]),
    "kalabagan":     ("Dhaka", "Dhaka", ["1205"]),
    "kallyanpur":    ("Dhaka", "Dhaka", ["1207"]),
    "cantonment":    ("Dhaka", "Dhaka", ["1206"]),
    "gandaria":      ("Dhaka", "Dhaka", ["1204"]),
    "kakrail":       ("Dhaka", "Dhaka", ["1000"]),
    "segunbagicha":  ("Dhaka", "Dhaka", ["1000"]),
    "shantinagar":   ("Dhaka", "Dhaka", ["1217"]),
    "hazaribagh":    ("Dhaka", "Dhaka", ["1209"]),
    "banglamotor":   ("Dhaka", "Dhaka", ["1000"]),
    "green road":    ("Dhaka", "Dhaka", ["1205"]),
    "elephant road": ("Dhaka", "Dhaka", ["1205"]),
    "nikunja":       ("Dhaka", "Dhaka", ["1229"]),
    "banasree rampura": ("Dhaka", "Dhaka", ["1219"]),
    "shahbagh":      ("Dhaka", "Dhaka", ["1000"]),
    "keraniganj":    ("Dhaka", "Dhaka", ["1310"]),
    "khulshi":       ("Chattogram", "Chattogram", ["4202"]),
    "lalkhan bazar": ("Chattogram", "Chattogram", ["4000"]),
    "chawkbazar":    ("Chattogram", "Chattogram", ["4203"]),
    "bakolia":       ("Chattogram", "Chattogram", ["4203"]),
    "kotwali":       ("Chattogram", "Chattogram", ["4000"]),
    "muradpur":      ("Chattogram", "Chattogram", ["4203"]),
    "siddhirganj":   ("Narayanganj", "Dhaka", ["1430"]),
    "fatullah":      ("Narayanganj", "Dhaka", ["1420"]),
    "uposhohor":     ("Rajshahi", "Rajshahi", ["6202"]),
    "sapura":        ("Rajshahi", "Rajshahi", ["6203"]),
    "daulatpur":     ("Khulna", "Khulna", ["9202"]),
    "kazipara":      ("Dhaka", "Dhaka", ["1216"]),
    "panthapath":    ("Dhaka", "Dhaka", ["1205"]),
    "vatara":        ("Dhaka", "Dhaka", ["1212"]),
    "kataban":       ("Dhaka", "Dhaka", ["1000"]),
    "savar":         ("Dhaka", "Dhaka", ["1340"]),
    "bibir bagicha": ("Dhaka", "Dhaka", ["1204"]),
    "ak khan more":  ("Chattogram", "Chattogram", ["4202"]),
    "sadar south":   ("Comilla", "Chattogram", ["3500"]),
    "kuril":         ("Dhaka", "Dhaka", ["1229"]),
    "dc hill":       ("Chattogram", "Chattogram", ["4000"]),
    "kumar para":    ("Rajshahi", "Rajshahi", ["6100"]),
    "matuail":       ("Dhaka", "Dhaka", ["1362"]),
    "manda":         ("Dhaka", "Dhaka", ["1214"]),
    "mugda":         ("Dhaka", "Dhaka", ["1214"]),
    "faridabad":     ("Dhaka", "Dhaka", ["1204"]),
    "hatirpool":     ("Dhaka", "Dhaka", ["1205"]),
    "niketon":       ("Dhaka", "Dhaka", ["1212"]),
    "ibrahimpur":    ("Dhaka", "Dhaka", ["1206"]),
    "mirpur dohs":   ("Dhaka", "Dhaka", ["1216"]),
    "tongi":         ("Gazipur", "Dhaka", ["1710"]),
    "dewanhat":      ("Chattogram", "Chattogram", ["4100"]),
    "chandgaon":     ("Chattogram", "Chattogram", ["4212"]),
    "oxygen":        ("Chattogram", "Chattogram", ["4213"]),
    "shiddhirganj":  ("Narayanganj", "Dhaka", ["1430"]),
    # round 3: reference common_areas / main_area_names / labeled-corpus
    # vocabulary (area_processor.py:123-133,335+) — public neighborhood
    # -> district/division/postcode facts
    "meradia":       ("Dhaka", "Dhaka", ["1219"]),
    "goran":         ("Dhaka", "Dhaka", ["1219"]),
    "sabujbagh":     ("Dhaka", "Dhaka", ["1214"]),
    "bakshibazar":   ("Dhaka", "Dhaka", ["1211"]),
    "eskaton":       ("Dhaka", "Dhaka", ["1000"]),
    "new eskaton":   ("Dhaka", "Dhaka", ["1000"]),
    "kamalapur":     ("Dhaka", "Dhaka", ["1214"]),
    "vashantek":     ("Dhaka", "Dhaka", ["1206"]),
    "rajarbag":      ("Dhaka", "Dhaka", ["1217"]),
    "kurmitola":     ("Dhaka", "Dhaka", ["1206"]),
    "dakshinkhan":   ("Dhaka", "Dhaka", ["1230"]),
    "uttarkhan":     ("Dhaka", "Dhaka", ["1230"]),
    "ashkona":       ("Dhaka", "Dhaka", ["1230"]),
    "abdullahpur":   ("Dhaka", "Dhaka", ["1230"]),
    "kawla":         ("Dhaka", "Dhaka", ["1229"]),
    "monipur":       ("Dhaka", "Dhaka", ["1216"]),
    "pirerbag":      ("Dhaka", "Dhaka", ["1216"]),
    "senpara":       ("Dhaka", "Dhaka", ["1216"]),
    "kalshi":        ("Dhaka", "Dhaka", ["1216"]),
    "nakhalpara":    ("Dhaka", "Dhaka", ["1215"]),
    "jafrabad":      ("Dhaka", "Dhaka", ["1207"]),
    "bosila":        ("Dhaka", "Dhaka", ["1207"]),
    "rayerbazar":    ("Dhaka", "Dhaka", ["1209"]),
    "shyampur":      ("Dhaka", "Dhaka", ["1204"]),
    "jurain":        ("Dhaka", "Dhaka", ["1204"]),
    "dania":         ("Dhaka", "Dhaka", ["1236"]),
    "sutrapur":      ("Dhaka", "Dhaka", ["1100"]),
    "bongshal":      ("Dhaka", "Dhaka", ["1100"]),
    "narinda":       ("Dhaka", "Dhaka", ["1100"]),
    "old dhaka":     ("Dhaka", "Dhaka", ["1100"]),
    "tikatuli":      ("Dhaka", "Dhaka", ["1203"]),
    "maniknagar":    ("Dhaka", "Dhaka", ["1203"]),
    "matikata":      ("Dhaka", "Dhaka", ["1206"]),
    "balughat":      ("Dhaka", "Dhaka", ["1206"]),
    "kochukhet":     ("Dhaka", "Dhaka", ["1206"]),
    "ramna":         ("Dhaka", "Dhaka", ["1217"]),
    "patenga":       ("Chattogram", "Chattogram", ["4204"]),
    "akbarshah":     ("Chattogram", "Chattogram", ["4207"]),
    "kadamtali":     ("Chattogram", "Chattogram", ["4100"]),
    "jamal khan":    ("Chattogram", "Chattogram", ["4000"]),
    "katalgonj":     ("Chattogram", "Chattogram", ["4203"]),
    "sholoshohor":   ("Chattogram", "Chattogram", ["4209"]),
    "bayezid":       ("Chattogram", "Chattogram", ["4210"]),
    "boyra":         ("Khulna", "Khulna", ["9000"]),
    "kazla":         ("Rajshahi", "Rajshahi", ["6204"]),
    "kandirpar":     ("Comilla", "Chattogram", ["3500"]),
    "kotbari":       ("Comilla", "Chattogram", ["3503"]),
    "saidpur":       ("Nilphamari", "Rangpur", ["5310"]),
    "ashulia":       ("Dhaka", "Dhaka", ["1341"]),
}

# the complete 64-district -> division map (public administrative facts;
# the reference ships the same mapping as
# data/geographic/division/district-to-division-mapping.json). Keys are
# post-normalization lowercase; spelling aliases included where the
# normalizer doesn't already canonicalize them.
DISTRICT_TO_DIVISION: Dict[str, str] = {
    # Dhaka division
    "dhaka": "Dhaka", "gazipur": "Dhaka", "narayanganj": "Dhaka",
    "narsingdi": "Dhaka", "munshiganj": "Dhaka", "manikganj": "Dhaka",
    "tangail": "Dhaka", "kishoreganj": "Dhaka", "faridpur": "Dhaka",
    "gopalganj": "Dhaka", "madaripur": "Dhaka", "shariatpur": "Dhaka",
    "rajbari": "Dhaka",
    # Chattogram division
    "chattogram": "Chattogram", "cox's bazar": "Chattogram",
    "coxs bazar": "Chattogram", "coxsbazar": "Chattogram",
    "comilla": "Chattogram",
    "cumilla": "Chattogram", "brahmanbaria": "Chattogram",
    "chandpur": "Chattogram", "lakshmipur": "Chattogram",
    "noakhali": "Chattogram", "feni": "Chattogram",
    "khagrachhari": "Chattogram", "rangamati": "Chattogram",
    "bandarban": "Chattogram",
    # Sylhet division
    "sylhet": "Sylhet", "moulvibazar": "Sylhet", "habiganj": "Sylhet",
    "sunamganj": "Sylhet",
    # Rajshahi division
    "rajshahi": "Rajshahi", "natore": "Rajshahi", "naogaon": "Rajshahi",
    "chapainawabganj": "Rajshahi", "pabna": "Rajshahi",
    "sirajganj": "Rajshahi", "bogra": "Rajshahi", "bogura": "Rajshahi",
    "joypurhat": "Rajshahi",
    # Khulna division
    "khulna": "Khulna", "bagerhat": "Khulna", "satkhira": "Khulna",
    "jessore": "Khulna", "jashore": "Khulna", "jhenaidah": "Khulna",
    "magura": "Khulna", "narail": "Khulna", "kushtia": "Khulna",
    "chuadanga": "Khulna", "meherpur": "Khulna",
    # Barisal division
    "barisal": "Barisal", "bhola": "Barisal", "patuakhali": "Barisal",
    "pirojpur": "Barisal", "barguna": "Barisal", "jhalokati": "Barisal",
    # Rangpur division
    "rangpur": "Rangpur", "dinajpur": "Rangpur", "thakurgaon": "Rangpur",
    "panchagarh": "Rangpur", "nilphamari": "Rangpur",
    "lalmonirhat": "Rangpur", "kurigram": "Rangpur",
    "gaibandha": "Rangpur",
    # Mymensingh division
    "mymensingh": "Mymensingh", "jamalpur": "Mymensingh",
    "netrokona": "Mymensingh", "sherpur": "Mymensingh",
}

DIVISIONS = [
    "Dhaka", "Chattogram", "Sylhet", "Rajshahi",
    "Khulna", "Barisal", "Rangpur", "Mymensingh",
]

# surface spelling -> canonical district display (the reference's
# english_cities variant list + bangla_to_english_map,
# district_processor.py:292-380: public spellings of the 64 districts).
# Keys are post-normalization lowercase; Bangla keys appear verbatim
# because the normalizer only transliterates the 8 division cities.
DISTRICT_VARIANTS: Dict[str, str] = {
    "dacca": "Dhaka", "dakha": "Dhaka", "dhakha": "Dhaka", "dhka": "Dhaka",
    "chottogram": "Chattogram", "chattagong": "Chattogram",
    "chattagram": "Chattogram", "chottrogram": "Chattogram",
    "silhet": "Sylhet", "sylet": "Sylhet", "silet": "Sylhet",
    "sylhe": "Sylhet",
    "rajshai": "Rajshahi",
    "barishal": "Barisal", "borishal": "Barisal",
    "mymensing": "Mymensingh", "moymonsingh": "Mymensingh",
    "moymonshingh": "Mymensingh",
    "bogura": "Bogra",
    "cumilla": "Comilla", "komilla": "Comilla",
    "cox's bazar": "CoxsBazar", "coxs bazar": "CoxsBazar",
    "coxsbazar": "CoxsBazar", "cox bazar": "CoxsBazar",
    "coxs bazaar": "CoxsBazar", "cox bazaar": "CoxsBazar",
    # surface-preserving: the reference's english_cities list carries both
    # Jashore and Jessore and returns the matched spelling
    # (district_processor.py:308); jashore must therefore NOT canonicalize
    # to Jessore
    "jashore": "Jashore", "jessor": "Jessore",
    # truncated "ঢাক" typo (district_processor.py:344)
    "ঢাক": "Dhaka",
    "chapainawabganj": "Chapainawabganj", "nawabganj": "Chapainawabganj",
    "jhalokathi": "Jhalokati",
    "khagrachari": "Khagrachhari",
    "laxmipur": "Lakshmipur",
    "netrakona": "Netrokona",
    # Bangla district names (public administrative vocabulary)
    "কুমিল্লা": "Comilla", "কক্সবাজার": "CoxsBazar",
    "নোয়াখালী": "Noakhali", "ফেনী": "Feni", "লক্ষ্মীপুর": "Lakshmipur",
    "চাঁদপুর": "Chandpur", "ব্রাহ্মণবাড়িয়া": "Brahmanbaria",
    "রাঙ্গামাটি": "Rangamati", "বান্দরবান": "Bandarban",
    "খাগড়াছড়ি": "Khagrachhari",
    "গাজীপুর": "Gazipur", "নারায়ণগঞ্জ": "Narayanganj",
    "নরসিংদী": "Narsingdi", "মুন্সিগঞ্জ": "Munshiganj",
    "মানিকগঞ্জ": "Manikganj", "টাঙ্গাইল": "Tangail",
    "কিশোরগঞ্জ": "Kishoreganj", "ফরিদপুর": "Faridpur",
    "গোপালগঞ্জ": "Gopalganj", "মাদারীপুর": "Madaripur",
    "শরীয়তপুর": "Shariatpur", "রাজবাড়ী": "Rajbari",
    "মৌলভীবাজার": "Moulvibazar", "হবিগঞ্জ": "Habiganj",
    "সুনামগঞ্জ": "Sunamganj",
    "নাটোর": "Natore", "নওগাঁ": "Naogaon", "পাবনা": "Pabna",
    "সিরাজগঞ্জ": "Sirajganj", "বগুড়া": "Bogra", "জয়পুরহাট": "Joypurhat",
    "চাঁপাইনবাবগঞ্জ": "Chapainawabganj",
    "বাগেরহাট": "Bagerhat", "সাতক্ষীরা": "Satkhira", "যশোর": "Jessore",
    "ঝিনাইদহ": "Jhenaidah", "মাগুরা": "Magura", "নড়াইল": "Narail",
    "কুষ্টিয়া": "Kushtia", "চুয়াডাঙ্গা": "Chuadanga", "মেহেরপুর": "Meherpur",
    "ভোলা": "Bhola", "পটুয়াখালী": "Patuakhali", "পিরোজপুর": "Pirojpur",
    "বরগুনা": "Barguna", "ঝালকাঠি": "Jhalokati",
    "দিনাজপুর": "Dinajpur", "ঠাকুরগাঁও": "Thakurgaon",
    "পঞ্চগড়": "Panchagarh", "নীলফামারী": "Nilphamari",
    "লালমনিরহাট": "Lalmonirhat", "কুড়িগ্রাম": "Kurigram",
    "গাইবান্ধা": "Gaibandha",
    "জামালপুর": "Jamalpur", "নেত্রকোণা": "Netrokona", "শেরপুর": "Sherpur",
}

# canonical display casing for areas
_AREA_DISPLAY = {k: k.title() for k in AREAS}

# postal code -> list of areas (for reverse validation)
POSTAL_TO_AREAS: Dict[str, List[str]] = {}
for _a, (_d, _v, _codes) in AREAS.items():
    for _c in _codes:
        POSTAL_TO_AREAS.setdefault(_c, []).append(_a)


class Gazetteer:
    """Injectable gazetteer dim (reference ``data_path`` ctor surface,
    ``src/core/extractor.py:81``): areas + district->division maps, either
    the module fixture (default) or built from a labels table via
    :func:`build_from_labels`. The module-level functions below delegate to
    the default instance for back-compat."""

    def __init__(self, areas: Dict[str, tuple] = None,
                 district_to_division: Dict[str, str] = None):
        self.areas = dict(AREAS if areas is None else areas)
        self.district_to_division = dict(
            DISTRICT_TO_DIVISION if district_to_division is None
            else district_to_division)
        self.postal_to_areas: Dict[str, List[str]] = {}
        for a, (_d, _v, codes) in self.areas.items():
            for c in codes:
                self.postal_to_areas.setdefault(c, []).append(a)

    def lookup_area(self, area: str) -> Optional[dict]:
        rec = self.areas.get(area.strip().lower())
        if rec is None:
            return None
        district, division, codes = rec
        return {"district": district, "division": division,
                "postal_codes": codes}

    def district_division(self, district: str) -> Optional[str]:
        return self.district_to_division.get(district.strip().lower())


_DEFAULT = Gazetteer()


def build_from_labels(rows: List[dict]) -> "Gazetteer":
    """Build a Gazetteer dim from labeled rows
    ``{area, district, division, postal_code}`` — the reference's
    ``Gazetteer._build_from_data`` agg (``gazetteer.py:58-128``): per area,
    the MODE district/division (ties -> lexicographically smallest, so the
    build is deterministic) and postal codes sorted by frequency desc then
    code asc. Driver-side finalize over pre-aggregated counts: see
    ``functions.gazetteer_build.build_gazetteer`` for the distributed
    count pass."""
    from collections import Counter, defaultdict

    dist_votes: Dict[str, Counter] = defaultdict(Counter)
    div_votes: Dict[str, Counter] = defaultdict(Counter)
    postal_votes: Dict[str, Counter] = defaultdict(Counter)
    d2v_votes: Dict[str, Counter] = defaultdict(Counter)
    for r in rows:
        area = (r.get("area") or "").strip().lower()
        if not area:
            continue
        n = int(r.get("n", 1))
        district = (r.get("district") or "").strip()
        division = (r.get("division") or "").strip()
        postal = (r.get("postal_code") or "").strip()
        if district:
            dist_votes[area][district] += n
            if division:
                d2v_votes[district.lower()][division] += n
        if division:
            div_votes[area][division] += n
        if postal:
            postal_votes[area][postal] += n

    def _mode(c: "Counter") -> str:
        return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0] \
            if c else ""

    areas = {}
    for area in dist_votes.keys() | div_votes.keys() | postal_votes.keys():
        codes = [c for c, _ in sorted(postal_votes[area].items(),
                                      key=lambda kv: (-kv[1], kv[0]))]
        areas[area] = (_mode(dist_votes[area]), _mode(div_votes[area]),
                       codes)
    d2v = {d: _mode(c) for d, c in d2v_votes.items()}
    return Gazetteer(areas=areas, district_to_division=d2v)


def freeze_gazetteer(gaz: "Gazetteer") -> tuple:
    """Hashable snapshot of a dim — ships through task fn_kwargs and keys
    the per-worker kernel cache."""
    areas = tuple(sorted(
        (a, d, v, tuple(codes)) for a, (d, v, codes) in gaz.areas.items()))
    d2v = tuple(sorted(gaz.district_to_division.items()))
    return (areas, d2v)


def thaw_gazetteer(frozen: tuple) -> "Gazetteer":
    areas_t, d2v_t = frozen
    return Gazetteer(
        areas={a: (d, v, list(codes)) for a, d, v, codes in areas_t},
        district_to_division=dict(d2v_t))


def area_display(area_lower: str) -> str:
    return _AREA_DISPLAY.get(area_lower, area_lower.title())


def canonical_area(value: str, gaz: Optional["Gazetteer"] = None) -> str:
    """Surface area value -> canonical lowercase gazetteer key.

    The extractor outputs the SURFACE form (reference parity: its contextual
    patterns capture the raw text, area_processor.py:900-960); everything
    internal — blocking keys, gazetteer enrichment, pair scoring — goes
    through this so spelling variants of one neighborhood ("Shamoli",
    "Shymoli", "Shyamoli") still collide/compare equal. Unknown values
    canonicalize to themselves (lowercased)."""
    t = (value or "").strip().lower()
    areas = (gaz or _DEFAULT).areas
    if t in areas:
        return t
    if t in AREA_VARIANTS:
        return AREA_VARIANTS[t]
    # directional prefixes don't change the neighborhood identity
    for pre in ("north ", "south ", "east ", "west ", "middle ",
                "uttar ", "dakshin ", "purbo ", "paschim ", "moddho "):
        if t.startswith(pre):
            rest = t[len(pre):]
            if rest in areas:
                return rest
            if rest in AREA_VARIANTS:
                return AREA_VARIANTS[rest]
    return t


def lookup_area(area: str) -> Optional[dict]:
    """area (any case) -> {district, division, postal_codes} or None."""
    return _DEFAULT.lookup_area(area)


def district_division(district: str) -> Optional[str]:
    return _DEFAULT.district_division(district)


def validate_and_enrich(evidence_map: Dict[str, list],
                        gaz: Optional["Gazetteer"] = None) -> None:
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

    gaz = gaz or _DEFAULT

    def best(component: str) -> Optional[str]:
        evs = evidence_map.get(component) or []
        if not evs:
            return None
        return max(evs, key=lambda e: e["confidence"])["value"]

    area = best("area")
    district = best("district")
    postal = best("postal_code")

    if area:
        # surface form -> canonical key (the extractor preserves the raw
        # spelling; enrichment must still find the neighborhood)
        rec = gaz.lookup_area(canonical_area(area, gaz))
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
        div = gaz.district_division(district)
        if div:
            # 0.90, not 0.80: district -> division is a DETERMINISTIC
            # administrative mapping (64 districts partition 8 divisions);
            # the only uncertainty is the district itself, which already
            # passed its own resolution. At 0.80 a single false-positive
            # area token ("Shima Niketon" -> Niketon -> Dhaka) ties the
            # conflict score and the 0.90 conflict discount then drops the
            # division below its 0.80 threshold — the round-4 miss
            # taxonomy's "division empty despite recognized district" class.
            evidence_map.setdefault("division", []).append(
                {"value": div, "confidence": 0.90,
                 "source": "inferred_from_district"})


# common misspelling variants, as in the reference's fuzzy matcher seed list
# (`gazetteer.py:321-350`: gulisthan -> gulshan etc.)
# typo-corrections: the reference's fuzzy-matcher seed list
# (gazetteer.py:321-350) — these OUTPUT the canonical display
# (gulisthan -> Gulshan), unlike the surface variants below
AREA_CORRECTIONS: Dict[str, str] = {
    "gulisthan": "gulshan",
    "gulistan": "gulshan",
    "jigatala": "jigatola",
    "mirpoor": "mirpur",
    "dhanmondy": "dhanmondi",
    "uttora": "uttara",
    "bonani": "banani",
    "mohammedpur": "mohammadpur",
}

AREA_VARIANTS: Dict[str, str] = {
    **AREA_CORRECTIONS,
    "zigatola": "jigatola",
    "jhigatola": "jigatola",
    # surface spellings seen in the reference's labeled corpus; the area
    # extractor outputs the SURFACE form (reference parity) and canonical
    # keys are used internally for blocking/enrichment (canonical_area)
    "santinagar": "shantinagar",
    "shamoli": "shyamoli", "shymoli": "shyamoli", "shamoly": "shyamoli",
    "shaymoli": "shyamoli", "shymoly": "shyamoli",
    "basabo": "bashabo", "bashabo": "bashabo",
    "shabujbag": "sabujbagh", "sobujbagh": "sabujbagh",
    "sabujbag": "sabujbagh", "shabujbagh": "sabujbagh",
    "kamlapur": "kamalapur",
    "bhashantec": "vashantek", "bhashantek": "vashantek",
    "vasantek": "vashantek",
    "dakhinkhan": "dakshinkhan", "dhakshinkhan": "dakshinkhan",
    "dakkhinkhan": "dakshinkhan", "dakshin khan": "dakshinkhan",
    "rajarbagh": "rajarbag",
    "malibag": "malibagh",
    "mogbazar": "moghbazar",
    "aftabnagar": "aftab nagar",
    "aftabnogor": "aftab nagar",
    "amberkhana": "ambarkhana",
    "puran dhaka": "old dhaka",
    "cantt": "cantonment", "cant": "cantonment",
    "khilgoan": "khilgaon",
    "banashree": "banasree", "banosree": "banasree",
    "banossree": "banasree",
    "bashundara": "bashundhara",
    "baridara": "baridhara",
    "katalganj": "katalgonj",
    "kotowali": "kotwali",
    "bashila": "bosila",
    "bangshal": "bongshal",
}


def _fuzzy_cache(gaz: "Gazetteer"):
    """Per-gazetteer candidate index for fuzzy_match_area: sorted names
    with cached char sets, bucketed by 4-char prefix. Built lazily once —
    the previous per-call set(name) over every area made the fuzzy scan
    ~0.2 ms per TOKEN, which dominated the kernel on area-less texts."""
    cache = getattr(gaz, "_fuzzy_idx", None)
    if cache is None:
        names = sorted(gaz.areas)
        sets = {n: frozenset(n) for n in names}
        by_prefix: Dict[str, list] = {}
        by_sig: Dict[frozenset, list] = {}
        for n in names:
            by_prefix.setdefault(n[:4], []).append(n)
            by_sig.setdefault(sets[n], []).append(n)
        cache = (names, sets, by_prefix, by_sig)
        gaz._fuzzy_idx = cache
    return cache


def fuzzy_match_area(token: str,
                     gaz: Optional["Gazetteer"] = None) -> Optional[str]:
    """Char-overlap fuzzy area match (reference ``gazetteer.py:321-377``):
    known variant map first, then >=0.75 Jaccard on character sets plus a
    shared 4-char prefix-core (or the >0.85 + SequenceMatcher escape).
    Returns the canonical lowercase area name or None. Deterministic:
    best overlap wins, earliest sorted name on ties — identical semantics
    to the full sorted scan, evaluated over prefix-indexed candidates with
    a set-size bound pruning the escape path."""
    g = gaz or _DEFAULT
    areas = g.areas
    t = token.strip().lower()
    if t in AREA_VARIANTS:
        return AREA_VARIANTS[t]
    if len(t) < 4 or t in areas:
        return t if t in areas else None
    # per-gazetteer token->result memo: transcript token vocabulary repeats
    # heavily, and the signature-probe scan below builds ~len+26 frozensets
    # per call — two dict probes beat that by ~50x on repeat tokens (the
    # kernel profile had this function at 17% of extraction time)
    memo = getattr(g, "_fuzzy_memo", None)
    if memo is None:
        memo = g._fuzzy_memo = {}
    if t in memo:
        return memo[t]
    names, sets, by_prefix, by_sig = _fuzzy_cache(g)
    tset = frozenset(t)
    best_name, best_ov = None, 0.0

    def consider(name):
        nonlocal best_name, best_ov
        nset = sets[name]
        ov = len(tset & nset) / len(tset | nset)
        ok = ov >= 0.75 and name[:4] == t[:4]
        if not ok and ov > 0.85:
            # char-SET overlap alone admits anagrams ("dream" ~ "demra");
            # gate the no-prefix escape on ORDERED similarity like the
            # reference's SequenceMatcher check (gazetteer.py:352-375)
            from difflib import SequenceMatcher
            ok = SequenceMatcher(None, t, name).ratio() >= 0.80
        if ok and ov > best_ov:
            best_name, best_ov = name, ov

    # candidates: prefix bucket + escape-plausible names. The escape needs
    # ov > 0.85, and for char sets with |A∪B| <= 13 (every gazetteer name)
    # that forces symmetric difference <= 1 — so the only possible escape
    # candidates are names whose char set equals tset, tset minus one
    # char, or tset plus one letter: O(len + 26) signature probes instead
    # of a scan over every name. Evaluated in SORTED order so
    # equal-overlap ties resolve exactly as the full sorted scan did.
    cand = set(by_prefix.get(t[:4], ()))
    for sig in ([tset]
                + [tset - {c} for c in tset]
                + [tset | {c} for c in "abcdefghijklmnopqrstuvwxyz "
                   if c not in tset]):
        cand.update(by_sig.get(sig, ()))
    for name in sorted(cand):
        consider(name)
    if len(memo) >= 500_000:
        memo.clear()                  # epoch eviction, O(1) amortized
    memo[t] = best_name
    return best_name
