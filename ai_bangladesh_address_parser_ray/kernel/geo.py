"""Offline Bangladesh geographic hierarchy engine (pipeline stage 7 state).

Behavioral twin of the reference's offline geo intelligence
(``/root/reference/src/geo/bangladesh_geo_offline.py:221-393``) and the
geographic validator stage (``src/core/stages/geographic_validator.py``):

- Division > District > Upazila > Union > Village hierarchy dicts
- postal-code mappings (postal->upazila, district->postal set)
- 6-priority postal prediction with district-consistency VETOES at every
  priority and the deterministic ``sorted()[0]`` district-level tie-break
  (``bangladesh_geo_offline.py:332``)
- ``get_full_hierarchy(postal)`` reverse lookup
- ``validate_location`` consistency check with conflicts + suggestions
- proactive upazila/union scan over the raw string
  (``geographic_validator.py:171-229``)

The data here is a curated PUBLIC-KNOWLEDGE fixture (well-known upazilas /
unions per district with postal codes in each district's real code range) —
the reference ships ~4 MB of division JSONs; this module keeps the same
lookup semantics over a smaller deterministic dim, and `load_hierarchy`
accepts an external dict of the same shape for users with a fuller dataset
(the reference's `division_data_path` extension surface).

Where the reference iterates plain dicts (insertion order), this module
iterates in **sorted name order** so every scan is deterministic and
replay-stable — required by the distributed pipeline's retry semantics.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

# upazila(lower) -> (district, division, postal_code)
UPAZILAS: Dict[str, tuple] = {
    # Dhaka district
    "savar":        ("Dhaka", "Dhaka", "1340"),
    "dhamrai":      ("Dhaka", "Dhaka", "1350"),
    "keraniganj":   ("Dhaka", "Dhaka", "1310"),
    "dohar":        ("Dhaka", "Dhaka", "1330"),
    "nawabganj":    ("Dhaka", "Dhaka", "1320"),
    # Gazipur
    "kaliakair":    ("Gazipur", "Dhaka", "1750"),
    "kapasia":      ("Gazipur", "Dhaka", "1730"),
    "sreepur":      ("Gazipur", "Dhaka", "1740"),
    "kaliganj":     ("Gazipur", "Dhaka", "1720"),
    # Narayanganj
    "rupganj":      ("Narayanganj", "Dhaka", "1460"),
    "sonargaon":    ("Narayanganj", "Dhaka", "1440"),
    "araihazar":    ("Narayanganj", "Dhaka", "1450"),
    "bandar":       ("Narayanganj", "Dhaka", "1410"),
    # Chattogram
    "sitakunda":    ("Chattogram", "Chattogram", "4310"),
    "mirsharai":    ("Chattogram", "Chattogram", "4320"),
    "patiya":       ("Chattogram", "Chattogram", "4370"),
    "anwara":       ("Chattogram", "Chattogram", "4376"),
    "boalkhali":    ("Chattogram", "Chattogram", "4366"),
    "rangunia":     ("Chattogram", "Chattogram", "4360"),
    "raozan":       ("Chattogram", "Chattogram", "4340"),
    "hathazari":    ("Chattogram", "Chattogram", "4330"),
    "sandwip":      ("Chattogram", "Chattogram", "4300"),
    "banshkhali":   ("Chattogram", "Chattogram", "4390"),
    # Comilla
    "daudkandi":    ("Comilla", "Chattogram", "3516"),
    "laksam":       ("Comilla", "Chattogram", "3570"),
    "chandina":     ("Comilla", "Chattogram", "3510"),
    "homna":        ("Comilla", "Chattogram", "3546"),
    # Cox's Bazar
    "teknaf":       ("Cox's Bazar", "Chattogram", "4760"),
    "ukhia":        ("Cox's Bazar", "Chattogram", "4750"),
    "chakaria":     ("Cox's Bazar", "Chattogram", "4740"),
    "ramu":         ("Cox's Bazar", "Chattogram", "4730"),
    # Sylhet
    "beanibazar":   ("Sylhet", "Sylhet", "3170"),
    "golapganj":    ("Sylhet", "Sylhet", "3160"),
    "jaintiapur":   ("Sylhet", "Sylhet", "3156"),
    "companiganj":  ("Sylhet", "Sylhet", "3140"),
    "balaganj":     ("Sylhet", "Sylhet", "3120"),
    "bishwanath":   ("Sylhet", "Sylhet", "3130"),
    # Rajshahi
    "paba":         ("Rajshahi", "Rajshahi", "6210"),
    "godagari":     ("Rajshahi", "Rajshahi", "6290"),
    "tanore":       ("Rajshahi", "Rajshahi", "6230"),
    "bagha":        ("Rajshahi", "Rajshahi", "6280"),
    "charghat":     ("Rajshahi", "Rajshahi", "6270"),
    "puthia":       ("Rajshahi", "Rajshahi", "6260"),
    # Khulna
    "dumuria":      ("Khulna", "Khulna", "9250"),
    "phultala":     ("Khulna", "Khulna", "9210"),
    "dighalia":     ("Khulna", "Khulna", "9220"),
    "paikgachha":   ("Khulna", "Khulna", "9280"),
    "rupsha":       ("Khulna", "Khulna", "9240"),
    # Barisal
    "bakerganj":    ("Barisal", "Barisal", "8280"),
    "babuganj":     ("Barisal", "Barisal", "8210"),
    "wazirpur":     ("Barisal", "Barisal", "8220"),
    "banaripara":   ("Barisal", "Barisal", "8530"),
    "gournadi":     ("Barisal", "Barisal", "8230"),
    # Rangpur
    "mithapukur":   ("Rangpur", "Rangpur", "5460"),
    "badarganj":    ("Rangpur", "Rangpur", "5430"),
    "gangachara":   ("Rangpur", "Rangpur", "5410"),
    "pirgachha":    ("Rangpur", "Rangpur", "5450"),
    "kaunia":       ("Rangpur", "Rangpur", "5440"),
    # Mymensingh
    "trishal":      ("Mymensingh", "Mymensingh", "2220"),
    "bhaluka":      ("Mymensingh", "Mymensingh", "2240"),
    "muktagachha":  ("Mymensingh", "Mymensingh", "2210"),
    "fulbaria":     ("Mymensingh", "Mymensingh", "2216"),
    "gafargaon":    ("Mymensingh", "Mymensingh", "2230"),
    "ishwarganj":   ("Mymensingh", "Mymensingh", "2280"),
}

# union(lower) -> (upazila, district, division); postal inherits upazila's
UNIONS: Dict[str, tuple] = {
    "ashulia":      ("savar", "Dhaka", "Dhaka"),
    "birulia":      ("savar", "Dhaka", "Dhaka"),
    "pathalia":     ("savar", "Dhaka", "Dhaka"),
    "kalatia":      ("keraniganj", "Dhaka", "Dhaka"),
    "konda":        ("keraniganj", "Dhaka", "Dhaka"),
    "aganagar":     ("keraniganj", "Dhaka", "Dhaka"),
    "mouchak":      ("kaliakair", "Gazipur", "Dhaka"),
    "bhatiari":     ("sitakunda", "Chattogram", "Chattogram"),
    "kumira":       ("sitakunda", "Chattogram", "Chattogram"),
    "salimpur":     ("sitakunda", "Chattogram", "Chattogram"),
    "kanchpur":     ("sonargaon", "Narayanganj", "Dhaka"),
    "jahapur":      ("muktagachha", "Mymensingh", "Mymensingh"),
}

# village(lower) -> (union, upazila, district, division)
VILLAGES: Dict[str, tuple] = {
    "genda":        ("pathalia", "savar", "Dhaka", "Dhaka"),
    "yearpur":      ("ashulia", "savar", "Dhaka", "Dhaka"),
    "panishail":    ("birulia", "savar", "Dhaka", "Dhaka"),
    "baher char":   ("konda", "keraniganj", "Dhaka", "Dhaka"),
    "fouzdarhat":   ("salimpur", "sitakunda", "Chattogram", "Chattogram"),
    "masdair":      ("kanchpur", "sonargaon", "Narayanganj", "Dhaka"),
}

# post-office name(lower) -> (district, postal_code) — priority-4 areas
POST_OFFICES: Dict[str, tuple] = {
    "dhaka gpo":        ("Dhaka", "1000"),
    "dhaka cantonment": ("Dhaka", "1206"),
    "chattogram gpo":   ("Chattogram", "4000"),
    "khulna gpo":       ("Khulna", "9000"),
    "sylhet sadar":     ("Sylhet", "3100"),
    "rajshahi gpo":     ("Rajshahi", "6000"),
    "savar cantonment": ("Dhaka", "1344"),
}


_BUNDLED_ASSET = "unset"                   # cached parse of the data file
_FULL_LAYERS = None                        # cached (upazilas, unions, villages)
_PLAIN_NAME = re.compile(r"[a-z]+(?: [a-z]+){0,3}$")


def _bundled_asset():
    """Parse ``data/bd_geo_hierarchy.json`` once per process (built by
    ``tools/build_geo_asset.py`` from the public division-JSON open-data
    format; 577 upazilas / 2,505 unions / 2,287 villages — the same totals
    the reference loads from its division files)."""
    global _BUNDLED_ASSET
    if _BUNDLED_ASSET == "unset":
        import json
        import os
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "bd_geo_hierarchy.json")
        try:
            with open(path, encoding="utf-8") as fh:
                _BUNDLED_ASSET = json.load(fh)
        except (OSError, ValueError):
            _BUNDLED_ASSET = None
    return _BUNDLED_ASSET


def full_layers():
    """(upazilas, unions, villages, post_offices) — curated fixture, the
    ~495-name skeleton, and the bundled full-scale asset merged under
    deterministic guards; cached per process. Guard rules (metropolitan
    reading wins):

    - a name colliding with a gazetteer area (Mirpur of Kushtia vs
      Mirpur, Dhaka) is skipped — area evidence outranks geo scan;
    - curated entries keep their district reading; an asset postal code
      fills a missing one only when both agree on the district;
    - only plain letter names (1-4 words, >=4 chars) participate — the
      raw union data mislabels city areas like "sector 4" as unions;
    - first-in-sorted-order wins on residual collisions (replay-stable).
    """
    global _FULL_LAYERS
    if _FULL_LAYERS is not None:
        return _FULL_LAYERS
    from .gazetteer import AREAS, AREA_VARIANTS, DISTRICT_TO_DIVISION
    from .geo_data import UPAZILA_SKELETON

    area_names = set(AREAS) | set(AREA_VARIANTS)

    def ok(name: str) -> bool:
        return (len(name) >= 4 and name not in area_names
                and _PLAIN_NAME.match(name) is not None)

    upazilas = dict(UPAZILAS)
    for name, district in sorted(UPAZILA_SKELETON.items()):
        if name not in upazilas and ok(name):
            upazilas[name] = (
                district, DISTRICT_TO_DIVISION.get(district.lower(), ""), "")
    asset = _bundled_asset() or {}
    for name, val in sorted(asset.get("upazilas", {}).items()):
        district, division, code = (list(val) + ["", "", ""])[:3]
        if not ok(name):
            continue
        if name in upazilas:
            d0, dv0, c0 = upazilas[name]
            if not c0 and code and d0.lower() == district.lower():
                upazilas[name] = (d0, dv0, code)
            continue
        upazilas[name] = (district, division or DISTRICT_TO_DIVISION.get(
            district.lower(), ""), code)

    unions = dict(UNIONS)
    for name, val in sorted(asset.get("unions", {}).items()):
        if name in unions or name in upazilas or not ok(name):
            continue
        upz, district, division = (list(val) + ["", "", ""])[:3]
        unions[name] = (upz.lower(), district, division)

    villages = dict(VILLAGES)
    for name, val in sorted(asset.get("villages", {}).items()):
        if name in villages or name in unions or name in upazilas \
                or not ok(name):
            continue
        union, upz, district, division = (list(val) + [""] * 4)[:4]
        villages[name] = (union.lower(), upz.lower(), district, division)

    # post offices are lookup-only (never scanned), so area-name overlap
    # is fine — "dhanmondi" the post office AGREES with the area and gives
    # priority-4 postal prediction its real code
    post_offices = dict(POST_OFFICES)
    for name, val in sorted(asset.get("post_offices", {}).items()):
        if name not in post_offices and len(name) >= 3:
            district, code = (list(val) + ["", ""])[:2]
            post_offices[name] = (district, code)

    _FULL_LAYERS = (upazilas, unions, villages, post_offices)
    return _FULL_LAYERS


class GeoHierarchy:
    """Loaded lookup structures; build once per actor / oracle process.

    The default fixture is :func:`full_layers`: curated postal-coded
    upazilas widened by the public skeleton (district/division, no
    fabricated codes) and the bundled full-scale hierarchy asset
    (577 upazilas / 2,505 unions / 2,287 villages with real postal
    codes) under the guards documented there."""

    def __init__(self, upazilas=None, unions=None, villages=None,
                 post_offices=None):
        if upazilas is None or unions is None or villages is None \
                or post_offices is None:
            fu, fn, fv, fp = full_layers()
            upazilas = fu if upazilas is None else upazilas
            unions = fn if unions is None else unions
            villages = fv if villages is None else villages
            post_offices = fp if post_offices is None else post_offices
        self.upazilas = dict(upazilas)
        self.unions = dict(unions)
        self.villages = dict(villages)
        self.post_offices = dict(post_offices)

        # postal mappings: postal->upazila keeps the SORTED-FIRST upazila
        # when codes collide (deterministic, mirrors the reference's
        # first-loaded-wins made replay-stable)
        self.postal_to_upazila: Dict[str, str] = {}
        self.district_to_postals: Dict[str, set] = {}
        self.district_to_division: Dict[str, str] = {}
        for name in sorted(self.upazilas):
            district, division, code = self.upazilas[name]
            self.district_to_division.setdefault(district.lower(), division)
            if code:
                self.postal_to_upazila.setdefault(code, name)
                self.district_to_postals.setdefault(
                    district.lower(), set()).add(code)
        for name in sorted(self.post_offices):
            district, code = self.post_offices[name]
            self.district_to_postals.setdefault(
                district.lower(), set()).add(code)

        # area name -> [locations]; like the reference's search index it
        # contains upazilas, unions AND post offices
        self.area_to_location: Dict[str, list] = {}
        for name in sorted(self.post_offices):
            district, code = self.post_offices[name]
            self.area_to_location.setdefault(name, []).append(
                {"type": "post_office", "district": district,
                 "postal_code": code})
        for name in sorted(self.upazilas):
            district, division, code = self.upazilas[name]
            self.area_to_location.setdefault(name, []).append(
                {"type": "upazila", "district": district,
                 "division": division, "postal_code": code})
        for name in sorted(self.unions):
            upz, district, division = self.unions[name]
            code = self.upazilas.get(upz, (None, None, ""))[2]
            self.area_to_location.setdefault(name, []).append(
                {"type": "union", "upazila": upz, "district": district,
                 "division": division, "postal_code": code})

        # proactive-scan structures: token n-gram dict probes instead of a
        # compiled alternation — a ~3,000-literal Python-re alternation
        # backtracks per position (≈0.5 ms/negative string), the probe is
        # two dict lookups per word. Token-aligned, so short names (bera,
        # lama, tala) still can't fire inside unrelated words. Only plain
        # 1-4-word letter names participate; others stay lookup-only.
        self._scan_ngrams: Dict[int, set] = {}
        self._scan_first: set = set()   # first words — the position gate
        for n in sorted(set(self.upazilas) | set(self.unions)):
            if _PLAIN_NAME.match(n):
                toks = tuple(n.split(" "))
                self._scan_ngrams.setdefault(len(toks), set()).add(toks)
                self._scan_first.add(toks[0])
        self._scan_max_n = max(self._scan_ngrams, default=0)

    # ------------------------------------------------------ prediction ----

    def predict_postal_code(self, area: Optional[str] = None,
                            district: Optional[str] = None,
                            division: Optional[str] = None) -> Optional[dict]:
        """6-priority postal prediction with district-consistency vetoes
        (reference ``bangladesh_geo_offline.py:221-338``); a vetoed priority
        FALLS THROUGH to the next one, it does not abort."""
        a = area.strip().lower() if area else None
        d = district.strip().lower() if district else None

        # P1: exact upazila (0.95)
        if a and a in self.upazilas:
            udist, udiv, code = self.upazilas[a]
            if not (d and udist.lower() != d) and code:
                return {"postal_code": code, "confidence": 0.95,
                        "source": "upazila_match",
                        "full_location": f"{area} (Upazila), {udist}, {udiv}"}

        # P2: exact union (0.90)
        if a and a in self.unions:
            upz, udist, udiv = self.unions[a]
            code = self.upazilas.get(upz, (None, None, ""))[2]
            if not (d and udist.lower() != d) and code:
                return {"postal_code": code, "confidence": 0.90,
                        "source": "union_match",
                        "full_location": f"{area} (Union), {upz.title()}, "
                                         f"{udist}"}

        # P3: exact village (0.85)
        if a and a in self.villages:
            uni, upz, udist, udiv = self.villages[a]
            code = self.upazilas.get(upz, (None, None, ""))[2]
            if not (d and udist.lower() != d) and code:
                return {"postal_code": code, "confidence": 0.85,
                        "source": "village_match",
                        "full_location": f"{area} (Village), {uni.title()}, "
                                         f"{upz.title()}"}

        # P4: area index (post offices et al, 0.80); first consistent
        # location in (deterministic) index order wins
        if a and a in self.area_to_location:
            for loc in self.area_to_location[a]:
                if d and loc.get("district", "").lower() != d:
                    continue
                if loc.get("postal_code"):
                    return {"postal_code": loc["postal_code"],
                            "confidence": 0.80,
                            "source": f"{loc.get('type', 'area')}_match",
                            "full_location":
                                f"{area}, {loc.get('district', 'Unknown')}"}

        # P5: fuzzy containment over all indexed names (0.70), sorted order
        if a:
            for name in sorted(self.area_to_location):
                if a in name or name in a:
                    for loc in self.area_to_location[name]:
                        if d and loc.get("district", "").lower() != d:
                            continue
                        if loc.get("postal_code"):
                            return {"postal_code": loc["postal_code"],
                                    "confidence": 0.70,
                                    "source": "fuzzy_area_match",
                                    "full_location": f"Near {name}"}

        # P6: district minimum (0.60) — the sorted()[0] tie-break
        if d and d in self.district_to_postals:
            codes = self.district_to_postals[d]
            if codes:
                return {"postal_code": sorted(codes)[0], "confidence": 0.60,
                        "source": "district_inference",
                        "full_location": f"{district} (District-level)"}
        return None

    # --------------------------------------------------------- lookups ----

    def get_full_hierarchy(self, postal_code: str) -> Optional[dict]:
        upz = self.postal_to_upazila.get(postal_code)
        if upz is None:
            return None
        district, division, _ = self.upazilas[upz]
        unions = sorted(u for u, (up, _, _) in self.unions.items()
                        if up == upz)
        return {"postal_code": postal_code, "upazila": upz.title(),
                "district": district, "division": division,
                "unions": [u.title() for u in unions]}

    def validate_location(self, area=None, district=None, division=None,
                          postal_code=None) -> dict:
        conflicts, suggestions = [], {}
        if postal_code and district:
            upz = self.postal_to_upazila.get(postal_code)
            if upz:
                expected = self.upazilas[upz][0]
                if expected.lower() != district.strip().lower():
                    conflicts.append(
                        f"Postal {postal_code} belongs to {expected}, "
                        f"not {district}")
                    suggestions["district"] = expected
        if district and division:
            expected = self.district_to_division.get(
                district.strip().lower())
            if expected and expected.lower() != division.strip().lower():
                conflicts.append(
                    f"District {district} belongs to {expected}, "
                    f"not {division}")
                suggestions["division"] = expected
        return {"valid": not conflicts, "conflicts": conflicts,
                "suggestions": suggestions}

    # -------------------------------------------------- proactive scan ----

    _SCAN_TOKEN = re.compile(r"[a-z]+")

    def scan_address(self, address_lower: str) -> Optional[dict]:
        """Find an upazila/union mention in the raw normalized string
        (reference ``geographic_validator.py:182-228``). Leftmost match;
        longest n-gram wins at the same start (the old longest-first
        alternation semantics); upazilas outrank unions at the same span."""
        if not self._scan_max_n:
            return None
        toks = [(m.start(), m.end(), m.group(0))
                for m in self._SCAN_TOKEN.finditer(address_lower)]
        name = None
        first = self._scan_first
        for i in range(len(toks)):
            # every known n-gram starts with a word from the first-word
            # set; one set probe skips the candidate-tuple loop at ~95%
            # of positions (same leftmost/longest result by construction)
            if toks[i][2] not in first:
                continue
            for n in range(min(self._scan_max_n, len(toks) - i), 0, -1):
                grams = self._scan_ngrams.get(n)
                if not grams:
                    continue
                cand = tuple(t[2] for t in toks[i:i + n])
                if cand in grams and all(
                        address_lower[toks[i + j][1]:toks[i + j + 1][0]]
                        == " " for j in range(n - 1)):
                    name = " ".join(cand)
                    break
            if name:
                break
        if name is None:
            return None
        if name in self.upazilas:
            district, division, code = self.upazilas[name]
            return {"kind": "upazila", "name": name, "district": district,
                    "division": division, "postal_code": code}
        upz, district, division = self.unions[name]
        code = self.upazilas.get(upz, (None, None, ""))[2]
        return {"kind": "union", "name": name, "district": district,
                "division": division, "postal_code": code}


def load_hierarchy(data: Dict) -> GeoHierarchy:
    """Build a GeoHierarchy from an EXTERNAL hierarchy dict — the
    reference's ``division_data_path`` extension surface
    (``bangladesh_geo_offline.py:58-219`` loads the same four layers from
    division JSONs). Shape::

        {"upazilas":     {name: (district, division, postal_code)},
         "unions":       {name: (upazila, district, division)},
         "villages":     {name: (union, upazila, district, division)},
         "post_offices": {name: (district, postal_code)}}

    Layers omitted from ``data`` fall back to the module fixture; names
    are lowercased; tuple/list values are accepted."""
    def layer(key):
        d = data.get(key)
        if d is None:
            return None
        return {str(k).strip().lower(): tuple(v) for k, v in d.items()}

    return GeoHierarchy(upazilas=layer("upazilas"),
                        unions=layer("unions"),
                        villages=layer("villages"),
                        post_offices=layer("post_offices"))


_DEFAULT_GEO: Optional[GeoHierarchy] = None


def default_geo() -> GeoHierarchy:
    global _DEFAULT_GEO
    if _DEFAULT_GEO is None:
        _DEFAULT_GEO = GeoHierarchy()
    return _DEFAULT_GEO


def geo_enrich(evidence_map: Dict[str, list], norm_text: str,
               geo: Optional[GeoHierarchy] = None) -> None:
    """Pipeline stage 7 (geographic validator), in place over the evidence
    map; mirrors ``geographic_validator.py:37-169`` gating:

    - proactive upazila/union scan when no area evidence yet (sources
      ``geographic_upazila_extraction`` 0.90 / ``geographic_union_extraction``
      0.85, with district/division autofill at 0.95/0.90)
    - division from district (``geographic_inferred_from_district`` 0.98)
    - postal prediction accepted only at confidence >= 0.80
      (``geographic_validator.py:130``), source prefixed ``geographic_``
    """
    geo = geo or default_geo()

    def best(component: str) -> Optional[str]:
        evs = evidence_map.get(component) or []
        if not evs:
            return None
        return max(evs, key=lambda e: e["confidence"])["value"]

    area = best("area")
    district = best("district")

    if not area:
        hit = geo.scan_address(norm_text.lower())
        if hit:
            if hit["kind"] == "upazila":
                conf_area, conf_fill = 0.90, 0.95
                src_area = "geographic_upazila_extraction"
                src_fill = "geographic_inferred_from_upazila"
            else:
                conf_area, conf_fill = 0.85, 0.90
                src_area = "geographic_union_extraction"
                src_fill = "geographic_inferred_from_union"
            evidence_map.setdefault("area", []).append(
                {"value": hit["name"].title(), "confidence": conf_area,
                 "source": src_area})
            area = area or hit["name"].title()
            if not district:
                evidence_map.setdefault("district", []).append(
                    {"value": hit["district"], "confidence": conf_fill,
                     "source": src_fill})
                district = hit["district"]
            if not best("division"):
                evidence_map.setdefault("division", []).append(
                    {"value": hit["division"], "confidence": conf_fill,
                     "source": src_fill})

    if district and not best("division"):
        div = geo.district_to_division.get(district.strip().lower())
        if div:
            evidence_map.setdefault("division", []).append(
                {"value": div, "confidence": 0.98,
                 "source": "geographic_inferred_from_district"})

    if not best("postal_code"):
        pred = geo.predict_postal_code(area=area, district=district,
                                       division=best("division"))
        if pred and pred["confidence"] >= 0.80:
            evidence_map.setdefault("postal_code", []).append(
                {"value": pred["postal_code"],
                 "confidence": pred["confidence"],
                 "source": "geographic_" + pred["source"]})
