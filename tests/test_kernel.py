"""Unit tests for the pure-Python kernel (no Ray)."""

import pyarrow as pa
import pytest

from ai_bangladesh_address_parser_ray.kernel.normalizer import (
    normalize, normalize_array,
)
from ai_bangladesh_address_parser_ray.kernel.extract import extract
from ai_bangladesh_address_parser_ray.kernel.fsm import fsm_parse
from ai_bangladesh_address_parser_ray.kernel.resolver import resolve
from ai_bangladesh_address_parser_ray.kernel.compare import (
    compare_components, score_pair, jaro_winkler, levenshtein, token_jaccard,
)
from ai_bangladesh_address_parser_ray.kernel.phonetic import (
    soundex, minhash_band_keys,
)
from ai_bangladesh_address_parser_ray.kernel.validate_format import (
    validate_address, format_address, suggest_areas,
)

SMOKE = [
    "105/A, Central Road, gulisthan, Dhaka",
    "House 12, Road 5, Mirpur 1, Dhaka",
    "Flat A-3, Building 7, Bashundhara R/A, Dhaka",
    "Banani, Dhaka",
    "Gulshan 2, Dhaka",
    "Dhanmondi 15, Dhaka",
    '1152/C "Greenhouse", House# 45, Road# 08, Shapla Residential Area, '
    "Halishahar, Chittagong-4219",
    "101/1 west monipur House name- Dream house, 60 feet road, 4th floor, "
    "flat- D2, Mirpur-2, Dhaka-1216",
    "1/4, South Begun Bari (Master Bari), Tejgaon I/A, Tejgaon, Dhaka -1208. "
    "(Near Satrasta)",
    "৬ রোড, ৯ ব্লক, C, চন্দ্রিমা মডেল টাউন, মোহাম্মদপুর, ঢাকা।",
    "৫৬ জিগাতলা, হাজী আবদুর রহমান লেন, ধানমন্ডি, ঢাকা-১২০৯",
    "sottota tower, h107/2,Road 7, zigatola",
    "Uttara, Sector 11, Road 13A, House 1, Floor 7B",
]


class TestNormalizer:
    def test_bangla_numerals(self):
        assert normalize("৫৬ জিগাতলা") == "56 Jigatola"

    def test_keywords_and_places(self):
        assert normalize("রোড ৭, ঢাকা") == "Road 7, Dhaka"

    def test_corrections_word_boundary(self):
        assert normalize("chittagong") == "Chattogram"
        assert normalize("raod 5") == "Road 5"
        # no mid-word replacement
        assert "Chattogram" not in normalize("ctgx")

    def test_hash_and_colon(self):
        assert normalize("House# 45: Road") == "House No 45 Road"

    def test_quotes_and_whitespace(self):
        assert normalize('1152/C "Greenhouse" ,  Dhaka') == "1152/C Greenhouse, Dhaka"

    def test_empty(self):
        assert normalize("") == ""

    def test_vectorized_matches_scalar(self):
        arr = pa.array(SMOKE + ["", "no address here", "H#1: x,y"])
        vec = normalize_array(arr).to_pylist()
        assert vec == [normalize(t) for t in arr.to_pylist()]


class TestExtractors:
    def test_canonical(self):
        c = extract("House 12, Road 5, Mirpur, Dhaka-1216")["components"]
        assert c["house_number"] == "12"
        assert c["road"] == "5"
        assert c["area"] == "Mirpur"
        assert c["district"] == "Dhaka"
        assert c["division"] == "Dhaka"
        assert c["postal_code"] == "1216"

    def test_compact(self):
        c = extract("H-12, R-5, mirpur, dhaka")["components"]
        assert c["house_number"] == "12"
        assert c["road"] == "5"
        assert c["area"] == "Mirpur"

    def test_literal_gates_are_implied_by_their_patterns(self):
        # the prefilter invariant: wherever a bank pattern matches a real
        # string, its gate must pass — checked over the reference corpus
        # plus adversarial synthetics, so a wrong gate cannot silently
        # disable a pattern
        import json
        from ai_bangladesh_address_parser_ray.kernel import extractors as X
        from ai_bangladesh_address_parser_ray.kernel.normalizer import (
            normalize)
        ref = json.load(open(
            "/root/reference/data/raw/merged_addresses.json"))
        texts = [normalize(r.get("address") or "") for r in ref]
        texts += ["House No 1", "Holding 2", "Bldg 3", "Plot 4", "Kha-5",
                  "H 6", "7 No Basha", "8 Bhaban", "Mahal 9", "10-storey",
                  "AB-C/11", "U No 12", "Flat 1", "Apt 2", "Unit 3",
                  "Floor, 4B", "x (D5)", "Lift 6", "7th Floor", "Level 8",
                  "9 tola", "Block A", "Sector 10", "B Block"]
        banks = [
            ([(rx, g) for (rx, _c, g) in X._HOUSE_BANK], None),
            (list(zip([rx for rx, _ in X._FLAT_PATTERNS], X._FLAT_GATES)),
             None),
            (list(zip([rx for rx, _ in X._FLOOR_PATTERNS], X._FLOOR_GATES)),
             None),
            (list(zip([rx for rx, _ in X._BLOCK_PATTERNS], X._BLOCK_GATES)),
             None),
        ]
        # area/road inline gates (ADVICE r4: the 'P.S.' form was silently
        # disabled because 'p.s.' contains no 'ps' substring) — probe the
        # exact surface forms each alternative can produce
        texts += ["House 5, P.S. Shibaloy, Manikganj", "PS Double Mooring",
                  "Thana Gandaria", "Gandaria Thana", "Dhaka Cantt",
                  "Old Dhaka", "Puran Dhaka", "Gulshan R/A", "Lane No 4",
                  "Nasirabad Residential Area", "Village Charan",
                  "Gram Charan", "Comilla Sadar", "1st Lane", "60 Feet",
                  "Avenue 5", "Road No 8", "2 No Goli", "Line No 16",
                  "Kalabagan 1st Len", "Mirpur Road", "Agrabad Avenue",
                  "North Goli", "Station Street"]
        for rx, gate in X.inline_gate_table():
            banks.append(([(rx, gate)], None))
        for bank, _ in banks:
            for rx, gate in bank:
                if gate is None:
                    continue
                for t in texts:
                    if rx.search(t):
                        low = t.lower()
                        assert any(g in low for g in gate), \
                            (rx.pattern[:60], gate, t[:80])

    def test_literal_gates_keep_keywordless_forms(self):
        # the literal prefilters must not silence forms whose bank entry
        # has no gate: single-letter H/R markers, banglish prefixes, and
        # positional flat/parenthetical forms gated on other keywords
        c = extract("H 12, R 5, Mirpur, Dhaka")["components"]
        assert c["house_number"] == "12" and c["road"] == "5"
        c = extract("Kha-32/1, Mirpur, Dhaka")["components"]
        assert c["house_number"] == "Kha-32/1"
        c = extract("3rd Floor, 6B, Banani, Dhaka")["components"]
        assert c["flat_number"] == "6B"           # gate is floor/level
        c = extract("House No. 586/1 (D1), Banani, Dhaka")["components"]
        assert c["flat_number"] == "D1"           # gate is the paren
        c = extract("12-Storey Building, Motijheel, Dhaka")["components"]
        assert c["house_number"] == "12-Storey"   # storey/tala gate

    def test_hash_notation(self):
        c = extract("House# 45, Road# 08, Halishahar, Chittagong-4219")["components"]
        assert c["house_number"] == "45"
        assert c["road"] == "08"
        assert c["district"] == "Chattogram"
        assert c["postal_code"] == "4219"

    def test_bangla(self):
        c = extract("বাড়ি ৫৬, রোড ৭, ধানমন্ডি, ঢাকা-১২০৯")["components"]
        assert c["house_number"] == "56"
        assert c["road"] == "7"
        assert c["area"] == "Dhanmondi"
        assert c["postal_code"] == "1209"

    def test_typos(self):
        c = extract("Hose 12, Raod 5, mirpoor, daka")["components"]
        assert c["house_number"] == "12"
        assert c["road"] == "5"
        assert c["area"] == "Mirpur"
        assert c["district"] == "Dhaka"

    def test_banglish_house_prefixes(self):
        """Reference house_number_processor.py:131-137 Banglish forms."""
        for text, want in [
            ("Kha/50, Road 3, Mirpur, Dhaka", "Kha/50"),
            ("Kha-32/1, Mirpur, Dhaka-1216", "Kha-32/1"),
            ("CHO 55/A, Banani, Dhaka", "CHO 55/A"),
            ("Ga/7, Road 2, Uttara, Dhaka", "Ga/7"),
        ]:
            c = extract(text)["components"]
            assert c["house_number"].lower() == want.lower(), text

    def test_plot_building_holding(self):
        for text, want in [
            ("Plot No. 8, Gulshan, Dhaka", "8"),
            ("Plot-62, Tejgaon, Dhaka", "62"),
            ("Building 9, Uttara, Dhaka", "9"),
            ("Holding No: 228/B, Khilgaon, Dhaka", "228/B"),
        ]:
            assert extract(text)["components"]["house_number"] == want, text

    def test_house_ranges_and_at(self):
        assert extract("House 8+9, Road 2, Banani")["components"][
            "house_number"] == "8+9"
        assert extract("House 98-99, Tejgaon, Dhaka")["components"][
            "house_number"] == "98-99"
        assert extract("H@45, Road 7, Mirpur")["components"][
            "house_number"] == "45"

    def test_letter_valued_house(self):
        """Reference house_number_processor.py:194-205 letter-valued forms."""
        for text, want in [
            ("House No. F/30, Dhanmondi, Dhaka", "F/30"),
            ("House C/36, Road 5, Gulshan", "C/36"),
            ("House J57, Banani, Dhaka-1213", "J57"),
        ]:
            assert extract(text)["components"]["house_number"] == want, text

    def test_house_combo_and_reversed(self):
        """Reference :181 combo and :228-231 reversed `N no house` forms."""
        for text, want in [
            ("House 60 Kha 7, Mirpur, Dhaka", "60 Kha 7"),
            ("12 no house, Rampura, Dhaka", "12"),
            ("3/B no basa, Khilgaon, Dhaka", "3/B"),
            ("Mahol-14, Lalbagh, Dhaka", "14"),
        ]:
            assert extract(text)["components"]["house_number"] == want, text

    def test_standalone_compound_positional(self):
        """Reference :264-281 bare compound numbers, with the structural
        left-context veto (Road/Flat own their numbers)."""
        for text, want in [
            ("9/2(a), Shantinagar, Dhaka-1217", "9/2(a)"),
            ("Mr Rahim, 345/3-5, Azimpur Road, Dhaka", "345/3-5"),
            ("27/A/1, Wari, Dhaka", "27/A/1"),
        ]:
            assert extract(text)["components"]["house_number"] == want, text
        for text in ["Road 24/3, Banani, Dhaka", "Flat 4/B, Gulshan, Dhaka"]:
            assert not extract(text)["components"].get("house_number"), text

    def test_line_avenue_ordinal_lane_roads(self):
        """Reference road_processor.py:149-157 Line/Avenue/ordinal forms."""
        for text, want in [
            ("Line #16, Tejgaon, Dhaka", "16"),
            ("Line-16, Tejgaon, Dhaka", "16"),
            ("Baker 2nd Lane, Chawkbazar, Chittagong", "2nd Lane"),
            ("Avenue 2, Mirpur, Dhaka", "2"),
            ("Road-N05, Sector 7, Uttara, Dhaka", "N05"),
        ]:
            assert extract(text)["components"]["road"] == want, text

    def test_h_hash_letter_prefix(self):
        # "H# CB 11/12" normalizes to "H No CB 11/12"
        c = extract("H# CB 11/12, Agrabad, Chattogram")["components"]
        assert c["house_number"] == "CB 11/12"

    def test_road_goli_guard(self):
        """'2 No Road' names a road, never a house (reference
        _is_road_goli_number, house_number_processor.py:404-447)."""
        c = extract("2 No Road, Gulshan, Dhaka")["components"]
        assert c["house_number"] == ""
        assert c["road"] == "2"
        c2 = extract("6 No Goli, Khilgaon, Dhaka")["components"]
        assert c2["house_number"] == ""
        assert c2["road"] == "6"

    def test_institutional_guard(self):
        c = extract("Dhaka Medical College Hospital Ward 12, Dhaka")[
            "components"]
        assert c["house_number"] == ""

    def test_phone_not_house(self):
        c = extract("Call 01712345678 for delivery to Banani")["components"]
        assert c["house_number"] == ""

    def test_bangla_goli_becomes_lane(self):
        # রোড/লেন/গলি road forms arrive post-normalization as Road/Lane
        c = extract("বাড়ি ১২, গলি ৩, মিরপুর, ঢাকা")["components"]
        assert c["house_number"] == "12"
        assert c["road"] == "3"

    def test_fuzzy_area_variant(self):
        c = extract("105/A, Central Road, gulisthan, Dhaka")["components"]
        assert c["area"] == "Gulshan"

    def test_flat_floor_block(self):
        c = extract("Flat A-3, 4th floor, Block C, Banani, Dhaka")["components"]
        assert c["flat_number"] == "A-3"
        assert c["floor_number"] == "4"
        assert c["block_number"] == "C"

    def test_house_not_postal(self):
        # H-prefixed 4-digit numbers are houses, never postal codes
        c = extract("H-4192, R-1, agrabad, chattogram")["components"]
        assert c["house_number"] == "4192"
        assert c["postal_code"] == "4100"  # gazetteer-predicted for Agrabad

    def test_bangla_ordinal_floor(self):
        # ৫ম/৩য়/৪র্থ ordinals survive normalization as a Bangla suffix
        # glued to the ASCII digit; তলায় is the locative of তলা
        c = extract("বাড়ি নং ৩৭, ৫ম তলা, রোড নং ১৪, উত্তরা, ঢাকা")["components"]
        assert c["floor_number"] == "5"
        c = extract("কন্সট্রাকশন বিল্ডিং এর ৪র্থ তলায়")["components"]
        assert c["floor_number"] == "4"

    def test_bangla_block_letter(self):
        # "ব্লক - চ" maps to the Banglish letter name, and the explicit
        # marker outranks a nearby house compound's digits
        c = extract("৫৭/৫৮ ব্লক - চ, মিরপুর, ঢাকা- ১২১৬")["components"]
        assert c["block_number"] == "Cha"
        assert c["house_number"] == "57/58"

    def test_truncated_dhak_district(self):
        # the reference handles the incomplete "ঢাক" typo explicitly
        c = extract("মানডা মুগদা হিরো মিয়া রোড, ঢাক")["components"]
        assert c["district"] == "Dhaka"
        assert c["division"] == "Dhaka"

    def test_jashore_surface_preserved(self):
        # english_cities carries BOTH spellings and returns the matched one
        assert extract("Chowgachha, Jashore")["components"]["district"] \
            == "Jashore"
        assert extract("Chowgachha, Jessore")["components"]["district"] \
            == "Jessore"

    def test_postal_city_before(self):
        # city-space-postal mid-string: district name right BEFORE the code
        c = extract("Hori Charan Roy Road, Gendaria Thana, Dhaka 1204, "
                    "Civil Chowdhury Vila 3-C")["components"]
        assert c["postal_code"] == "1204"

    def test_storey_building_house(self):
        c = extract("2nd 12-Storey Govt Office Building, 10th Floor, "
                    "Segunbagicha, Dhaka")["components"]
        assert c["house_number"] == "12-Storey"
        assert c["floor_number"] == "10"

    def test_feet_road_last_resort_house(self):
        # with no other candidate the feet number is the house id...
        c = extract("Madani Avenue, 100 Feet Road, Vatara, Dhaka 1212")
        assert c["components"]["house_number"] == "100"
        # ...but any competing candidate keeps it with the road
        c = extract("House Number 47, 60 Feet, Mirpur")["components"]
        assert c["house_number"] == "47"

    def test_area_last_segment_fallback(self):
        # when every area bank misses, the last clean comma-segment wins
        # (reference intelligent score); structural segments are skipped
        c = extract("Dhaka, Kamrangir Char er pasa, Jawlahati more, "
                    "Zamzam Tower")["components"]
        assert c["area"] == "Zamzam Tower"

    def test_fallback_silent_on_conversational_filler(self):
        # the segment fallback must not invent localities on non-address
        # turns: all-lowercase filler stays component-free
        for filler in ("it about me thanks that",
                       "status are job me nominal",
                       "you details share we thanks, issue finished okay"):
            comp = extract(filler)["components"]
            assert not any(comp.values()), (filler, comp)

    def test_postal_inferred_from_area(self):
        c = extract("Banani, Dhaka")["components"]
        assert c["postal_code"] == "1213"

    def test_cantonment_outranks_sublocality(self):
        # "<City> Cantonment" is thana-level; the labeled corpus prefers it
        # over a sub-locality even when that one sits before the city token
        c = extract("77/2/E, Green House, West Vashantek, "
                    "Dhaka Cantonment, Dhaka-1206")["components"]
        assert c["area"] == "Dhaka Cantonment"

    def test_area_with_number_bonus(self):
        # "Mirpur 60 feet": the trailing small number marks the area usage
        # (reference intelligent-score Factor 5) — outranks a bare
        # directional sub-locality earlier in the text
        c = extract("363/A/10, North Pirerbag, Mirpur 60 feet, "
                    "Sapra Mosjid")["components"]
        assert c["area"] == "Mirpur"

    def test_district_inferred_from_area(self):
        c = extract("House 3, Road 2, Halishahar")["components"]
        assert c["district"] == "Chattogram"
        assert c["division"] == "Chattogram"

    def test_no_entity(self):
        c = extract("okay thanks let me check that for you")["components"]
        assert not any(c.values())

    def test_deterministic(self):
        for t in SMOKE:
            assert extract(t) == extract(t)


class TestFSM:
    def test_first_match_semantics(self):
        c = fsm_parse("House No 12 Road No 5 Dhaka 1216")
        assert c["house_number"] == "12"
        assert c["road"] == "5"
        assert c["postal_code"] == "1216"

    def test_postal_position_gate(self):
        assert fsm_parse("1216 something very long after the number here")[
            "postal_code"] is None


class TestResolver:
    def test_consensus_bonus(self):
        out = resolve({"area": [
            {"value": "Mirpur", "confidence": 0.8, "source": "regex"},
            {"value": "Mirpur", "confidence": 0.9, "source": "fsm"},
        ]})
        r = out["area"]
        assert r["value"] == "Mirpur"
        assert r["confidence"] == pytest.approx(min(0.85 * 1.05, 0.99))
        assert r["source"] == "fsm"
        assert "conflict" not in r

    def test_conflict_weighted_vote_and_penalty(self):
        out = resolve({"district": [
            {"value": "Dhaka", "confidence": 0.9, "source": "regex"},
            {"value": "Khulna", "confidence": 0.95, "source": "unvalidated"},
        ]})
        r = out["district"]
        # regex: .9*1.0=.90 > unvalidated: .95*.6=.57
        assert r["value"] == "Dhaka"
        assert r["confidence"] == pytest.approx(0.9 * 0.9)
        assert r["conflict"] is True

    def test_postal_format_gate(self):
        out = resolve({"postal_code": [
            {"value": "12345", "confidence": 0.99, "source": "regex"}]})
        assert out["postal_code"] is None

    def test_threshold_rejection(self):
        out = resolve(
            {"area": [{"value": "X", "confidence": 0.5, "source": "regex"}]},
            {"area": 0.65})
        assert out["area"] is None

    def test_consensus_cap(self):
        out = resolve({"area": [
            {"value": "M", "confidence": 0.99, "source": "regex"},
            {"value": "M", "confidence": 0.99, "source": "fsm"},
        ]})
        assert out["area"]["confidence"] == 0.99


class TestCompare:
    def test_identical_match(self):
        c = extract(SMOKE[1])["components"]
        r = compare_components(c, c)
        assert r["match"] and r["score"] == 1.0

    def test_reference_weighted_shape(self):
        c1 = {"postal_code": "1216", "district": "Dhaka", "area": "Mirpur"}
        c2 = {"postal_code": "1216", "district": "Dhaka", "area": "Mirpur"}
        assert compare_components(c1, c2)["score"] == 1.0

    def test_different_entities_no_match(self):
        c1 = extract("House 12, Road 5, Mirpur, Dhaka-1216")["components"]
        c2 = extract("House 99, Road 8, Mirpur, Dhaka-1216")["components"]
        assert not score_pair(c1, c2)["match"]

    def test_identifier_exact_semantics(self):
        # '12' vs '120' is a DIFFERENT house: contributes 0.0, not a fuzzy 0.9
        c1 = {"house_number": "12", "road": "5", "area": "Mirpur",
              "district": "Dhaka", "postal_code": "1216"}
        c2 = dict(c1, house_number="120", road="51")
        s = score_pair(c1, c2)
        # postal+district+area agree (.75), house+road exact-mismatch (0)
        assert s["score"] == pytest.approx(0.75 / 0.95, abs=1e-3)
        assert not s["match"]

    def test_jaro_winkler_known_values(self):
        assert jaro_winkler("martha", "marhta") == pytest.approx(0.9611, abs=1e-3)
        assert jaro_winkler("abc", "abc") == 1.0
        assert jaro_winkler("abc", "xyz") == 0.0

    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3

    def test_token_jaccard(self):
        assert token_jaccard("a b c", "a b d") == pytest.approx(0.5)


class TestPhonetic:
    def test_soundex_classic(self):
        assert soundex("Robert") == "R163"
        assert soundex("Rupert") == "R163"
        assert soundex("Tymczak") == "T522"

    def test_soundex_collides_typos(self):
        assert soundex("gulshan") == soundex("gulisthan")[:4][:1] + soundex("gulshan")[1:]

    def test_minhash_deterministic_and_sensitive(self):
        t1 = ["12", "5", "mirpur", "dhaka", "1216"]
        assert minhash_band_keys(t1) == minhash_band_keys(t1)
        t2 = ["12", "5", "mirpur", "dhaka", "1216", "extra"]
        shared = set(minhash_band_keys(t1)) & set(minhash_band_keys(t2))
        assert shared  # high-Jaccard sets share >=1 band
        t3 = ["totally", "different", "tokens"]
        assert not set(minhash_band_keys(t1)) & set(minhash_band_keys(t3))


class TestValidateFormat:
    def test_validate(self):
        c = extract(SMOKE[1])["components"]
        v = validate_address(c)
        assert v["is_valid"]
        assert 0 < v["completeness"] <= 1
        assert v["score"] > 0.7

    def test_validate_missing_required(self):
        v = validate_address({"house_number": "5"})
        assert not v["is_valid"]
        assert "district" in v["missing"]

    def test_format_styles(self):
        c = {"house_number": "12", "road": "5", "area": "Mirpur",
             "district": "Dhaka", "postal_code": "1216"}
        assert format_address(c) == "House 12, Road 5, Mirpur, Dhaka-1216"
        assert format_address(c, style="short") == "H-12, R-5, Mirpur, Dhaka"
        assert format_address(c, style="postal") == "Mirpur, Dhaka, 1216"
        assert format_address(c, style="minimal") == "Mirpur, Dhaka"
        assert format_address(c, include_postal=False).endswith("Dhaka")

    def test_suggest(self):
        top = suggest_areas("guls", limit=3)
        assert top[0]["area"] == "Gulshan"
        assert len(top) == 3


class TestHotPathTwins:
    """The token-scan twins must match their regex oracles element-wise
    (the regexes stay as the spec; the scans are the hot-path form)."""

    def test_area_matches_equals_regex(self):
        from ai_bangladesh_address_parser_ray.kernel.extractors import (
            _AREA_RE, _area_matches,
        )
        corpus = [
            "House 12, Road 5, Mirpur, Dhaka",
            "Flat A4, aftab nagar, Banasree Rampura, Dhaka-1219",
            "meet me in old  dhaka tomorrow",       # double space: no match
            "Gulshan-2, lalkhan bazar, Chattogram",
            "zigatola; JIGATOLA. mirpur dohs",
            "no areas here at all",
            "xmirpur mirpurx mirpur",               # boundary cases
            "green road, elephant road",
            "",
        ]
        for text in corpus:
            want = [(m.start(1), m.end(1), m.group(1))
                    for m in _AREA_RE.finditer(text)]
            got = _area_matches(text)
            assert got == want, text

    def test_prescreen_superset_of_evidence(self):
        """Gate necessity: any text the kernel extracts SOMETHING from must
        pass the gate; pure filler must not."""
        from ai_bangladesh_address_parser_ray.kernel.extract import (
            extract, prescreen,
        )
        from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS
        evidence_texts = [
            "House 12, Road 5, Mirpur, Dhaka",
            "gulshann area please",              # fuzzy-matchable typo
            "Dhaka-1216",
            "ফ্ল্যাট নং এ ৫",
            "some building on Nuria Madrasha Road",
        ]
        for t in evidence_texts:
            assert prescreen(t), t
        fillers = [
            "ok sounds good, see you then",
            "can you email the notes",
            "we shipped the wrong wordy copy",   # 'rd' inside a word
        ]
        for t in fillers:
            assert not prescreen(t), t
            c = extract(t)["components"]
            assert all(c[f] == "" for f in COMPONENT_FIELDS), t

    def test_fuzzy_match_indexed_equals_full_scan(self):
        """The prefix+signature-indexed fuzzy matcher must equal the
        original full sorted scan on mutated tokens (same best, same
        tie-break)."""
        from difflib import SequenceMatcher
        from ai_bangladesh_address_parser_ray.kernel.gazetteer import (
            AREAS, AREA_VARIANTS, fuzzy_match_area,
        )

        def full_scan(token):
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
                ok = ov >= 0.75 and name[:4] == t[:4]
                if not ok and ov > 0.85:
                    ok = SequenceMatcher(None, t, name).ratio() >= 0.80
                if ok and ov > best_ov:
                    best_name, best_ov = name, ov
            return best_name

        toks = []
        for a in sorted(AREAS)[::3]:
            w = a.split()[0]
            toks += [w, w + "x", w[:-1] if len(w) > 4 else w, "x" + w,
                     w.replace("a", "e", 1), w[::-1]]
        toks += ["thanks", "works", "meeting", "yesterday", "gulshann",
                 "mirpurr", "dream", "sonargaon"]
        for t in toks:
            assert fuzzy_match_area(t) == full_scan(t), t
