"""Geo hierarchy engine goldens: prediction priority order, district veto,
deterministic tie-break, reverse hierarchy, consistency validation, and the
proactive scan feeding extraction (reference parity:
``/root/reference/src/geo/bangladesh_geo_offline.py:221-393``,
``src/core/stages/geographic_validator.py:37-229``)."""

import pytest

from ai_bangladesh_address_parser_ray.kernel.geo import (
    GeoHierarchy, UPAZILAS, default_geo, geo_enrich)
from ai_bangladesh_address_parser_ray.kernel.extract import ExtractionKernel


@pytest.fixture(scope="module")
def geo():
    return default_geo()


class TestPredictPostal:
    def test_priority1_upazila(self, geo):
        r = geo.predict_postal_code(area="Savar")
        assert (r["postal_code"], r["confidence"], r["source"]) == \
            ("1340", 0.95, "upazila_match")

    def test_priority2_union(self, geo):
        r = geo.predict_postal_code(area="Ashulia")
        assert (r["postal_code"], r["confidence"], r["source"]) == \
            ("1340", 0.90, "union_match")

    def test_priority3_village(self, geo):
        r = geo.predict_postal_code(area="Genda")
        assert (r["postal_code"], r["confidence"], r["source"]) == \
            ("1340", 0.85, "village_match")

    def test_priority4_post_office(self, geo):
        r = geo.predict_postal_code(area="Savar Cantonment")
        assert (r["postal_code"], r["confidence"], r["source"]) == \
            ("1344", 0.80, "post_office_match")

    def test_priority5_fuzzy_containment(self, geo):
        # "savar bazar" contains "savar" -> fuzzy, 0.70
        r = geo.predict_postal_code(area="savar bazar stand")
        assert r["confidence"] == 0.70
        assert r["source"] == "fuzzy_area_match"
        assert r["postal_code"] == "1340"

    def test_priority6_district_min_sorted_tiebreak(self, geo):
        r = geo.predict_postal_code(district="Dhaka")
        expected = sorted(geo.district_to_postals["dhaka"])[0]
        assert (r["postal_code"], r["confidence"], r["source"]) == \
            (expected, 0.60, "district_inference")

    def test_district_veto_falls_through(self, geo):
        # Savar is a Dhaka upazila; asking with district=Chattogram must
        # VETO priority 1 and fall through to district-level inference
        r = geo.predict_postal_code(area="Savar", district="Chattogram")
        assert r["source"] == "district_inference"
        assert r["postal_code"] == \
            sorted(geo.district_to_postals["chattogram"])[0]

    def test_unknown_everything_none(self, geo):
        assert geo.predict_postal_code(area="xyzzy",
                                       district="Atlantis") is None

    def test_deterministic(self, geo):
        a = geo.predict_postal_code(area="savar bazar")
        b = GeoHierarchy().predict_postal_code(area="savar bazar")
        assert a == b


class TestHierarchyLookups:
    def test_full_hierarchy_roundtrip(self, geo):
        h = geo.get_full_hierarchy("1340")
        assert h["upazila"] == "Savar"
        assert h["district"] == "Dhaka" and h["division"] == "Dhaka"
        assert "Ashulia" in h["unions"]

    def test_unknown_postal(self, geo):
        assert geo.get_full_hierarchy("0000") is None

    def test_validate_postal_district_conflict(self, geo):
        v = geo.validate_location(postal_code="1340", district="Sylhet")
        assert not v["valid"]
        assert v["suggestions"]["district"] == "Dhaka"

    def test_validate_district_division_conflict(self, geo):
        v = geo.validate_location(district="Comilla", division="Dhaka")
        assert not v["valid"]
        assert v["suggestions"]["division"] == "Chattogram"

    def test_validate_consistent(self, geo):
        v = geo.validate_location(postal_code="4310", district="Chattogram",
                                  division="Chattogram")
        assert v["valid"] and not v["conflicts"]


class TestGeoEnrich:
    def test_proactive_upazila_scan(self):
        ev = {"area": [], "district": [], "division": [], "postal_code": []}
        geo_enrich(ev, "House 12, Savar, Dhaka")
        areas = {e["value"]: e for e in ev["area"]}
        assert "Savar" in areas
        assert areas["Savar"]["source"] == "geographic_upazila_extraction"
        assert ev["district"][0]["value"] == "Dhaka"
        assert ev["district"][0]["confidence"] == 0.95

    def test_union_scan_lower_confidence(self):
        ev = {"area": [], "district": [], "division": [], "postal_code": []}
        geo_enrich(ev, "Road 3, Ashulia")
        assert ev["area"][0]["source"] == "geographic_union_extraction"
        assert ev["area"][0]["confidence"] == 0.85

    def test_postal_prediction_gate(self):
        # prediction below 0.80 confidence (district inference 0.60) must
        # NOT be added (geographic_validator.py:130 gate)
        ev = {"area": [], "district": [{"value": "Dhaka",
                                        "confidence": 0.9,
                                        "source": "regex"}],
              "division": [], "postal_code": []}
        geo_enrich(ev, "somewhere in dhaka")
        assert ev["postal_code"] == []

    def test_division_from_district(self):
        ev = {"area": [], "postal_code": [],
              "district": [{"value": "Comilla", "confidence": 0.9,
                            "source": "regex"}], "division": []}
        geo_enrich(ev, "daulatpur comilla")
        assert any(e["value"] == "Chattogram"
                   and e["source"] == "geographic_inferred_from_district"
                   for e in ev["division"])

    def test_no_scan_when_area_present(self):
        ev = {"area": [{"value": "Mirpur", "confidence": 0.9,
                        "source": "regex"}],
              "district": [], "division": [], "postal_code": []}
        geo_enrich(ev, "mirpur savar whatever")
        assert len(ev["area"]) == 1     # scan skipped


class TestKernelGeoStage:
    def test_upazila_address_extracts_geo_fields(self):
        k = ExtractionKernel()
        out = k.extract("House 5, Road 2, Savar, Dhaka")
        c = out["components"]
        assert c["area"] == "Savar"
        assert c["district"] == "Dhaka"
        assert c["postal_code"] == "1340"

    def test_geo_stage_toggle_off(self):
        k_on = ExtractionKernel()
        assert k_on.extract("Gafargaon Bazar")["components"]["area"] \
            == "Gafargaon"
        k_off = ExtractionKernel(stages={"geo": False})
        assert k_off.extract("Gafargaon Bazar")["components"]["area"] == ""

    def test_pluggable_ner_model_slot(self):
        class FakeNER:
            def predict(self, text):
                return {"area": ("Gulshan", 0.85)} \
                    if "gulshan" in text.lower() else {}

        k = ExtractionKernel(ner_model=FakeNER())
        out = k.extract("some text near gulshan circle",
                        detailed=True)
        assert out["components"]["area"] == "Gulshan"
        det = out["metadata"]["component_details"]["area"]
        assert det["source"] in ("spacy_ner", "gazetteer_validated",
                                 "inferred_from_area", "regex")


class TestLoadHierarchyAndSkeleton:
    def test_load_hierarchy_external_dict(self):
        from ai_bangladesh_address_parser_ray.kernel.geo import (
            load_hierarchy,
        )
        geo = load_hierarchy({
            "upazilas": {"Newtown": ("Testdist", "Testdiv", "4242")},
            "post_offices": {"NT GPO": ("Testdist", "4240")},
        })
        # external layer replaces the fixture layer
        assert "savar" not in geo.upazilas
        p = geo.predict_postal_code(area="newtown")
        assert p["postal_code"] == "4242" and p["source"] == "upazila_match"
        # omitted layers fall back to the fixture
        assert "ashulia" in geo.unions
        # district veto still applies
        assert geo.predict_postal_code(
            area="newtown", district="Otherdist") is None

    def test_skeleton_widens_default_geo(self):
        from ai_bangladesh_address_parser_ray.kernel.geo import (
            GeoHierarchy,
        )
        g = GeoHierarchy()
        assert len(g.upazilas) > 500          # curated + skeleton + asset
        assert len(g.unions) > 1500           # bundled full-scale asset
        # skeleton entry widened by the asset: district/division autofill
        # AND the real postal code (asset fills codes when the district
        # reading agrees — no fabrication, the code comes from the data)
        d, v, code = g.upazilas["sreemangal"]
        assert (d, v, code) == ("Moulvibazar", "Sylhet", "3211")
        hit = g.scan_address("meet me at sreemangal next week")
        assert hit["district"] == "Moulvibazar"
        p = g.predict_postal_code(area="sreemangal", district="moulvibazar")
        assert p["postal_code"] == "3211" and p["source"] == "upazila_match"

    def test_asset_union_scan_and_postal(self):
        from ai_bangladesh_address_parser_ray.kernel.geo import (
            GeoHierarchy,
        )
        g = GeoHierarchy()
        # asset-only union (suffix-stripped from "salimpur union")
        hit = g.scan_address("going to salimpur next week")
        assert hit and hit["kind"] == "union"
        # gazetteer-area collisions stay guarded: mirpur is the Dhaka
        # area, never the Kushtia upazila
        assert g.scan_address("mirpur 10, dhaka") is None
        assert "mirpur" not in g.upazilas

    def test_scan_respects_word_boundaries(self):
        from ai_bangladesh_address_parser_ray.kernel.geo import (
            GeoHierarchy,
        )
        g = GeoHierarchy()
        # "tala" (Satkhira) must not fire inside "zigatala" / "panorama"
        assert g.scan_address("what a panorama view") is None
        assert g.scan_address("talat said hello") is None
        assert g.scan_address("the office in tala is closed")["name"] == \
            "tala"

    def test_area_collisions_keep_metropolitan_reading(self):
        from ai_bangladesh_address_parser_ray.kernel.geo import (
            GeoHierarchy,
        )
        g = GeoHierarchy()
        # Kushtia has a Mirpur upazila; the gazetteer area wins -> the
        # skeleton must NOT have inserted it
        assert "mirpur" not in g.upazilas
        assert "mohammadpur" not in g.upazilas
