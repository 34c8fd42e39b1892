"""CLI entry (reference S3) and country-extraction (M7 CityResult parity)
tests — kernel-level paths that need no Ray session."""

import json

from ai_bangladesh_address_parser_ray.__main__ import main
from ai_bangladesh_address_parser_ray.kernel.extractors import extract_country


class TestCountry:
    def test_default_bangladesh(self):
        assert extract_country("House 12, Dhanmondi, Dhaka") == \
            ("Bangladesh", 0.95)

    def test_explicit_at_end_full_confidence(self):
        assert extract_country("House 12, Dhaka, Bangladesh") == \
            ("Bangladesh", 1.00)

    def test_explicit_last_segment(self):
        v, c = extract_country("House 12, Bangladesh, near the market")
        assert v == "Bangladesh" and c == 0.90

    def test_other_country(self):
        assert extract_country("MG Road, Bangalore, India")[0] == "India"

    def test_detailed_metadata_carries_country(self):
        from ai_bangladesh_address_parser_ray.kernel.extract import extract
        out = extract("House 4, Mirpur, Dhaka", detailed=True)
        assert out["metadata"]["country"]["value"] == "Bangladesh"


class TestCli:
    def test_address_json(self, capsys):
        rc = main(["--address", "House 12, Road 5, Dhanmondi, Dhaka-1209"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["components"]["house_number"] == "12"
        assert out["components"]["postal_code"] == "1209"

    def test_address_detailed(self, capsys):
        rc = main(["--address", "House 12, Dhanmondi", "--detailed"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert "metadata" in out and "country" in out["metadata"]

    def test_demo(self, capsys):
        assert main(["--demo"]) == 0
        assert capsys.readouterr().out.count('"components"') == 5
