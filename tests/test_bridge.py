"""Bridge CLI contract tests (SURVEY S4/S6): one JSON line on stdout,
errors as JSON with exit 1, statistics from argv or stdin — the exact
protocol the reference's Node bridge (`api/node/index.ts:507-547`) parses
from its spawned Python subprocess (`api/python/extract.py:96-244`)."""

import json
import subprocess
import sys

BRIDGE = [sys.executable, "-m", "ai_bangladesh_address_parser_ray.bridge"]


def _run(args, stdin=None):
    p = subprocess.run(BRIDGE + args, input=stdin, capture_output=True,
                       text=True, timeout=120)
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE json line, got: {p.stdout!r}"
    return json.loads(lines[0]), p.returncode


class TestBridge:
    def test_extract(self):
        out, rc = _run(["extract", "House 12, Road 5, Dhanmondi, Dhaka-1209"])
        assert rc == 0
        assert out["components"]["area"] == "Dhanmondi"
        assert out["components"]["postal_code"] == "1209"
        assert 0 < out["overall_confidence"] <= 1

    def test_bare_address_backcompat(self):
        out, rc = _run(["Banani, Dhaka"])
        assert rc == 0 and out["components"]["area"] == "Banani"

    def test_validate_with_required(self):
        out, rc = _run(["validate", "House 12, Dhanmondi",
                        "--required", "area,postal_code"])
        assert rc == 0
        assert out["is_valid"] is True and out["missing_required"] == []

    def test_format_styles(self):
        out, _ = _run(["format", "House 12, Road 5, Dhanmondi, Dhaka-1209",
                       "--style", "short"])
        assert out["formatted"] == "H-12, R-5, Dhanmondi, Dhaka"

    def test_compare(self):
        out, _ = _run(["compare", "House 12, Dhanmondi, Dhaka",
                       "H-12, Dhanmondi, Dhaka"])
        assert out["match"] is True and out["score"] == 1.0

    def test_suggest(self):
        out, _ = _run(["suggest", "dhanmond", "--limit", "3"])
        assert out["suggestions"][0]["area"] == "Dhanmondi"
        assert len(out["suggestions"]) == 3

    def test_statistics_stdin(self):
        addrs = json.dumps(["House 12, Dhanmondi, Dhaka",
                            "Gulshan 2, Dhaka-1212"])
        out, rc = _run(["statistics"], stdin=addrs)
        assert rc == 0
        s = out["statistics"]
        assert s["n_addresses"] == 2
        assert dict(s["top_districts"])["Dhaka"] == 2

    def test_statistics_argv(self):
        out, _ = _run(["statistics", json.dumps(["Banani, Dhaka"])])
        assert out["statistics"]["n_addresses"] == 1

    def test_error_is_json_exit_1(self):
        out, rc = _run(["statistics", "{not json"])
        assert rc == 1 and "error" in out

    def test_no_command(self):
        out, rc = _run([])
        assert rc == 1 and out["error"] == "No command provided"
