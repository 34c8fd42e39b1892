"""Process-bridge CLI: one command in argv, ONE JSON line on stdout.

Parity surface for the reference's ``api/python/extract.py`` (S4/S6 in
SURVEY.md §2): its Node bridge (``api/node/index.ts:507-547``) spawns a
Python subprocess per call and parses the single JSON line the script
prints — any such caller can point at this module instead::

    python -m ai_bangladesh_address_parser_ray.bridge extract "House 12, Dhanmondi, Dhaka" [--detailed] [--thresholds '{"area":0.5}']
    python -m ai_bangladesh_address_parser_ray.bridge validate "..." [--required area,district]
    python -m ai_bangladesh_address_parser_ray.bridge format "..." [--style full|short|postal|minimal] [--separator ", "] [--no-postal]
    python -m ai_bangladesh_address_parser_ray.bridge compare "addr1" "addr2"
    python -m ai_bangladesh_address_parser_ray.bridge suggest "dhanmond" [--limit 5]
    python -m ai_bangladesh_address_parser_ray.bridge enrich "..."
    python -m ai_bangladesh_address_parser_ray.bridge statistics '["a1","a2"]'   # or JSON array on stdin

Contract notes, mirrored from the reference (``extract.py:96-244``):
stray prints are redirected to stderr while the kernel runs; errors come
back as a JSON object with an ``error`` key and exit code 1; ``statistics``
reads a JSON array from argv or stdin (S6). Everything runs in-process on
the pure kernel — no Ray session (process-per-call must not pay cluster
spin-up; batch workloads belong to ``__main__ --batch``/``--linkage``).
"""

from __future__ import annotations

import json
import sys
from typing import Dict, List, Optional


def _flag_value(argv: List[str], flag: str) -> Optional[str]:
    if flag in argv:
        i = argv.index(flag)
        if i + 1 < len(argv):
            return argv[i + 1]
    return None


def _extract_output(address: str, detailed: bool,
                    thresholds: Optional[Dict] = None) -> Dict:
    from .kernel.extract import ExtractionKernel, extract
    if thresholds:
        res = ExtractionKernel(thresholds=thresholds).extract(
            address, detailed=detailed)
    else:
        res = extract(address, detailed=detailed)
    out = {
        "components": res.get("components", {}),
        "overall_confidence": res.get("overall_confidence", 0.0),
        "extraction_time_ms": res.get("extraction_time_ms", 0),
        "normalized_address": res.get("normalized_address", ""),
        "original_address": address,
    }
    if detailed and "metadata" in res:
        out["metadata"] = res["metadata"]
    return out


def _validate(address: str, required: Optional[List[str]]) -> Dict:
    from .kernel.extract import extract
    from .kernel.validate_format import validate_address
    comps = extract(address)["components"]
    out = validate_address(comps)
    if required:
        missing_required = [f for f in required
                            if not str(comps.get(f) or "").strip()]
        out["missing_required"] = missing_required
        out["is_valid"] = out["is_valid"] and not missing_required
    out["components"] = comps
    return out


def _format(address: str, style: str, separator: str,
            include_postal: bool) -> Dict:
    from .kernel.extract import extract
    from .kernel.validate_format import format_address
    comps = extract(address)["components"]
    return {"formatted": format_address(comps, style, separator,
                                        include_postal)}


def _compare(a1: str, a2: str) -> Dict:
    from .kernel.compare import score_pair
    from .kernel.extract import extract
    c1 = extract(a1)["components"]
    c2 = extract(a2)["components"]
    return score_pair(c1, c2)


def _suggest(query: str, limit: int) -> Dict:
    from .kernel.validate_format import suggest_areas
    return {"suggestions": suggest_areas(query, limit)}


def _enrich(address: str) -> Dict:
    """Extraction + geo hierarchy for the resolved location (reference
    ``enrich``: gazetteer + offline-geo lookups around one address)."""
    from .kernel.extract import extract
    from .kernel.geo import default_geo
    comps = extract(address)["components"]
    geo = default_geo()
    out: Dict = {"components": comps}
    postal = str(comps.get("postal_code") or "").strip()
    if postal:
        out["hierarchy"] = geo.get_full_hierarchy(postal)
    out["location_valid"] = geo.validate_location(
        area=comps.get("area"), district=comps.get("district"),
        division=comps.get("division"))
    return out


def _statistics(addresses: List[str]) -> Dict:
    """Corpus stats over a SMALL JSON list (the reference's stdin surface
    is process-per-call; corpus-scale stats belong to the Ray pipeline,
    ``stages/postprocess.py``)."""
    from collections import Counter

    from .kernel.extract import extract
    from .kernel.validate_format import FIELDS, validate_address
    n = len(addresses)
    missing = Counter()
    districts = Counter()
    areas = Counter()
    comp_sum = 0.0
    conf_sum = 0.0
    for a in addresses:
        res = extract(a or "")
        comps = res["components"]
        v = validate_address(comps)
        comp_sum += v["completeness"]
        conf_sum += res.get("overall_confidence", 0.0)
        for f in v["missing"]:
            missing[f] += 1
        if comps.get("district"):
            districts[comps["district"]] += 1
        if comps.get("area"):
            areas[comps["area"]] += 1
    return {
        "n_addresses": n,
        "mean_completeness": round(comp_sum / n, 4) if n else 0.0,
        "mean_confidence": round(conf_sum / n, 4) if n else 0.0,
        "missing_counts": {f: missing.get(f, 0) for f in FIELDS},
        "top_districts": districts.most_common(10),
        "top_areas": areas.most_common(20),
    }


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(json.dumps({"error": "No command provided", "components": {},
                          "overall_confidence": 0.0}))
        return 1
    command = argv[0]
    thresholds = None
    tj = _flag_value(argv, "--thresholds")
    if tj:
        try:
            thresholds = json.loads(tj)
        except json.JSONDecodeError:
            thresholds = None

    old_stdout = sys.stdout
    sys.stdout = sys.stderr        # stray prints must not corrupt the line
    try:
        value_flags = {"--thresholds", "--required", "--style",
                       "--separator", "--limit"}
        pos, skip = [], False
        for a in argv[1:]:
            if skip:
                skip = False
            elif a in value_flags:
                skip = True
            elif not a.startswith("--"):
                pos.append(a)
        if command == "extract":
            out = _extract_output(pos[0] if pos else "",
                                  "--detailed" in argv, thresholds)
        elif command == "validate":
            req = _flag_value(argv, "--required")
            out = _validate(pos[0] if pos else "",
                            req.split(",") if req else None)
        elif command == "format":
            out = _format(pos[0] if pos else "",
                          _flag_value(argv, "--style") or "full",
                          _flag_value(argv, "--separator") or ", ",
                          "--no-postal" not in argv)
        elif command == "compare":
            out = _compare(pos[0] if len(pos) > 0 else "",
                           pos[1] if len(pos) > 1 else "")
        elif command == "suggest":
            out = _suggest(pos[0] if pos else "",
                           int(_flag_value(argv, "--limit") or 5))
        elif command == "enrich":
            out = _enrich(pos[0] if pos else "")
        elif command == "statistics":
            if pos:
                addresses = json.loads(pos[0])
            else:
                data = sys.stdin.read()
                addresses = json.loads(data) if data.strip() else []
            out = {"statistics": _statistics(addresses)}
        else:
            # backward-compat: bare address means extract (reference :215)
            out = _extract_output(command, "--detailed" in argv, thresholds)
    except Exception as e:   # noqa: BLE001 — bridge contract: error as JSON
        sys.stdout = old_stdout
        print(json.dumps({"error": str(e), "components": {},
                          "overall_confidence": 0.0,
                          "original_address": argv[1] if len(argv) > 1
                          else ""}, ensure_ascii=False))
        return 1
    finally:
        sys.stdout = old_stdout

    print(json.dumps(out, ensure_ascii=False, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
