"""Evidence-weighted conflict resolution (pipeline stage 8).

Decision semantics mirror the reference ConflictResolver
(``/root/reference/src/core/stages/conflict_resolver.py:33-125``):

- source-reliability weight table (regex 1.00 > *_validated 0.95 > fsm 0.90 >
  spacy_ner/gazetteer_corrected 0.85 > inferred_* 0.80 > unvalidated 0.60)
- postal codes hard-gated to the 4-digit shape before voting
- all evidence agrees  -> mean confidence x 1.05 consensus bonus, capped 0.99
- disagreement         -> argmax over sum(confidence x source_weight), then a
  x0.90 conflict penalty on the winner's best confidence
- per-component confidence thresholds reject low-confidence winners

Pure per-row reduce: evidence never crosses rows, so this runs entirely
inside the extraction UDF with no shuffle. Evidence ordering is fixed by
stage order (fsm, regex, gazetteer/geo) making argmax ties deterministic.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

SOURCE_WEIGHTS = {
    "regex": 1.00,
    "gazetteer_validated": 0.95,
    "geographic_validated": 0.95,
    "fsm": 0.90,
    "geographic_upazila_extraction": 0.90,
    "spacy_ner": 0.85,
    "gazetteer_corrected": 0.85,
    "geographic_union_extraction": 0.85,
    "inferred_from_area": 0.80,
    "inferred_from_district": 0.80,
    "geographic_inferred_from_area": 0.80,
    "geographic_inferred_from_upazila": 0.80,
    "geographic_inferred_from_union": 0.80,
    "geographic_inferred_from_district": 0.80,
    "unvalidated": 0.60,
}
DEFAULT_WEIGHT = 0.5

_POSTAL_RE = re.compile(r"^\d{4}$")


def resolve(
    evidence_map: Dict[str, List[dict]],
    thresholds: Optional[Dict[str, float]] = None,
) -> Dict[str, Optional[dict]]:
    """evidence_map: {component: [{value, confidence, source}, ...]}
    -> {component: {value, confidence, source, evidence_count, conflict?} | None}
    """
    thresholds = thresholds or {}
    resolved: Dict[str, Optional[dict]] = {}

    for component, evidences in evidence_map.items():
        evs = [e for e in (evidences or []) if e.get("value")]
        if component == "postal_code":
            evs = [e for e in evs if _POSTAL_RE.match(str(e["value"]).strip())]
        if not evs:
            resolved[component] = None
            continue

        values = {e["value"] for e in evs}
        threshold = thresholds.get(component, 0.0)

        if len(values) == 1:
            value = next(iter(values))
            avg = sum(e["confidence"] for e in evs) / len(evs)
            best_source = max(evs, key=lambda e: e["confidence"])["source"]
            conf = min(avg * 1.05, 0.99)
            if conf < threshold:
                resolved[component] = None
                continue
            resolved[component] = {
                "value": value, "confidence": conf, "source": best_source,
                "evidence_count": len(evs),
            }
        else:
            scores: Dict[str, float] = {}
            for e in evs:
                w = SOURCE_WEIGHTS.get(e["source"], DEFAULT_WEIGHT)
                scores[e["value"]] = scores.get(e["value"], 0.0) + e["confidence"] * w
            best_value = max(scores.items(), key=lambda kv: kv[1])[0]
            best_ev = max(
                (e for e in evs if e["value"] == best_value),
                key=lambda e: e["confidence"],
            )
            conf = best_ev["confidence"] * 0.90
            if conf < threshold:
                resolved[component] = None
                continue
            resolved[component] = {
                "value": best_value, "confidence": conf,
                "source": best_ev["source"], "evidence_count": len(evs),
                "conflict": True,
            }

    return resolved
