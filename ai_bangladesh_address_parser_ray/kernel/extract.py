"""The fused 9-stage extraction kernel (pipeline stages 1-9 in one call).

Behavioral twin of the reference's ProductionAddressExtractor.extract
(``/root/reference/src/core/extractor.py:110-339``), with the stage fan-out
and evidence merge done in-process so evidence never leaves the task:

  1 script detect (metadata)       -> kernel.script_detect
  2 canonical normalize            -> kernel.normalizer
  3 FSM parse        (source fsm)  -> kernel.fsm
  4 regex extractors (source regex)-> kernel.extractors
  5 NER — pluggable model slot (see ``ner_model`` ctor arg): spaCy isn't in
    this environment, so the default is None; any object with a
    ``predict(texts) -> [ {component: (value, conf)} ]`` method plugs in
    (the reference's custom ``model_path`` surface, ``spacy_ner.py:27-47``).
  6 gazetteer validate/enrich      -> kernel.gazetteer
  7 geographic validator           -> kernel.geo (hierarchy + 6-priority
    postal prediction + proactive upazila/union scan)
  8 conflict resolution            -> kernel.resolver
  9 output projection + overall confidence (mean of resolved confidences,
    ``extractor.py:353-364``)

Deterministic: given the same text and config the output is bit-identical —
the property the distributed pipeline's per-turn equality invariant rests on.
"""

from __future__ import annotations

from typing import Dict, Optional

from .. import COMPONENT_FIELDS
from .extractors import REGEX_EXTRACTORS
from .fsm import FSM_CONFIDENCE, fsm_parse
from .gazetteer import fuzzy_match_area, area_display, validate_and_enrich
from .normalizer import normalize
from .script_detect import detect_script

# per-component minimum confidences; defaults mirror the reference
# (`src/core/config/component_thresholds.py:21-31`)
DEFAULT_THRESHOLDS = {
    "house_number": 0.70, "road": 0.70, "area": 0.65, "district": 0.75,
    "division": 0.80, "postal_code": 0.80, "flat_number": 0.70,
    "floor_number": 0.70, "block_number": 0.70,
}

_STAGE_DEFAULTS = {"fsm": True, "regex": True, "ner": True,
                   "gazetteer": True, "geo": True}

# Performance profiles (reference tools/control_stages.py:45-68): named
# stage-toggle bundles. Stages 2/4/8/9 (normalize, regex, resolve, output)
# are mandatory there and here; `fast` = regex-only, `balanced` drops the
# cheap duplicated evidence sources but keeps enrichment, `accurate` = all.
STAGE_PROFILES = {
    "fast": {"fsm": False, "regex": True, "ner": False,
             "gazetteer": False, "geo": False},
    "balanced": {"fsm": False, "regex": True, "ner": True,
                 "gazetteer": True, "geo": True},
    "accurate": dict(_STAGE_DEFAULTS),
}


def stages_for_profile(profile: str) -> dict:
    try:
        return dict(STAGE_PROFILES[profile])
    except KeyError:
        raise ValueError(
            f"unknown profile {profile!r}; one of {sorted(STAGE_PROFILES)}")


def _build_prescreen():
    """Necessary-condition gate for ANY evidence, part of the kernel SPEC
    (both the oracle and every distributed path run it, so they agree by
    construction): a text with no digit, no Bangla codepoint, and none of
    the known location / address-keyword / typo-variant tokens cannot
    produce evidence, so stages 3-8 are skipped. On corpora where most
    turns are not addresses (the realistic transcript mix) this removes
    the dominant share of kernel work from the hottest stage.

    Physical form: one small char-class regex (digits / Bangla) plus
    token-SET membership — tokens of every known name/keyword, and the
    4-char prefixes the fuzzy area matcher requires (so typo'd suffixes
    like "gulshann" still pass). A single ~1000-way regex alternation here
    measured 0.4 ms per NEGATIVE string — the gate itself was the hot
    path on filler-dominated corpora; the token gate is ~20x cheaper and
    admits a superset of the texts that can produce evidence."""
    import re as _re
    from .gazetteer import (AREAS, AREA_VARIANTS, DISTRICT_TO_DIVISION,
                            DISTRICT_VARIANTS, DIVISIONS)
    from .geo import full_layers
    from .normalizer import CORRECTIONS

    upazilas, unions, villages, post_offices = full_layers()
    names = (set(AREAS) | set(AREA_VARIANTS) | set(DISTRICT_TO_DIVISION)
             | {d.lower() for d in DISTRICT_VARIANTS}
             | {d.lower() for d in DIVISIONS} | set(upazilas) | set(unions)
             | set(villages) | set(post_offices)
             | {w for w, _ in CORRECTIONS})
    keywords = {
        "house", "home", "hous", "bari", "basa", "basha", "road", "rd",
        "lane", "goli", "avenue", "street", "sarani", "sarak", "flat",
        "floor", "level", "block", "sector", "plot", "holding", "building",
        "bldg", "apartment", "district", "division", "post", "zip",
        "bangladesh", "thana", "lift", "unit", "apt", "gram",
    }
    words = set(keywords)
    for name in names:
        for w in _re.findall(r"[a-z]+", name.lower()):
            if len(w) >= 2:
                words.add(w)
    prefixes = {w[:4] for w in words if len(w) >= 4}
    quick = _re.compile(r"[0-9০-৯]|[ঀ-৿]")
    token = _re.compile(r"[a-z]+")
    return quick, token, frozenset(words), frozenset(prefixes)


_PRE_QUICK, _PRE_TOKEN, _PRE_WORDS, _PRE_PREFIXES = _build_prescreen()


def prescreen(text: str) -> bool:
    """True iff the text can possibly produce evidence (see
    _build_prescreen)."""
    if _PRE_QUICK.search(text):
        return True
    words = _PRE_WORDS
    prefixes = _PRE_PREFIXES
    for tok in _PRE_TOKEN.findall(text.lower()):
        if tok in words or (len(tok) >= 5 and tok[:4] in prefixes):
            return True
    return False

_EMPTY_COMPONENTS = {f: "" for f in COMPONENT_FIELDS}


class ExtractionKernel:
    """Configurable kernel; one instance per extraction actor.

    ``stages``: toggle evidence stages like the reference's stage_config
    profiles (`tools/control_stages.py:34-60`). normalize + resolve + output
    are mandatory, as in the reference (stages 2, 8, 9 forced on).

    ``ner_model``: optional stage-5 model object with
    ``predict(text) -> {component: (value, confidence)}``; evidence lands
    with source ``spacy_ner`` weighting. None (default) skips the stage —
    the reference's optional NER slot with a pluggable ``model_path``.

    ``geo``: optional GeoHierarchy instance for stage 7 (defaults to the
    module fixture; inject a fuller hierarchy dim here).
    """

    def __init__(self, thresholds: Optional[Dict[str, float]] = None,
                 stages: Optional[Dict[str, bool]] = None,
                 ner_model=None, geo=None, gazetteer=None):
        self.thresholds = dict(DEFAULT_THRESHOLDS)
        if thresholds:
            self.thresholds.update(thresholds)
        self.stages = dict(_STAGE_DEFAULTS)
        if stages:
            self.stages.update(stages)
        self.ner_model = ner_model
        from .geo import default_geo
        self.geo = geo or default_geo()
        # injectable stage-6 dim (reference `data_path` surface); None ->
        # module fixture instance
        self.gazetteer = gazetteer

    def extract(self, text: str, detailed: bool = False,
                pre_normalized: bool = False) -> Dict:
        """``pre_normalized=True``: the caller guarantees ``text`` is
        already the stage-2 canonical form (the distributed pipeline's
        ``norm_text`` column), so the kernel skips re-normalizing.
        ``normalize`` is idempotent (pytest property), so the result is
        bit-identical to the default path — it just stops paying the ~25
        regex substitutions twice per string in the hottest stage."""
        if not prescreen(text):
            # gate: no digit / Bangla / location / keyword token anywhere —
            # stages 3-8 cannot produce evidence (see _build_prescreen)
            out = {
                "components": dict(_EMPTY_COMPONENTS),
                "overall_confidence": 0.0,
                "normalized_address":
                    text if pre_normalized else normalize(text),
                "original_address": text,
            }
            if detailed:
                from .extractors import extract_country
                cval, cconf = extract_country(out["normalized_address"])
                out["metadata"] = {
                    "script": detect_script(text),
                    "component_details": {f: None for f in COMPONENT_FIELDS},
                    "enabled_stages": dict(self.stages),
                    "country": {"value": cval, "confidence": cconf},
                }
            return out

        # stage 1 (script detect) feeds only the detailed metadata block;
        # computed there, not in the hot path
        norm = text if pre_normalized else normalize(text)   # stage 2

        evidence: Dict[str, list] = {f: [] for f in COMPONENT_FIELDS}

        if self.stages["fsm"]:                  # stage 3
            for comp, val in fsm_parse(norm).items():
                if val:
                    evidence[comp].append(
                        {"value": val, "confidence": FSM_CONFIDENCE,
                         "source": "fsm"})

        if self.stages["regex"]:                # stage 4
            for comp, fn in REGEX_EXTRACTORS.items():
                hit = fn(norm)
                if hit:
                    evidence[comp].append(
                        {"value": hit[0], "confidence": hit[1],
                         "source": "regex"})

        if self.stages["ner"] and self.ner_model is not None:   # stage 5
            for comp, hit in (self.ner_model.predict(norm) or {}).items():
                if comp in evidence and hit:
                    evidence[comp].append(
                        {"value": hit[0], "confidence": hit[1],
                         "source": "spacy_ner"})

        if self.stages["gazetteer"]:            # stage 6
            if not evidence["area"]:
                # fuzzy back-extraction (reference gazetteer.py:321-377)
                for tok in norm.replace(",", " ").split():
                    if len(tok) >= 5 and tok.isalpha():
                        hit = fuzzy_match_area(tok, self.gazetteer)
                        if hit:
                            evidence["area"].append(
                                {"value": area_display(hit),
                                 "confidence": 0.75,
                                 "source": "gazetteer_corrected"})
                            break
            validate_and_enrich(evidence, self.gazetteer)

        if self.stages["geo"]:                  # stage 7
            from .geo import geo_enrich
            geo_enrich(evidence, norm, self.geo)

        resolved = resolve_with(evidence, self.thresholds)   # stage 8

        components = {                          # stage 9
            f: (resolved[f]["value"] if resolved.get(f) else "")
            for f in COMPONENT_FIELDS
        }
        confs = [r["confidence"] for r in resolved.values() if r]
        overall = sum(confs) / len(confs) if confs else 0.0

        out = {
            "components": components,
            "overall_confidence": overall,
            "normalized_address": norm,
            "original_address": text,
        }
        if detailed:
            from .extractors import extract_country
            cval, cconf = extract_country(norm)
            out["metadata"] = {
                "script": detect_script(text),          # stage 1
                "component_details": resolved,
                "enabled_stages": dict(self.stages),
                # CityResult.country parity (district_processor.py:177-212)
                "country": {"value": cval, "confidence": cconf},
            }
        return out


def resolve_with(evidence_map, thresholds):
    from .resolver import resolve
    return resolve(evidence_map, thresholds)


_DEFAULT_KERNEL = ExtractionKernel()


def extract(text: str, detailed: bool = False) -> Dict:
    """Module-level extraction with default config (oracle entry point)."""
    return _DEFAULT_KERNEL.extract(text, detailed)
