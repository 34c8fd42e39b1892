"""Pluggable NER models for extraction stage 5 (SURVEY.md ST1).

The reference loads a trained spaCy model per worker
(``/root/reference/src/core/stages/spacy_ner.py:27-108``); spaCy is not
installed in this environment, so the slot ships with a deterministic
RULE-BASED stand-in that exercises the exact same contract:

- constructed once per actor (pass the CLASS as ``ner_model_factory`` to
  ``stages.extract.extract_stage`` — it flips the stage to an actor pool
  and calls the factory in ``__init__``, never per batch);
- ``predict(norm_text) -> {component: (value, confidence)}``, evidence
  tagged ``spacy_ner`` (weight 0.85) by the conflict resolver.

A real spaCy deployment only needs a factory like::

    def spacy_factory():
        import spacy
        return SpacyNERAdapter(spacy.load("/models/address_ner_model"))

where the adapter maps ``doc.ents`` labels (HOUSE/ROAD/AREA/...) to the
same dict shape (first occurrence wins, fixed 0.85 confidence — reference
``spacy_ner.py:62-96``).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

from .gazetteer import AREAS, area_display

_NER_CONF = 0.85   # the reference's fixed spaCy evidence confidence


class RuleNER:
    """Gazetteer-scan stand-in model: emits area evidence when a known
    area name appears anywhere in the text. Deterministic, picklable,
    importable on Ray workers — the default factory for tests and demos."""

    def __init__(self):
        # compiled once per actor — the "model load" of the stand-in
        self._rx = re.compile(
            r"\b(" + "|".join(sorted(AREAS, key=len, reverse=True)) + r")\b",
            re.I)

    def predict(self, text: str) -> Dict[str, Tuple[str, float]]:
        m = self._rx.search(text or "")
        if not m:
            return {}
        return {"area": (area_display(m.group(1).lower()), _NER_CONF)}
