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


class NgramNER:
    """Tiny TRAINED character-ngram token classifier — the shaped stand-in
    for the reference's 4 MB spaCy artifact (``models/production/
    address_ner_model``): a real model file on disk, loaded ONCE per actor
    through ``ner_model_factory``, with learned (not rule) generalization —
    an unseen spelling like "shyamolee" classifies as AREA because its
    character ngrams resemble trained area names.

    Multinomial naive Bayes over padded char-3-grams with Laplace
    smoothing; classes are component labels plus "O". Deterministic train,
    pickle save/load (the model artifact the factory ships)."""

    VERSION = 1
    _N = 3

    def __init__(self, log_prior: Dict[str, float],
                 log_lik: Dict[str, Dict[str, float]],
                 default_lik: Dict[str, float]):
        self.log_prior = log_prior
        self.log_lik = log_lik          # ngram -> {class: log P(g|c)}
        self.default_lik = default_lik  # class -> log P(unseen gram|c)

    # ------------------------------------------------------------ train --
    @staticmethod
    def _grams(token: str):
        padded = f"^{token.lower()}$"
        n = NgramNER._N
        return [padded[i:i + n] for i in range(max(1, len(padded) - n + 1))]

    @classmethod
    def train(cls, examples) -> "NgramNER":
        """examples: iterable of (token, label); label in {"area",
        "district", "O", ...}. Deterministic for a given input order-set."""
        import math
        from collections import Counter, defaultdict

        class_counts: Dict[str, int] = Counter()
        gram_counts: Dict[str, Counter] = defaultdict(Counter)
        vocab = set()
        for token, label in sorted(set(examples)):
            class_counts[label] += 1
            for g in cls._grams(token):
                gram_counts[label][g] += 1
                vocab.add(g)
        total = sum(class_counts.values())
        v = len(vocab) + 1
        log_prior = {c: math.log(n / total) for c, n in class_counts.items()}
        log_lik: Dict[str, Dict[str, float]] = {}
        default_lik = {}
        for c in class_counts:
            denom = sum(gram_counts[c].values()) + v
            default_lik[c] = math.log(1.0 / denom)
            for g, n in gram_counts[c].items():
                log_lik.setdefault(g, {})[c] = math.log((n + 1) / denom)
        return cls(log_prior, log_lik, default_lik)

    # ---------------------------------------------------------- predict --
    def classify_token(self, token: str) -> Tuple[str, float]:
        """argmax class and its margin over 'O' (log-odds)."""
        scores = dict(self.log_prior)
        for g in self._grams(token):
            per = self.log_lik.get(g)
            for c in scores:
                scores[c] += (per or {}).get(c, self.default_lik[c])
        best = max(sorted(scores), key=lambda c: scores[c])
        margin = scores[best] - scores.get("O", min(scores.values()))
        return best, margin

    _TOKEN_RX = re.compile(r"[A-Za-z]{4,}")

    def predict(self, text: str) -> Dict[str, Tuple[str, float]]:
        out: Dict[str, Tuple[str, float]] = {}
        for m in self._TOKEN_RX.finditer(text or ""):
            label, margin = self.classify_token(m.group(0))
            if label != "O" and margin > 2.0 and label not in out:
                out[label] = (m.group(0).title(), _NER_CONF)
        return out

    # ------------------------------------------------------ persistence --
    def save(self, path: str) -> None:
        import pickle
        with open(path, "wb") as f:
            pickle.dump({"version": self.VERSION,
                         "log_prior": self.log_prior,
                         "log_lik": self.log_lik,
                         "default_lik": self.default_lik}, f)

    @classmethod
    def load(cls, path: str) -> "NgramNER":
        import pickle
        with open(path, "rb") as f:
            d = pickle.load(f)
        if d.get("version") != cls.VERSION:
            raise ValueError(f"NgramNER artifact version {d.get('version')} "
                             f"!= supported {cls.VERSION}")
        return cls(d["log_prior"], d["log_lik"], d["default_lik"])


def train_default_area_model() -> "NgramNER":
    """Train an area/district token model from the gazetteer vocabulary
    (positive classes) plus address keywords and common chat fillers as
    'O' — the deterministic training set for tests and demos."""
    from .gazetteer import AREA_VARIANTS, DISTRICT_TO_DIVISION

    examples = []
    for a in AREAS:
        for w in a.split():
            if len(w) >= 4:
                examples.append((w, "area"))
    for a in AREA_VARIANTS:
        for w in a.split():
            if len(w) >= 4:
                examples.append((w, "area"))
    for d in DISTRICT_TO_DIVISION:
        if d.isascii():
            for w in d.replace("'", "").split():
                if len(w) >= 4:
                    examples.append((w, "district"))
    negatives = [
        "house", "road", "flat", "floor", "block", "sector", "lane",
        "avenue", "street", "building", "tower", "market", "hospital",
        "school", "college", "office", "please", "deliver", "package",
        "tomorrow", "morning", "meeting", "invoice", "billing", "address",
        "customer", "arrival", "thanks", "hello", "number", "apartment",
        "courier", "documents", "location", "pickup", "registered",
        "shipping", "point", "call", "send", "meet",
    ]
    examples.extend((w, "O") for w in negatives)
    return NgramNER.train(examples)
