"""Pairwise comparison / scoring kernel (dedup kernel P1).

Two layers:

- :func:`compare_components` — behavioral twin of the reference's
  ``compare_addresses`` (``/root/reference/src/core/utils/address_utils.py:
  131-206``): per-component ``SequenceMatcher.ratio`` on lowercased values,
  weighted score (postal .30, district .25, area .20, house .10, road .10,
  division .05), ``match = score >= 0.85``.

- :func:`score_pair` — the north-star linkage scorer: the same weighted-
  threshold decision shape, but each component similarity is an ensemble
  ``max(SequenceMatcher-ratio, Jaro-Winkler)`` blended with token-set Jaccard
  and normalized Levenshtein, which is more robust to the surface variants
  the blocking stage admits. Deterministic, pure, picklable — runs batched on
  the pair-scorer stage.
"""

from __future__ import annotations

from difflib import SequenceMatcher
from typing import Dict

COMPARE_WEIGHTS = {
    "postal_code": 0.30,
    "district": 0.25,
    "area": 0.20,
    "house_number": 0.10,
    "road": 0.10,
    "division": 0.05,
}
ALL_COMPONENTS = [
    "house_number", "road", "area", "district", "division",
    "postal_code", "flat_number", "floor_number", "block_number",
]
MATCH_THRESHOLD = 0.85


def seq_ratio(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


def levenshtein(a: str, b: str) -> int:
    """Iterative two-row Levenshtein distance."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def levenshtein_sim(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    m = max(len(a), len(b))
    return 1.0 - levenshtein(a, b) / m if m else 1.0


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if not la or not lb:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and b[j] == ca:
                ma[i] = mb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix >= max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


def token_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return 1.0
    u = sa | sb
    return len(sa & sb) / len(u) if u else 1.0


def ensemble_sim(a: str, b: str) -> float:
    """max(seq_ratio, jaro_winkler) blended 50/25/25 with levenshtein-sim and
    token-jaccard. In [0,1]; 1.0 iff strings equal (or both empty)."""
    core = max(seq_ratio(a, b), jaro_winkler(a, b))
    return 0.5 * core + 0.25 * levenshtein_sim(a, b) + 0.25 * token_jaccard(a, b)


def _weighted_decision(similarities: Dict[str, float]) -> Dict:
    if similarities:
        avg = sum(similarities.values()) / len(similarities)
    else:
        avg = 0.0
    ws = tw = 0.0
    for comp, w in COMPARE_WEIGHTS.items():
        if comp in similarities:
            ws += similarities[comp] * w
            tw += w
    score = ws / tw if tw > 0 else avg
    return {"similarity": round(avg, 3), "score": round(score, 3),
            "match": score >= MATCH_THRESHOLD}


def compare_components(c1: Dict, c2: Dict) -> Dict:
    """Reference-parity comparison (SequenceMatcher per component)."""
    sims, diffs, common = {}, [], []
    for comp in ALL_COMPONENTS:
        v1 = str(c1.get(comp) or "").strip().lower()
        v2 = str(c2.get(comp) or "").strip().lower()
        if v1 and v2:
            s = seq_ratio(v1, v2)
            sims[comp] = s
            (common if s >= 0.9 else diffs).append(comp)
        elif v1 or v2:
            diffs.append(comp)
    out = _weighted_decision(sims)
    out.update({"differences": diffs, "common": common,
                "component_similarities": sims})
    return out


# identifier-shaped fields (short, digit-bearing) compare EXACT in the
# linkage scorer: '12' vs '120' are different houses, not 0.9-similar
# strings. Textual fields keep the fuzzy ensemble.
_IDENTIFIER_FIELDS = {
    "house_number", "road", "postal_code",
    "flat_number", "floor_number", "block_number",
}


def _is_identifier(v: str) -> bool:
    """Short digit-bearing values ('12', '105/A') AND digit-dominant longer
    ones ('ga/1985/a', '228/B/3/A'): a Banglish-prefixed house number is an
    identifier too — 'Ga/3936' vs 'Ga/1985' must score 0.0, not inherit
    fuzzy credit from the shared prefix."""
    nd = sum(ch.isdigit() for ch in v)
    if nd == 0:
        return False
    alnum = sum(ch.isalnum() for ch in v)
    return len(v) <= 6 or nd * 2 >= alnum


def score_pair(c1: Dict, c2: Dict, threshold: float = MATCH_THRESHOLD) -> Dict:
    """Linkage ensemble scorer — same weighted decision shape, ensemble sims."""
    from .gazetteer import canonical_area
    sims = {}
    for comp in ALL_COMPONENTS:
        v1 = str(c1.get(comp) or "").strip().lower()
        v2 = str(c2.get(comp) or "").strip().lower()
        if comp == "area" and v1 and v2 and v1 != v2:
            # the kernel outputs surface spellings; canonically-equal
            # neighborhoods ("Shamoli"/"Shyamoli") are the same place
            v1c, v2c = canonical_area(v1), canonical_area(v2)
            if v1c == v2c:
                v1 = v2 = v1c
        if v1 and v2:
            if v1 == v2:
                sims[comp] = 1.0
            elif comp in _IDENTIFIER_FIELDS and (_is_identifier(v1) or _is_identifier(v2)):
                sims[comp] = 0.0
            else:
                sims[comp] = ensemble_sim(v1, v2)
    out = _weighted_decision(sims)
    out["match"] = out["score"] >= threshold
    return out
