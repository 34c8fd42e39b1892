"""Phonetic + MinHash key primitives for blocking (pure, deterministic).

The reference's fuzzy area matching (``gazetteer.py:321-377``) is a scan;
at scale it becomes *blocking keys* (SURVEY.md J4): phonetic (Soundex) codes
collide typo'd spellings into one shuffle key, and MinHash band keys over the
component-token set catch everything else. All hashing is ``zlib.crc32`` —
stable across processes and Python versions, which the resume/determinism
guarantees rely on.
"""

from __future__ import annotations

import zlib
from typing import Iterable, List

_SOUNDEX_CODES = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(word: str) -> str:
    """American Soundex, 4 chars (e.g. gulshan -> G425, gulisthan -> G423)."""
    w = [c for c in word.lower() if c.isalpha()]
    if not w:
        return "0000"
    first = w[0].upper()
    codes = []
    prev = _SOUNDEX_CODES.get(w[0], "")
    for c in w[1:]:
        code = _SOUNDEX_CODES.get(c, "")
        if code and code != prev:
            codes.append(code)
        if c not in "hw":
            prev = code
    return (first + "".join(codes) + "000")[:4]


def _h(i: int, token: str) -> int:
    return zlib.crc32(f"{i}:{token}".encode("utf-8"))


def minhash_band_keys(tokens: Iterable[str], num_hashes: int = 8,
                      band_size: int = 2) -> List[str]:
    """MinHash signature over a token set -> LSH band keys.

    num_hashes=8, band_size=2 -> 4 bands; two sets share a band key with
    probability 1-(1-J^2)^4 (J = Jaccard), steep around J~0.5 which matches
    the component-token overlap of same-entity surface variants.
    """
    toks = list(tokens)
    if not toks:
        return []
    sig = [min(_h(i, t) for t in toks) for i in range(num_hashes)]
    return [
        "mh:%d:%s" % (b, "_".join("%08x" % v
                                  for v in sig[b * band_size:(b + 1) * band_size]))
        for b in range(num_hashes // band_size)
    ]
