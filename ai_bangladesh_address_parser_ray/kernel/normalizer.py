"""Canonical text normalization (pipeline stage 2).

Semantics follow the reference normalizer
(``/root/reference/src/core/stages/normalizer.py:44-75``): Bangla-numeral
ASCII-ification, Bangla place/keyword transliteration, quote stripping,
word-boundary spelling corrections, ``#``/``:`` rewrites and whitespace/comma
normalization — re-implemented twice:

- :func:`normalize` — scalar, pure Python. The oracle.
- :func:`normalize_array` — vectorized over a ``pyarrow`` string array using
  ``pyarrow.compute`` kernels only (zero Python per row). Used by the Ray
  ``map_batches`` stage. Tests assert element-wise equality with the scalar
  path over the full fixture corpus.

Both paths apply the SAME ordered replacement tables, so iteration order is
part of the contract.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# Ordered literal replacement tables ---------------------------------------

BN_NUMERALS = [
    ("০", "0"), ("১", "1"), ("২", "2"), ("৩", "3"), ("৪", "4"),
    ("৫", "5"), ("৬", "6"), ("৭", "7"), ("৮", "8"), ("৯", "9"),
]

BN_PLACES = [
    ("ঢাকা", "Dhaka"), ("চট্টগ্রাম", "Chattogram"), ("চিটাগাং", "Chattogram"),
    ("সিলেট", "Sylhet"), ("রাজশাহী", "Rajshahi"), ("খুলনা", "Khulna"),
    ("বরিশাল", "Barisal"), ("রংপুর", "Rangpur"), ("ময়মনসিংহ", "Mymensingh"),
    ("বনানী", "Banani"), ("গুলশান", "Gulshan"), ("ধানমন্ডি", "Dhanmondi"),
    ("উত্তরা", "Uttara"), ("মিরপুর", "Mirpur"), ("হালিশহর", "Halishahar"),
    ("আগ্রাবাদ", "Agrabad"), ("বসুন্ধরা", "Bashundhara"),
    ("জিগাতলা", "Jigatola"), ("মোহাম্মদপুর", "Mohammadpur"),
    # place names that contain keyword substrings (বাড়ী/বাসা) MUST
    # transliterate here, before BN_KEYWORDS mangles them (round-4 miss
    # taxonomy: Bangla-script labels for known areas were normalizer-gaps)
    ("যাত্রাবাড়ী", "Jatrabari"), ("যাত্রাবাড়ি", "Jatrabari"),
    ("বাসাবো", "Basabo"), ("বাড্ডা", "Badda"),
    ("ক্যান্টনমেন্ট", "Cantonment"), ("কাটাবন", "Kataban"),
    ("সবুজবাগ", "Sabujbagh"), ("খিলগাঁও", "Khilgaon"),
]

BN_KEYWORDS = [
    ("রোড", "Road"), ("বাড়ি", "House"), ("বাসা", "House"), ("বাড়ী", "House"),
    ("ফ্ল্যাট", "Flat"), ("তলায়", "Floor"), ("তলা", "Floor"),
    ("ব্লক", "Block"),
    ("লেন", "Lane"), ("গলি", "Lane"), ("নং", "No"), ("নাম্বার", "No"),
    ("নম্বর", "No"),
    ("লেইন", "Lane"), ("স্ট্রিট", "Street"), ("সড়ক", "Road"),
    ("এভিনিউ", "Avenue"), ("ফিট", "Feet"), ("হোল্ডিং", "Holding"),
]

# word -> canonical spelling, applied case-insensitively on word boundaries
CORRECTIONS = [
    ("chittagong", "Chattogram"), ("chittagang", "Chattogram"),
    ("ctg", "Chattogram"), ("daka", "Dhaka"), ("dhakka", "Dhaka"),
    ("raod", "Road"), ("hose", "House"), ("hause", "House"),
]

_CORRECTION_RES = [
    (re.compile(r"\b" + w + r"\b", re.IGNORECASE), r) for w, r in CORRECTIONS
]
_WS_RE = re.compile(r"\s+")
_COMMA_RE = re.compile(r"\s*,\s*")


def normalize(text: str) -> str:
    """Scalar canonical normalization (the oracle path)."""
    if not text:
        return ""
    for bn, en in BN_NUMERALS:
        text = text.replace(bn, en)
    for bn, en in BN_PLACES:
        text = text.replace(bn, en)
    for bn, en in BN_KEYWORDS:
        text = text.replace(bn, en)
    text = text.replace('"', "").replace("'", "")
    # curly quotes appear in the labeled corpus ("Cox’s Bazar")
    text = text.replace("’", "").replace("‘", "")
    text = text.replace("“", "").replace("”", "")
    for rx, right in _CORRECTION_RES:
        text = rx.sub(right, text)
    text = text.replace("#", " No ").replace(":", " ")
    text = _WS_RE.sub(" ", text).strip()
    text = _COMMA_RE.sub(", ", text)
    return text


def normalize_array(arr: pa.Array) -> pa.Array:
    """Vectorized normalization over an Arrow string array.

    Pure ``pyarrow.compute`` kernel chain — no Python-per-row work. Must be
    element-wise identical to :func:`normalize`.
    """
    a = pc.fill_null(arr, "")
    for bn, en in BN_NUMERALS + BN_PLACES + BN_KEYWORDS:
        a = pc.replace_substring(a, bn, en)
    a = pc.replace_substring(a, '"', "")
    a = pc.replace_substring(a, "'", "")
    for q in ("’", "‘", "“", "”"):
        a = pc.replace_substring(a, q, "")
    for wrong, right in CORRECTIONS:
        a = pc.replace_substring_regex(a, rf"(?i)\b{wrong}\b", right)
    a = pc.replace_substring(a, "#", " No ")
    a = pc.replace_substring(a, ":", " ")
    a = pc.replace_substring_regex(a, r"\s+", " ")
    a = pc.utf8_trim_whitespace(a)
    a = pc.replace_substring_regex(a, r"\s*,\s*", ", ")
    return a
