"""Script detection (pipeline stage 1, metadata only).

Same semantics as the reference's ScriptDetector
(``/root/reference/src/core/stages/script_detector.py:10-39``): ratio of
Bangla-block codepoints (U+0980-U+09FF) vs ASCII letters decides
bn / en / mixed / neutral.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa


def detect_script(text: str) -> Dict:
    bn = sum(1 for c in text if "ঀ" <= c <= "৿")
    en = sum(1 for c in text if c.isascii() and c.isalpha())
    total = bn + en
    if total == 0:
        return {"primary_script": "neutral", "is_mixed": False,
                "bangla_ratio": 0.0, "english_ratio": 0.0}
    br, er = bn / total, en / total
    if br > 0 and er > 0:
        return {"primary_script": "mixed", "is_mixed": True,
                "bangla_ratio": br, "english_ratio": er}
    return {"primary_script": "bn" if br > 0 else "en", "is_mixed": False,
            "bangla_ratio": br, "english_ratio": er}


def script_ratios_array(arr: pa.Array) -> np.ndarray:
    """Vectorized bangla-ratio over an Arrow string array (numpy codepoints)."""
    out = np.zeros(len(arr), dtype=np.float64)
    for i, v in enumerate(arr.to_pylist()):
        if not v:
            continue
        cp = np.frombuffer(v.encode("utf-32-le"), dtype=np.uint32)
        bn = int(((cp >= 0x980) & (cp <= 0x9FF)).sum())
        asc = cp < 128
        en = int((((cp >= 65) & (cp <= 90)) | ((cp >= 97) & (cp <= 122))).sum())
        t = bn + en
        out[i] = bn / t if t else 0.0
    return out
