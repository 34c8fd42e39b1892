"""Extraction parity vs the reference's own labeled corpus.

Runs the pure-Python kernel (no Ray) over the 1,363 labeled addresses in
``/root/reference/data/raw/merged_addresses.json`` and reports per-field
recall (label non-empty -> kernel value equal or substring-compatible).
This quantifies how much of the reference's regex/gazetteer behavior the
curated re-expression reproduces — on the reference's data, not ours.

Usage: python tools/eval_reference_corpus.py [path_to_labels_json]
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from ai_bangladesh_address_parser_ray.kernel.extract import extract  # noqa: E402
from ai_bangladesh_address_parser_ray.kernel.normalizer import normalize  # noqa: E402

FIELDS = ["house_number", "road", "area", "district", "division",
          "postal_code", "flat_number", "floor_number", "block_number"]


def canon(s):
    # labels mix scripts ("মিরপুর" vs "Mirpur"): compare in the kernel's
    # canonical space so a correct extraction of a Bangla-labeled value
    # is not scored as a miss
    return normalize((s or "")).strip().lower()


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/data/raw/merged_addresses.json"
    rows = json.load(open(path))
    stats = {f: [0, 0] for f in FIELDS}
    for r in rows:
        got = extract(r["address"])["components"]
        for f in FIELDS:
            w, g = canon(r["components"].get(f)), canon(got.get(f))
            if w:
                stats[f][1] += 1
                if w == g or (g and (w in g or g in w)):
                    stats[f][0] += 1
    out = {f: {"matched": m, "labeled": n,
               "recall": round(m / max(n, 1), 3)}
           for f, (m, n) in stats.items()}
    tot_m = sum(m for m, _ in stats.values())
    tot_n = sum(n for _, n in stats.values())
    out["ALL"] = {"matched": tot_m, "labeled": tot_n,
                  "recall": round(tot_m / tot_n, 3)}
    print(json.dumps({"corpus": path, "n_records": len(rows),
                      "fields": out}, indent=2))


if __name__ == "__main__":
    main()
