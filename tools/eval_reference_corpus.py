"""Extraction parity vs the reference's own labeled corpus.

Runs the pure-Python kernel (no Ray) over the 1,363 labeled addresses in
``/root/reference/data/raw/merged_addresses.json`` and reports per-field
recall (label non-empty -> kernel value equal or substring-compatible).
This quantifies how much of the reference's regex/gazetteer behavior the
curated re-expression reproduces — on the reference's data, not ours.

``--with-ner`` additionally trains the NgramNER token classifier on the
corpus labels (the reference trained its spaCy model on this same data,
its 99.3% claim is equally in-sample) and runs the kernel with the model
plugged into extraction stage 5 — demonstrating the ST1 slot end to end.

Usage: python tools/eval_reference_corpus.py [path_to_labels_json] [--with-ner]
"""

import json
import re
import sys

sys.path.insert(0, "/root/repo")

from ai_bangladesh_address_parser_ray.kernel.extract import (  # noqa: E402
    ExtractionKernel, extract)
from ai_bangladesh_address_parser_ray.kernel.normalizer import normalize  # noqa: E402

FIELDS = ["house_number", "road", "area", "district", "division",
          "postal_code", "flat_number", "floor_number", "block_number"]


def canon(s):
    # labels mix scripts ("মিরপুর" vs "Mirpur"): compare in the kernel's
    # canonical space so a correct extraction of a Bangla-labeled value
    # is not scored as a miss
    return normalize((s or "")).strip().lower()


def _trained_ner(rows):
    """Train NgramNER on the corpus's area/district/division tokens (the
    same in-sample setup as the reference's spaCy training run)."""
    from ai_bangladesh_address_parser_ray.kernel.ner import NgramNER
    examples = []
    for r in rows:
        comps = r["components"]
        labeled = {}
        for f in ("area", "district", "division"):
            for tok in re.findall(r"[A-Za-z]{4,}", comps.get(f) or ""):
                labeled[tok.lower()] = f
        for tok in re.findall(r"[A-Za-z]{4,}", r["address"]):
            examples.append((tok.lower(), labeled.get(tok.lower(), "O")))
    return NgramNER.train(examples)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_ner = "--with-ner" in sys.argv
    path = args[0] if args else \
        "/root/reference/data/raw/merged_addresses.json"
    rows = json.load(open(path))
    if with_ner:
        kernel = ExtractionKernel(ner_model=_trained_ner(rows))
        run = kernel.extract
    else:
        run = extract
    stats = {f: [0, 0] for f in FIELDS}
    for r in rows:
        got = run(r["address"])["components"]
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
                      "with_ner": with_ner,
                      "fields": out}, indent=2))


if __name__ == "__main__":
    main()
