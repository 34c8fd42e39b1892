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

``--taxonomy`` classifies every miss into a machine-checkable bucket
(VERDICT r3 #3), so "the residual gap is label noise" is auditable:

- ``label-ambiguity``: the kernel extracted a DIFFERENT non-empty value
  that also appears verbatim in the address (two plausible candidates in
  one string, e.g. two areas), or the labeled value was extracted into a
  DIFFERENT component (cross-field labels: road values labeled as house).
- ``pattern-gap``: the labeled value appears verbatim in the normalized
  address but the kernel extracted nothing (or something not in the
  string) for that field — OUR extractor's miss, actionable.
- ``normalizer-gap``: the labeled value does not appear in the normalized
  address at all — a transliteration/normalization difference makes the
  label unextractable as written.

Usage: python tools/eval_reference_corpus.py [path_to_labels_json]
       [--with-ner] [--taxonomy]
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


def _classify_miss(addr_canon: str, want: str, got: str,
                   all_got: dict) -> str:
    """Bucket one miss (see module docstring)."""
    if want not in addr_canon:
        return "normalizer-gap"
    if got and got in addr_canon:
        return "label-ambiguity"          # two plausible in-string values
    for other_f, other_v in all_got.items():
        ov = canon(other_v)
        if ov and (want == ov or want in ov or ov in want):
            return "label-ambiguity"      # extracted under another field
    return "pattern-gap"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_ner = "--with-ner" in sys.argv
    taxonomy = "--taxonomy" in sys.argv
    path = args[0] if args else \
        "/root/reference/data/raw/merged_addresses.json"
    rows = json.load(open(path))
    if with_ner:
        kernel = ExtractionKernel(ner_model=_trained_ner(rows))
        run = kernel.extract
    else:
        run = extract
    stats = {f: [0, 0] for f in FIELDS}
    tax = {f: {"label-ambiguity": 0, "pattern-gap": 0,
               "normalizer-gap": 0} for f in FIELDS}
    examples = {f: {"label-ambiguity": [], "pattern-gap": [],
                    "normalizer-gap": []} for f in FIELDS}
    for r in rows:
        got_all = run(r["address"])["components"]
        addr_canon = canon(r["address"])
        for f in FIELDS:
            w, g = canon(r["components"].get(f)), canon(got_all.get(f))
            if not w:
                continue
            stats[f][1] += 1
            if w == g or (g and (w in g or g in w)):
                stats[f][0] += 1
            elif taxonomy:
                cls = _classify_miss(addr_canon, w, g, got_all)
                tax[f][cls] += 1
                if len(examples[f][cls]) < 3:
                    examples[f][cls].append(
                        {"address": r["address"][:120], "want": w,
                         "got": g})
    out = {f: {"matched": m, "labeled": n,
               "recall": round(m / max(n, 1), 3)}
           for f, (m, n) in stats.items()}
    tot_m = sum(m for m, _ in stats.values())
    tot_n = sum(n for _, n in stats.values())
    out["ALL"] = {"matched": tot_m, "labeled": tot_n,
                  "recall": round(tot_m / tot_n, 3)}
    res = {"corpus": path, "n_records": len(rows),
           "with_ner": with_ner, "fields": out}
    if taxonomy:
        res["miss_taxonomy"] = {f: t for f, t in tax.items()
                                if sum(t.values())}
        res["miss_taxonomy_totals"] = {
            k: sum(t[k] for t in tax.values())
            for k in ("label-ambiguity", "pattern-gap", "normalizer-gap")}
        res["miss_examples"] = {
            f: {k: v for k, v in e.items() if v}
            for f, e in examples.items() if any(e.values())}
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
