"""Build the bundled full-scale geo hierarchy asset from Bangladesh
division JSONs (the public open-data format the reference also consumes:
``{division, districts: [{name, upazilas: [{name, postalCode,
unions: [{name, villages: [...]}]}]}]}`` — see
``/root/reference/src/geo/bangladesh_geo_offline.py:58-175`` for the
format's semantics; the underlying facts are public Bangladeshi
administrative geography).

Writes ``ai_bangladesh_address_parser_ray/data/bd_geo_hierarchy.json`` in
the ``kernel.geo.load_hierarchy`` shape:

    {"upazilas":     {name: [district, division, postal_code]},
     "unions":       {name: [upazila, district, division]},
     "villages":     {name: [union, upazila, district, division]},
     "post_offices": {name: [district, postal_code]}}

The post-office layer comes from ``bd-postal-codes.json`` in the same
directory (1,226 {district, postOffice, code} rows — the reference's
``_load_postal_codes`` surface).

Name collisions across divisions keep the first in sorted (division-file,
district) order — deterministic, mirroring the reference's
first-loaded-wins, made replay-stable.

Usage: python tools/build_geo_asset.py [division_json_dir] [out_json]
"""

import glob
import json
import os
import sys


def build(division_dir: str) -> dict:
    upazilas, unions, villages = {}, {}, {}
    files = sorted(glob.glob(os.path.join(division_dir,
                                          "bd-*-division.json")))
    if not files:
        raise SystemExit(f"no bd-*-division.json under {division_dir}")
    for f in files:
        with open(f, encoding="utf-8") as fh:
            data = json.load(fh)
        if isinstance(data, dict):
            division = data.get("division")
            districts = data.get("districts", [])
        else:
            division = data[0].get("division") if data else None
            districts = data
        if not division:
            continue
        for d in districts:
            dn = (d.get("name") or "").strip()
            for u in d.get("upazilas", []):
                un = (u.get("name") or "").strip()
                pc = str(u.get("postalCode") or "").strip()
                if un:
                    upazilas.setdefault(un.lower(), [dn, division, pc])
                for uni in u.get("unions", []):
                    unn = (uni.get("name") or "").strip()
                    # the raw data suffixes most union names with
                    # " union" / " area" — strip to the usable locality
                    # key ("salimpur union" is mentioned as "salimpur")
                    low = unn.lower()
                    for suf in (" union", " area"):
                        if low.endswith(suf):
                            low = low[: -len(suf)].strip()
                    if low:
                        unions.setdefault(low, [un, dn, division])
                    for v in uni.get("villages", []):
                        vn = (v.get("name", "") if isinstance(v, dict)
                              else str(v)).strip()
                        if vn:
                            villages.setdefault(
                                vn.lower(), [unn, un, dn, division])
    post_offices = {}
    pc_file = os.path.join(division_dir, "bd-postal-codes.json")
    if os.path.exists(pc_file):
        with open(pc_file, encoding="utf-8") as fh:
            for e in json.load(fh).get("postal_codes", []):
                name = (e.get("postOffice") or "").strip().lower()
                code = str(e.get("code") or "").strip()
                district = (e.get("district") or "").strip()
                if name and code and district:
                    post_offices.setdefault(name, [district, code])

    return {"upazilas": upazilas, "unions": unions, "villages": villages,
            "post_offices": post_offices}


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/data/geographic/division"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ai_bangladesh_address_parser_ray", "data", "bd_geo_hierarchy.json")
    asset = build(src)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as fh:
        json.dump(asset, fh, ensure_ascii=False, separators=(",", ":"),
                  sort_keys=True)
    print(json.dumps({k: len(v) for k, v in asset.items()}))
    print(f"wrote {out} ({os.path.getsize(out):,} bytes)")


if __name__ == "__main__":
    main()
