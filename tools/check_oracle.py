"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry over an sf dir; where ``oracle_sql()`` has a
matching key, runs the SQL in DuckDB over the same parquet tables and
compares row count, column names and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

import ray


def to_pandas(result):
    import pyarrow as pa
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = []
    for _, row in df.iterrows():
        rows.append("|".join(repr(v) for v in row.tolist()))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    # print engine versions so a driver-vs-local drift (the round-4
    # repetition_docs hash fail) is diagnosable from the log alone
    import pyarrow
    print(f"env: duckdb={duckdb.__version__} pyarrow={pyarrow.__version__} "
          f"pandas={pd.__version__}")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name == "events_hll_users":
            # sketch gate (VERDICT r3 #9): HLL estimate per group must land
            # within 5 standard errors (1.04/sqrt(2^p) ~ 1.6% at p=12) of
            # the EXACT distinct count — a deterministic bound for any
            # non-adversarial input, far tighter than rows-only.
            exact = con.sql(
                "SELECT event_type, COUNT(DISTINCT user_id) AS n "
                "FROM events GROUP BY event_type").df().set_index(
                    "event_type")["n"]
            bound = 5 * 1.04 / (2 ** 12) ** 0.5
            worst, bad = 0.0, 0
            for _, row in res.iterrows():
                e = exact[row["event_type"]]
                rel = abs(row["approx_distinct"] - e) / max(e, 1)
                worst = max(worst, rel)
                if rel > bound:
                    bad += 1
            status = "MATCH" if (bad == 0 and len(res) == len(exact)) \
                else "FAIL "
            if status == "FAIL ":
                failures += 1
            print(f"{status} {name}: hll groups {len(res)}/{len(exact)} "
                  f"worst_rel_err={worst:.4f} bound={bound:.4f} ({dt:.1f}s)")
            continue
        if name not in oracles:
            print(f"ok    {name}: rows={len(res)} cols={sorted(res.columns)}"
                  f" ({dt:.1f}s, rows-only)")
            continue
        try:
            ora = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {e}")
            failures += 1
            continue
        ok_rows = len(res) == len(ora)
        ok_cols = sorted(res.columns) == sorted(ora.columns)
        ok_hash = ok_rows and ok_cols and value_hash(res) == value_hash(ora)
        status = "MATCH" if (ok_rows and ok_cols and ok_hash) else "FAIL "
        if status == "FAIL ":
            failures += 1
        print(f"{status} {name}: rows {len(res)}/{len(ora)} "
              f"cols_ok={ok_cols} hash_ok={ok_hash} ({dt:.1f}s)")
        if not ok_cols:
            print(f"      ray={sorted(res.columns)} sql={sorted(ora.columns)}")
        if ok_rows and ok_cols and not ok_hash and len(res) < 10000:
            merged = res[sorted(res.columns)].sort_values(
                sorted(res.columns)).reset_index(drop=True)
            om = ora[sorted(ora.columns)].sort_values(
                sorted(ora.columns)).reset_index(drop=True)
            diff = (merged != om) & ~(merged.isna() & om.isna())
            bad = diff.any(axis=1)
            print("      first diffs:\n", merged[bad].head(3),
                  "\n  vs\n", om[bad].head(3))
    print("failures:", failures)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
