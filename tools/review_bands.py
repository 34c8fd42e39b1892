"""Per-component confidence-band review tooling (reference parity:
``house_number_processor.py:1248-1460`` cmd_split / cmd_reprocess /
cmd_sync), re-expressed Ray-Data-first.

The reference splits its JSON corpus into per-confidence-band directories
for manual review, re-processes one band after pattern changes, and syncs
reviewed values back. Here the same workflow runs as ONE distributed pass:

- **split**: read the corpus parquet -> normalize -> per-distinct-text
  detailed extraction (per-worker cached kernel) -> band assignment ->
  ``write_parquet(out, partition_cols=["band"])``. One directory per band
  (the reference's split layout), resumable, plus a printed histogram.
- **reprocess <band>**: re-run extraction over one band's partition with
  the CURRENT pattern bank and report movement between bands — the
  iterate-on-patterns loop.
- **sync**: left-join a reviewed ``(id, value)`` parquet back onto a main
  table and write the corrected copy.

Usage:
  python tools/review_bands.py split <corpus.parquet> <out_dir> \
      [--component house_number] [--text-col text] [--id-col doc_id]
  python tools/review_bands.py reprocess <out_dir> <band> \
      [--component house_number]
  python tools/review_bands.py sync <main.parquet> <reviewed.parquet> \
      <out.parquet> [--component house_number] [--id-col doc_id]
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the reference's band ladder (numbered prefixes keep directory sort order)
BANDS = [
    ("1.excellent_95_100", 0.95, 1.01),
    ("2.very_high_90_95", 0.90, 0.95),
    ("3.high_85_90", 0.85, 0.90),
    ("4.good_80_85", 0.80, 0.85),
    ("5.medium_high_75_80", 0.75, 0.80),
    ("6.medium_70_75", 0.70, 0.75),
    ("7.acceptable_65_70", 0.65, 0.70),
    ("8.low_below_65", 0.00, 0.65),
]

_KERNEL = None  # one detailed kernel per worker process


def _band_of(value: str, conf: float) -> str:
    if not value or conf < 0.0:
        return "no_component"
    for name, lo, hi in BANDS:
        if lo <= conf < hi:
            return name
    return "no_component"


def _band_batch(batch: pa.Table, component: str, text_col: str) -> pa.Table:
    """(rows...) -> + value/confidence/band for one component. The kernel
    builds once per worker process; detailed mode exposes the resolved
    per-component confidence the band ladder needs."""
    global _KERNEL
    if _KERNEL is None:
        from ai_bangladesh_address_parser_ray.kernel.extract import (
            ExtractionKernel)
        _KERNEL = ExtractionKernel()
    vals, confs, bands = [], [], []
    memo: dict = {}
    for t in batch[text_col].to_pylist():
        t = t or ""
        hit = memo.get(t)
        if hit is None:
            res = _KERNEL.extract(t, detailed=True)
            detail = res["metadata"]["component_details"].get(component)
            hit = ((detail["value"], float(detail["confidence"]))
                   if detail else ("", -1.0))
            memo[t] = hit
        vals.append(hit[0])
        confs.append(hit[1])
        bands.append(_band_of(hit[0], hit[1]))
    return (batch
            .append_column("value", pa.array(vals, pa.string()))
            .append_column("confidence", pa.array(confs, pa.float64()))
            .append_column("band", pa.array(bands, pa.string())))


def _banded(ds, component: str, text_col: str):
    return ds.map_batches(
        _band_batch, fn_kwargs=dict(component=component, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)


def _histogram(ds) -> dict:
    from ray.data.aggregate import Count
    rows = ds.groupby("band").aggregate(Count(alias_name="n")).take_all()
    return {r["band"]: r["n"] for r in rows}


def cmd_split(args) -> None:
    import ray.data
    ds = ray.data.read_parquet(args.corpus)
    banded = _banded(ds, args.component, args.text_col)
    banded.write_parquet(args.out_dir, partition_cols=["band"])
    hist = _histogram(ray.data.read_parquet(args.out_dir))
    total = sum(hist.values())
    print(f"split: component={args.component} rows={total} -> {args.out_dir}")
    for name in [b[0] for b in BANDS] + ["no_component"]:
        n = hist.get(name, 0)
        print(f"  {name:24s} {n:8d}  {n / max(total, 1):6.1%}")


def cmd_reprocess(args) -> None:
    import ray.data
    part = os.path.join(args.out_dir, f"band={args.band}")
    if not os.path.isdir(part):
        raise SystemExit(f"no such band partition: {part}")
    old = ray.data.read_parquet(part)
    # read_parquet re-materializes the hive partition value as a "band"
    # column — drop the stale assignment columns before re-banding
    stale = [c for c in ("value", "confidence", "band")
             if c in old.schema().names]
    redone = _banded(old.drop_columns(stale), args.component, args.text_col)
    moved = redone.map_batches(
        lambda b: b.group_by("band").aggregate([([], "count_all")])
        .rename_columns(["band", "n"]),
        batch_format="pyarrow")
    from ray.data.aggregate import Sum
    rows = moved.groupby("band").aggregate(
        Sum("n", alias_name="n")).take_all()
    total = sum(r["n"] for r in rows)
    print(f"reprocess: band={args.band} rows={total} with current patterns:")
    for r in sorted(rows, key=lambda r: r["band"]):
        mark = "  (unchanged)" if r["band"] == args.band else "  <- MOVED"
        print(f"  {r['band']:24s} {r['n']:8d}{mark}")


def cmd_sync(args) -> None:
    """Apply reviewed (id, value) corrections onto the main table — the
    reviewed side is small by construction (one band), so broadcast it."""
    import pyarrow.parquet as pq
    reviewed = pq.read_table(args.reviewed, columns=[args.id_col, "value"])
    fixes = dict(zip(reviewed[args.id_col].to_pylist(),
                     reviewed["value"].to_pylist()))
    import ray
    import ray.data
    fixes_ref = ray.put(fixes)

    def _apply(batch: pa.Table) -> pa.Table:
        f = ray.get(fixes_ref)
        ids = batch[args.id_col].to_pylist()
        if args.component in batch.column_names:
            cur = batch[args.component].to_pylist()
            out = [f.get(i, c) for i, c in zip(ids, cur)]
            idx = batch.column_names.index(args.component)
            return batch.set_column(idx, args.component,
                                    pa.array(out, pa.string()))
        return batch.append_column(
            args.component,
            pa.array([f.get(i, "") for i in ids], pa.string()))

    ds = ray.data.read_parquet(args.main).map_batches(
        _apply, batch_format="pyarrow", zero_copy_batch=True)
    ds.write_parquet(args.out)
    print(f"sync: {len(fixes)} reviewed values applied -> {args.out}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("split")
    s.add_argument("corpus")
    s.add_argument("out_dir")
    s.add_argument("--component", default="house_number")
    s.add_argument("--text-col", default="text")
    s.set_defaults(fn=cmd_split)

    r = sub.add_parser("reprocess")
    r.add_argument("out_dir")
    r.add_argument("band")
    r.add_argument("--component", default="house_number")
    r.add_argument("--text-col", default="text")
    r.set_defaults(fn=cmd_reprocess)

    y = sub.add_parser("sync")
    y.add_argument("main")
    y.add_argument("reviewed")
    y.add_argument("out")
    y.add_argument("--component", default="house_number")
    y.add_argument("--id-col", default="doc_id")
    y.set_defaults(fn=cmd_sync)

    args = p.parse_args()
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, log_to_driver=False)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    args.fn(args)
    ray.shutdown()


if __name__ == "__main__":
    main()
