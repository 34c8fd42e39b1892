"""User CLI (reference S3: ``production_address_extractor.py --demo /
--batch / --address``, :1260-1285 — re-expressed over Ray Data).

    python -m ai_bangladesh_address_parser_ray --address "House 12, ..."
    python -m ai_bangladesh_address_parser_ray --batch in.parquet out_dir/
    python -m ai_bangladesh_address_parser_ray --linkage transcripts_dir out/
    python -m ai_bangladesh_address_parser_ray --demo

--address runs the kernel in-process (no cluster needed). --batch expects a
parquet with a ``text`` column and writes partitioned parquet with the 9
component columns. --linkage expects the transcript schema and writes
per-turn cluster assignments. Owns its Ray session (the only library-side
ray.init, guarded), per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys


DEMO_ADDRESSES = [
    "House 12, Road 5, Dhanmondi, Dhaka-1209",
    "H-৭, রোড ৩, মিরপুর, ঢাকা",
    "Kha/50, Gulshan, Dhaka",
    "Plot No 8, Savar, Dhaka",
    "Flat B2, 3rd floor, House 7, Banani, Dhaka-1213",
]


def _init_ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 log_to_driver=False)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False


def cmd_address(text: str, detailed: bool, profile: str = None) -> int:
    from .kernel.extract import ExtractionKernel, extract, stages_for_profile
    if profile:
        res = ExtractionKernel(
            stages=stages_for_profile(profile)).extract(text,
                                                        detailed=detailed)
    else:
        res = extract(text, detailed=detailed)
    print(json.dumps(res, ensure_ascii=False, indent=2, default=str))
    return 0


def cmd_demo() -> int:
    for a in DEMO_ADDRESSES:
        cmd_address(a, detailed=False)
    return 0


def cmd_batch(in_path: str, out_dir: str, detailed: bool,
              text_col: str = "text", limit: int = 0,
              profile: str = None) -> int:
    _init_ray()
    import time

    import ray
    from .stages.extract import extract_stage
    t0 = time.time()
    ds = ray.data.read_parquet(in_path)
    if limit:
        ds = ds.limit(limit)
    stages = None
    if profile:
        from .kernel.extract import stages_for_profile
        stages = stages_for_profile(profile)
    # bulk surface: reference bulk_extract contract (extractor.py:336-339,
    # :513-544 on_error) — a poison row becomes an error-result row
    # (empty components + error column) instead of failing the batch job
    ds = extract_stage(ds, text_column=text_col, detailed=detailed,
                       stages=stages, capture_errors=True)
    ds.write_parquet(out_dir)
    # count from the WRITTEN single column — re-counting `ds` would
    # re-execute the whole extraction plan a second time
    written = ray.data.read_parquet(out_dir, columns=["error"])
    n = written.count()
    n_err = written.filter(expr="error != ''").count()
    dt = time.time() - t0
    # the reference --batch logs addresses/second (:1256) — same headline
    print(f"wrote {n} extracted rows ({n_err} error rows) to {out_dir} "
          f"in {dt:.1f}s ({n / max(dt, 1e-9):,.0f} addresses/second)",
          file=sys.stderr)
    return 0


def cmd_linkage(in_dir: str, out_dir: str, checkpoint: str | None) -> int:
    _init_ray()
    import ray
    from .pipelines.linkage import LinkageConfig, run_linkage
    ds = ray.data.read_parquet(in_dir)
    cfg = LinkageConfig(checkpoint_dir=checkpoint)
    out = run_linkage(ds, cfg, input_token=in_dir)
    out["turns"].write_parquet(out_dir)
    print(json.dumps({"metrics": out["metrics"]}, default=str),
          file=sys.stderr)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ai_bangladesh_address_parser_ray")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--address", help="extract one address string")
    g.add_argument("--demo", action="store_true")
    g.add_argument("--batch", nargs=2, metavar=("IN_PARQUET", "OUT_DIR"))
    g.add_argument("--linkage", nargs=2, metavar=("IN_DIR", "OUT_DIR"))
    p.add_argument("--detailed", action="store_true",
                   help="include debug evidence metadata")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--text-col", default="text",
                   help="input column holding the address text (--batch)")
    p.add_argument("--limit", type=int, default=0,
                   help="only process the first N rows (--batch)")
    p.add_argument("--profile", default=None,
                   choices=["fast", "balanced", "accurate"],
                   help="stage profile (reference control_stages.py "
                        "fast/balanced/accurate bundles)")
    args = p.parse_args(argv)

    if args.address:
        return cmd_address(args.address, args.detailed, args.profile)
    if args.demo:
        return cmd_demo()
    if args.batch:
        return cmd_batch(args.batch[0], args.batch[1], args.detailed,
                         text_col=args.text_col, limit=args.limit,
                         profile=args.profile)
    return cmd_linkage(args.linkage[0], args.linkage[1],
                       args.checkpoint_dir)


if __name__ == "__main__":
    raise SystemExit(main())
