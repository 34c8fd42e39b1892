"""Benchmark harness — one JSON line on stdout (driver contract).

Headline pipeline: record linkage (normalize -> dedup-extract -> blocking ->
pair-gen -> scoring -> union-find) over the deterministic synthetic
transcript table derived from $GRAFT_SF_DIR's scale, plus the
training-data operator suite over the driver parquet tables.

  python bench.py             # single run, prints the JSON line
  python bench.py --scaling   # same job at num_cpus=8 and 32 in fresh
                              # processes; reports throughput + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# median-of-N per query: this box is shared and single runs wander +-15%
# (the round-3 "linkage regression" was exactly such a wander); medians
# with recorded spread make rounds comparable. GRAFT_BENCH_REPS=1 for
# quick iteration.
REPS = int(os.environ.get("GRAFT_BENCH_REPS", "3"))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _init_ray(num_cpus: int):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, log_to_driver=False)
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False


def run_linkage_bench(sf_dir: str):
    """Headline: full linkage pipeline; returns (seconds, turns, turns/sec).

    A small warm-up run first: actor-pool and shuffle-aggregator spin-up is
    a per-session cold-start cost (~tens of seconds, identical at every
    CPU count), and the scaling criterion is about steady-state throughput.
    The timed run consumes by writing partitioned Parquet — the real sink —
    so consumption parallelizes instead of pulling rows to the driver."""
    import shutil
    import ray
    from ai_bangladesh_address_parser_ray.pipelines.linkage import (
        LinkageConfig, run_linkage)
    from ai_bangladesh_address_parser_ray.sources.synthetic import (
        synth_dir_for, write_transcript_tables)

    warm_dir = write_transcript_tables(
        "/tmp/abap_synth/warmup", seed=7, n_convs=60, turns_per_conv=8,
        n_entities=20)
    warm = ray.data.read_parquet(f"{warm_dir}/transcripts")
    run_linkage(warm, LinkageConfig())["turns"].count()

    d = synth_dir_for(sf_dir)
    ds = ray.data.read_parquet(f"{d}/transcripts")
    n_turns = ds.count()
    if n_turns <= 200_000:
        # the toy warm-up touches only a few Ray workers; at bench scale the
        # first full run still pays per-worker package import + gazetteer
        # asset load on the other ~30 workers (a per-SESSION cost, not a
        # per-run one — measured ~+3s on rep 1 only). One untimed full pass
        # makes every timed rep steady-state. Skipped at scaling-sweep scale
        # where a single run is minutes and amortizes its own cold start.
        run_linkage(ds, LinkageConfig())["turns"].count()
    out_dir = "/tmp/abap_bench_out"
    times = []
    for _ in range(REPS):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        out = run_linkage(ds, LinkageConfig())
        out["turns"].write_parquet(out_dir)
        times.append(time.time() - t0)
        import pyarrow.dataset as pads
        rows = pads.dataset(out_dir).count_rows()
        assert rows == n_turns, (rows, n_turns)
    dt = _median(times)
    return dt, n_turns, n_turns / dt, times


def run_query_suite(sf_dir: str) -> dict:
    """Secondary per-query timings over the driver tables."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E
    qs = E.queries()
    picks = ["exact_dedup_docs", "token_counts_docs", "quality_docs",
             "doc_stats_by_lang", "lineitem_pricing", "normalize_docs",
             "knn_cosine_topk", "embedding_dup_pairs", "simhash_dup_pairs",
             "minhash_dup_pairs", "near_dup_clusters", "training_corpus",
             "events_sessionized",
             "asof_signup_attribution", "lang_id_docs", "repetition_docs",
             "unshipped_revenue_topk", "events_user_windows",
             "events_value_quantiles", "events_hll_users"]
    out, spread = {}, {}
    for name in picks:
        times = []
        for _ in range(REPS):
            t0 = time.time()
            res = qs[name](sf_dir)
            if hasattr(res, "iter_batches"):      # Dataset: consume stream
                n = 0
                for b in res.iter_batches(batch_format="pyarrow"):
                    n += b.num_rows
            else:
                n = len(res)
            times.append(time.time() - t0)
        out[name] = round(_median(times), 3)
        spread[name] = [round(t, 3) for t in times]
    return out, spread


def single_run(num_cpus: int, include_queries: bool = True) -> dict:
    _init_ray(num_cpus)
    link_s, n_turns, tps, link_times = run_linkage_bench(SF_DIR)
    queries = {"linkage": round(link_s, 3)}
    spread = {"linkage": [round(t, 3) for t in link_times]}
    if include_queries:
        q, s = run_query_suite(SF_DIR)
        queries.update(q)
        spread.update(s)
    total = sum(queries.values())
    return {
        "metric": "total_pipeline_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "reps": REPS,
        "queries_spread": spread,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "linkage_turns": n_turns,
        "linkage_turns_per_sec": round(tps, 1),
    }


def _subprocess_run(num_cpus: int, preset: str = "") -> dict:
    """Fresh process + fresh ray session at the given CPU count."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(num_cpus))
    # scaling legs run the XXL preset (minutes per run): one rep per leg
    # unless the caller explicitly asks for more
    env.setdefault("GRAFT_BENCH_REPS", "1")
    if preset:
        env["GRAFT_SYNTH_PRESET"] = preset
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--single-linkage"],
        env=env, capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def scaling():
    """North-rule scaling evidence: same job, fresh sessions at N and 4N
    CPUs (the sandbox stand-in for N vs 4N nodes). Defaults to the
    sf-scaling-xxl preset (19.2M turns) so parallel compute dominates
    fixed Ray latencies — efficiency at toy scale measures startup cost,
    not the pipeline (override with GRAFT_SYNTH_PRESET)."""
    # the N and 4N "cluster sizes" (sandbox stand-in: CPU budgets in fresh
    # processes). GRAFT_SCALING_CPUS accepts one pair ("8,32") or several
    # (";"-separated, e.g. "2,8;4,16;8,32" — the three N->4N points that
    # bracket this box's memory-bus ceiling curve). Each distinct CPU count
    # runs ONCE and is reused across pairs.
    spec = os.environ.get("GRAFT_SCALING_CPUS", "8,32")
    pairs = [tuple(int(x) for x in p.split(","))
             for p in spec.split(";") if p.strip()]
    preset = os.environ.get("GRAFT_SYNTH_PRESET", "sf-scaling-xxl")
    # pre-generate the shared input once so no timed run pays it
    os.environ["GRAFT_SYNTH_PRESET"] = preset
    from ai_bangladesh_address_parser_ray.sources.synthetic import synth_dir_for
    synth_dir_for(SF_DIR)
    runs: dict = {}
    for cpus in sorted({c for p in pairs for c in p}):
        runs[cpus] = _subprocess_run(cpus, preset)

    def _ceiling(lo, hi):
        # calibrate against THIS box's shared-memory ceiling: the same
        # extraction kernel under plain multiprocessing (no Ray, no
        # shuffles) at lo vs hi procs — on one box, hi procs share one
        # memory bus, so even embarrassingly parallel work cannot reach
        # hi/lo x. On a real N->4N NODE cluster each node brings its own
        # bus and the ceiling does not apply (tools/platform_ceiling.py).
        try:
            ceil_out = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "platform_ceiling.py"),
                 str(lo), str(hi)],
                capture_output=True, text=True, timeout=420)
            return json.loads(
                ceil_out.stdout.strip().splitlines()[-1])["kernel_ceiling"]
        except Exception:
            return None

    results = []
    for lo, hi in pairs:
        tput_lo = runs[lo]["linkage_turns_per_sec"]
        tput_hi = runs[hi]["linkage_turns_per_sec"]
        eff = (tput_hi / tput_lo) / (hi / lo)
        entry = {"cpus_lo": lo, "cpus_hi": hi,
                 "throughput_lo": tput_lo, "throughput_hi": tput_hi,
                 "wall_lo": runs[lo]["queries"]["linkage"],
                 "wall_hi": runs[hi]["queries"]["linkage"],
                 "efficiency": round(eff, 3)}
        ceiling = _ceiling(lo, hi)
        if ceiling:
            entry["platform_ceiling_kernel"] = ceiling
            entry["efficiency_vs_platform"] = round(eff / ceiling, 3)
        results.append(entry)

    head = results[-1]
    out = {
        "metric": "scaling_efficiency",
        "value": head["efficiency"],
        "unit": "ratio",
        "queries": {f"linkage_cpus{c}": r["queries"]["linkage"]
                    for c, r in runs.items()},
        "sf": SF_DIR,
        "num_cpus": head["cpus_hi"],
        "throughput_lo": head["throughput_lo"],
        "throughput_hi": head["throughput_hi"],
        "cpus_lo": head["cpus_lo"],
        "cpus_hi": head["cpus_hi"],
        "pairs": results,
    }
    if "platform_ceiling_kernel" in head:
        out["platform_ceiling_kernel"] = head["platform_ceiling_kernel"]
        out["efficiency_vs_platform"] = head["efficiency_vs_platform"]
    print(json.dumps(out))


def main():
    if "--scaling" in sys.argv:
        scaling()
    elif "--single-linkage" in sys.argv:
        # child mode for --scaling: linkage only, fresh session
        print(json.dumps(single_run(NUM_CPUS, include_queries=False)))
    else:
        print(json.dumps(single_run(NUM_CPUS)))
    import ray
    ray.shutdown()


if __name__ == "__main__":
    main()
