"""Measure THIS machine's compute-scaling ceiling at two parallelism
levels — the calibration baseline for interpreting `bench.py --scaling`.

The north-rule scaling criterion compares the same job at N and 4N CPUs
on ONE shared-memory box (the sandbox stand-in for N vs 4N nodes). On one
box, 4x the processes share one memory subsystem, so even a perfectly
parallel workload cannot reach 4.0x: this script measures that hardware
ceiling with NO Ray, NO shuffles, NO coordination — plain multiprocessing
running (a) the actual extraction kernel over REPRESENTATIVE data and (b)
a numpy-mix control. Pipeline efficiency should be judged against ceiling
(a), not against 1.0: on a real N->4N node cluster each node brings its
own memory bus, so the single-box ceiling does not apply.

Representativeness matters: an earlier version looped the kernel over 8
fixed strings, which after the round-4 per-worker fuzzy-match memo became
a ~100% memo-hit loop — cache-resident, allocation-light, measuring ~0.97
"ceiling" while the real kernel (diverse strings, realistic memo hit
rate, full allocation traffic) tops out far lower. Now every worker
process extracts a DISTINCT shard of the same synthetic transcript corpus
the pipeline benchmarks on (pre-normalized, ``pre_normalized=True``,
actor-style per-process kernel + memo — exactly the pipeline's per-worker
behavior), so the measured ceiling is the kernel the pipeline actually
runs.

Usage: python tools/platform_ceiling.py [lo] [hi]   (defaults 8 32)
Prints one JSON line.
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECONDS = 10.0
CAP_PER_PROC = 200_000   # texts per worker: bounds every leg's wall time
_SHARD = None   # full corpus, set once per worker by the pool initializer
_BARRIER = None  # aligns workers so only the extract loop is timed


def _corpus():
    """Raw texts of the scaling-sweep synthetic corpus (480k turns by
    default) — generated deterministically if absent, no Ray needed. Big
    enough that a worker's SINGLE pass over its shard takes seconds: a
    loop that rotates a small shard turns the per-worker memo into a ~100%
    hit cache and measures nothing (see module docstring).

    The preset is PINNED to sf-scaling (480k turns): the text distribution
    is identical across presets, so the ceiling is preset-independent —
    but inheriting the sweep's GRAFT_SYNTH_PRESET (xl = 4.8M texts) once
    made the 2- and 4-proc legs take >420s and silently time out inside
    `bench.py --scaling`. Per-worker shards are additionally capped at
    CAP_PER_PROC texts (~90s of kernel work), which keeps every leg
    bounded regardless of proc count."""
    os.environ["GRAFT_SYNTH_PRESET"] = "sf-scaling"
    from ai_bangladesh_address_parser_ray.sources.synthetic import synth_dir_for
    import pyarrow.dataset as pads
    d = synth_dir_for(os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    return (pads.dataset(f"{d}/transcripts").to_table(columns=["text"])
            ["text"].to_pylist())


def _init(texts, barrier):
    global _SHARD, _BARRIER
    _SHARD = texts
    _BARRIER = barrier


def _kernel_work(args):
    """ONE pass over this worker's distinct corpus shard — same distinct
    ratio, memo hit rate, and allocation traffic as a pipeline worker.
    Normalization runs UNTIMED (the pipeline normalizes in a separate
    vectorized Arrow stage; the kernel runs pre_normalized), then every
    worker waits on a barrier so all extract loops start together — the
    returned per-worker elapsed covers ONLY the kernel under full
    contention. An earlier version timed the whole pool map, which blended
    normalize scaling into the reported kernel ceiling."""
    idx, n_procs = args
    from ai_bangladesh_address_parser_ray.kernel.extract import ExtractionKernel
    from ai_bangladesh_address_parser_ray.kernel.normalizer import normalize
    texts = [normalize(t or "")
             for t in _SHARD[idx::n_procs][:CAP_PER_PROC]]
    k = ExtractionKernel()
    _BARRIER.wait()
    t0 = time.time()
    for t in texts:
        k.extract(t, pre_normalized=True)
    return len(texts), time.time() - t0


def _numpy_work(args):
    import numpy as np
    _BARRIER.wait()
    t0 = time.time()
    n = 0
    s = "House 12, Road 5, Dhanmondi, Dhaka 1209"
    while time.time() - t0 < SECONDS:
        for _ in range(200):
            "".join(c.lower() for c in s if c.isalnum())
            np.sort(np.random.default_rng(1).integers(0, 1000, 500))
        n += 200
    return n, time.time() - t0


def _rate(fn, procs: int, texts) -> float:
    """items/sec across ``procs`` workers, timing only the barrier-aligned
    work section: total items / slowest worker's timed elapsed. Exactly
    ``procs`` map items over ``procs`` workers (chunksize 1), so every
    worker reaches the barrier once and the pool cannot deadlock."""
    barrier = mp.Barrier(procs)
    with mp.Pool(procs, initializer=_init, initargs=(texts, barrier)) as p:
        res = p.map(fn, [(i, procs) for i in range(procs)], chunksize=1)
    total = sum(n for n, _ in res)
    return total / max(e for _, e in res)


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    texts = _corpus()
    out = {"lo_procs": lo, "hi_procs": hi, "corpus_texts": len(texts)}
    for name, fn in (("kernel", _kernel_work), ("numpy_mix", _numpy_work)):
        r_lo, r_hi = _rate(fn, lo, texts), _rate(fn, hi, texts)
        out[f"{name}_rate_lo"] = round(r_lo)
        out[f"{name}_rate_hi"] = round(r_hi)
        out[f"{name}_ceiling"] = round((r_hi / r_lo) / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
