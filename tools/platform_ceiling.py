"""Measure THIS machine's compute-scaling ceiling at two parallelism
levels — the calibration baseline for interpreting `bench.py --scaling`.

The north-rule scaling criterion compares the same job at N and 4N CPUs
on ONE shared-memory box (the sandbox stand-in for N vs 4N nodes). On one
box, 4x the processes share one memory subsystem, so even a perfectly
parallel workload cannot reach 4.0x: this script measures that hardware
ceiling with NO Ray, NO shuffles, NO coordination — plain multiprocessing
running (a) the actual extraction kernel (string-heavy Python, the
pipeline's dominant compute) and (b) a numpy-mix control. Pipeline
efficiency should be judged against ceiling (a), not against 1.0: on a
real N->4N node cluster each node brings its own memory bus, so the
single-box ceiling does not apply.

Usage: python tools/platform_ceiling.py [lo] [hi]   (defaults 8 32)
Prints one JSON line.
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ADDRS = [
    "House 12, Road 5, Dhanmondi, Dhaka 1209",
    "Flat B-4, House kha-32/1, Mirpur 10, Dhaka",
    "Holding 7, Ward 3, Agrabad, Chittagong 4100",
    "বাড়ি ১২, রোড ৫, ধানমন্ডি, ঢাকা",
    "Plot 9, Sector 11, Uttara, Dhaka-1230",
    "just some filler text with no address at all",
    "H#45/A, Block C, Bashundhara R/A, Dhaka-1229",
    "vill: Charbata, upazila Sonaimuri, Noakhali",
]
SECONDS = 10.0


def _kernel_work(_):
    from ai_bangladesh_address_parser_ray.kernel.extract import ExtractionKernel
    from ai_bangladesh_address_parser_ray.kernel.normalizer import normalize
    k = ExtractionKernel()
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECONDS:
        for a in ADDRS:
            k.extract(normalize(a))
        n += len(ADDRS)
    return n


def _numpy_work(_):
    import numpy as np
    t0 = time.time()
    n = 0
    s = ADDRS[0]
    while time.time() - t0 < SECONDS:
        for _ in range(200):
            "".join(c.lower() for c in s if c.isalnum())
            np.sort(np.random.default_rng(1).integers(0, 1000, 500))
        n += 200
    return n


def _rate(fn, procs: int) -> float:
    with mp.Pool(procs) as p:
        t0 = time.time()
        total = sum(p.map(fn, range(procs)))
        return total / (time.time() - t0)


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    out = {"lo_procs": lo, "hi_procs": hi}
    for name, fn in (("kernel", _kernel_work), ("numpy_mix", _numpy_work)):
        r_lo, r_hi = _rate(fn, lo), _rate(fn, hi)
        out[f"{name}_rate_lo"] = round(r_lo)
        out[f"{name}_rate_hi"] = round(r_hi)
        out[f"{name}_ceiling"] = round((r_hi / r_lo) / (hi / lo), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
