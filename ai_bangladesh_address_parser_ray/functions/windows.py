"""Per-key window functions, grouped top-k, exact grouped quantiles, a
deterministic hash sample, and a HyperLogLog distinct-count sketch.

Beyond-reference training-data operators (brief §"operations a large-scale
training-data pipeline would need"); the reference has no window/rank/
quantile/sketch machinery at all (SURVEY.md §2.6: "no sketches, no
approximate aggregates, no sampling, no windows"). Each operator here is
expressed Ray-Data-first and shuffle-minimal:

- ``per_key_window`` reuses the sessionize partitioning contract
  (``relational.py``): hash-bucket rows by key, ONE vectorized numpy
  kernel per bucket group (lexsort + run boundaries + segmented cumsum),
  so lag/running-sum/rank over 10^12 rows is one shuffle with O(buckets)
  Python-call overhead. Partitioning assumption: all rows of one key fit
  in one bucket group (per-user event history, not the corpus) — GUARDED:
  a key exceeding ``hot_key_limit`` rows raises with the key named
  (``relational._check_hot_keys``), never degrades silently.
- ``grouped_topk`` cuts each batch to its local per-key top-k BEFORE the
  shuffle (the classic partial top-k combiner), so the groupby moves at
  most k rows per (key, batch) instead of the full table.
- ``grouped_quantiles`` is EXACT at any scale for bounded-domain values:
  money is histogrammed in integer cents per batch (partial combine), the
  shuffle moves (group, cents, count) rows only, and the quantile is read
  off the merged CDF. No sort of the raw table, no sampling error.
- ``sample_topk_md5`` is a deterministic uniform sample: the k smallest
  md5(key) rows. md5 is the contract (any SQL engine reproduces it
  bit-for-bit); each batch reduces to its local k candidates and the
  driver folds k-row buffers, so no global sort happens.
- ``hll_distinct`` is a per-group HyperLogLog: each batch emits one dense
  2^p-byte register blob per group it saw (numpy max-reduce over xxhash
  bits), groups merge blobs by elementwise max — constant-size partials
  regardless of row count, the canonical sketch shape for 100-TB
  cardinality estimation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _cents, _ts_us, streaming_topk
from .rounding import round6_scalar

# ----------------------------------------------------- per-key windows ----


def per_key_window(events_ds, n_buckets: int = 64,
                   hot_key_limit: int = 10_000_000):
    """SQL window functions over a per-key ordered stream, one shuffle.

    For every event row, ordered by (ts, event_id) within user_id:
      gap_us        = ts - lag(ts)            (null on each user's first row)
      run_sum_cents = running sum of round(value*100)  (int64, exact)
      row_rank      = row_number()            (1-based)

    Equivalent SQL: ``lag(...) OVER w``, ``SUM(...) OVER (w ROWS UNBOUNDED
    PRECEDING)``, ``row_number() OVER w`` with
    ``w AS (PARTITION BY user_id ORDER BY ts, event_id)``. The reference
    has no window machinery; this is the transcript-native "turn gap /
    cumulative state per conversation" operator shape (north-rule stable
    (conv_id, turn_idx) ordering) applied to the events table.
    """
    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"

    def _bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.int64())
        return pa.table({
            "user_id": uid,
            "event_id": pc.cast(batch["event_id"], pa.int64()),
            "ts_us": _ts_us(batch["ts"]),
            "cents": _cents(batch["value"]),
            "bucket": pc.cast(
                pc.bit_wise_and(uid, n_buckets - 1), pa.int32()),
        })

    def _window(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        eid = group["event_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        ts = group["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        cents = group["cents"].combine_chunks().to_numpy(
            zero_copy_only=False)
        o = np.lexsort((eid, ts, uid))
        uid, eid, ts, cents = uid[o], eid[o], ts[o], cents[o]
        first = np.empty(len(uid), bool)
        first[0] = True
        np.not_equal(uid[1:], uid[:-1], out=first[1:])
        from .relational import _check_hot_keys
        _check_hot_keys(uid, first, hot_key_limit, "per_key_window")
        # lag: previous ts within the run, null at run starts
        gap = np.empty(len(ts), np.int64)
        gap[1:] = ts[1:] - ts[:-1]
        gap_arr = pa.array(gap, pa.int64(), mask=first)
        # segmented cumsum / rank: global cumsum minus value at run start
        csum = np.cumsum(cents)
        run_id = np.cumsum(first) - 1                  # 0-based run index
        starts = np.flatnonzero(first)
        base = (csum[starts] - cents[starts])[run_id]
        idx = np.arange(len(uid), dtype=np.int64)
        rank = idx - starts[run_id] + 1
        return pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "ts_us": pa.array(ts, pa.int64()),
            "gap_us": gap_arr,
            "run_sum_cents": pa.array(csum - base, pa.int64()),
            "row_rank": pa.array(rank, pa.int64()),
        })

    return (events_ds.map_batches(_bucket, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(_window, batch_format="pyarrow"))


# -------------------------------------------------------- grouped top-k ----


def grouped_topk(ds, key: str, order_col: str, tiebreak: str, k: int = 5,
                 descending: bool = True, payload: list | None = None):
    """Top-k rows per group with a 1-based ``rank`` column.

    ``row_number() OVER (PARTITION BY key ORDER BY order_col DESC,
    tiebreak)`` filtered to rank <= k. Scale shape: each batch is cut to
    its LOCAL per-key top-k first (so the groupby shuffle carries at most
    k rows per key per batch — the partial-combine trick), then one
    map_groups assigns final ranks. (order_col, tiebreak) must be a total
    order per key for determinism; use a unique tiebreak column.
    """
    def _order(tbl: pa.Table) -> pa.Table:
        return tbl.sort_by([
            (key, "ascending"),
            (order_col, "descending" if descending else "ascending"),
            (tiebreak, "ascending")])

    def _local_topk(batch: pa.Table) -> pa.Table:
        batch = _order(batch.select(
            [key, order_col, tiebreak] + list(payload or [])))
        kv = batch[key].combine_chunks()
        first = np.empty(len(batch), bool)
        if len(batch):
            first[0] = True
            neq = pc.not_equal(kv.slice(1), kv.slice(0, len(batch) - 1))
            first[1:] = neq.to_numpy(zero_copy_only=False)
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(len(batch)), 0))
        keep = (np.arange(len(batch)) - run_start) < k
        return batch.filter(pa.array(keep))

    def _final(group: pa.Table) -> pa.Table:
        group = _order(group)
        n = len(group)
        first = np.empty(n, bool)
        if n:
            kv = group[key].combine_chunks()
            first[0] = True
            first[1:] = pc.not_equal(
                kv.slice(1), kv.slice(0, n - 1)).to_numpy(
                    zero_copy_only=False)
        run_start = np.maximum.accumulate(
            np.where(first, np.arange(n), 0))
        rank = np.arange(n) - run_start + 1
        return group.append_column(
            "rank", pa.array(rank, pa.int64())).filter(pa.array(rank <= k))

    return (ds.map_batches(_local_topk, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(key)
            .map_groups(_final, batch_format="pyarrow"))


# --------------------------------------------------- grouped quantiles ----


def grouped_quantiles(events_ds, group_col: str = "event_type",
                      qs: tuple = (0.25, 0.5, 0.9)):
    """Exact discrete quantiles of value-in-cents per group.

    Quantile semantics (the unambiguous inverse-CDF definition): q-th
    quantile = the smallest cents value whose cumulative count >=
    ceil(q * n). Computed from a (group, cents)->count histogram: each
    batch pre-aggregates locally (map-side combine), the shuffle carries
    histogram cells only, and one tiny map_groups per group reads the
    quantiles off the sorted CDF. Exact at ANY scale provided the value
    DOMAIN is bounded (money in cents: ~50k distinct cells per group
    here; at 100 TB the histogram stays small while the raw table does
    not) — no sort of the raw data, no t-digest approximation error.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch[group_col],
                      "cents": _cents(batch["value"])})
        g = t.group_by([group_col, "cents"]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, "cents", "n"])

    def _quant(group: pa.Table) -> pa.Table:
        cents = group["cents"].combine_chunks().to_numpy(
            zero_copy_only=False)
        n = group["n"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.argsort(cents, kind="stable")
        cents, n = cents[o], n[o]
        cum = np.cumsum(n)
        total = cum[-1]
        row = {group_col: [group[group_col][0].as_py()],
               "n": pa.array([total], pa.int64())}
        for q in qs:
            target = int(np.ceil(q * total))
            pos = int(np.searchsorted(cum, target))
            row[f"p{int(q * 100)}_cents"] = pa.array(
                [int(cents[pos])], pa.int64())
        return pa.table(row)

    return (events_ds.map_batches(_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby([group_col, "cents"])
            .aggregate(Sum("n", alias_name="n"))
            .groupby(group_col)
            .map_groups(_quant, batch_format="pyarrow"))


# ------------------------------------------------- deterministic sample ----


def sample_topk_md5(ds, key_col: str, k: int, payload: list[str]):
    """Deterministic uniform sample: the k rows with the smallest
    md5(str(key)). md5 is the cross-engine contract — any SQL engine
    reproduces the exact same sample, which makes distributed sampling
    auditable (the reference has no sampling at all). Each batch reduces
    to its local k smallest before the driver folds k-row buffers
    (streaming_topk), so there is no global sort and no shuffle.

    The md5 loop is hashlib per row (C digest per call); it IS the
    operator's kernel, not incidental work — a non-auditable scale build
    would swap in the vectorized xxhash used for shuffle keys.
    """
    import hashlib

    def _local(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].combine_chunks()
        h = pa.array([hashlib.md5(str(v).encode()).hexdigest()
                      for v in keys.to_pylist()], pa.string())
        t = batch.select([key_col] + payload).append_column("h", h)
        return t.sort_by([("h", "ascending"),
                          (key_col, "ascending")]).slice(0, k)

    reduced = ds.map_batches(_local, batch_format="pyarrow",
                             zero_copy_batch=True)
    return streaming_topk(reduced, [("h", False), (key_col, False)], k)


# ------------------------------------------------------------ HLL sketch ----

_HLL_P = 12                      # 4096 registers, ~1.6% standard error


def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Dense HLL register array (uint8[2^p]) from uint64 hashes: bucket =
    top p bits, rho = 1 + leading zeros of the remaining 64-p bits
    (Flajolet et al., HyperLogLog 2007). Pure numpy, no Python per row."""
    m = 1 << p
    bucket = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = hashes << np.uint64(p)
    # leading zeros of the top 64-p bits via float64 exponent trick is
    # lossy; use a halving ladder instead (6 vector ops, exact).
    rho = np.ones(len(hashes), np.uint8)
    width = np.uint64(64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = (rest >> (width - s)) == 0
        rho = np.where(mask, rho + np.uint8(shift), rho)
        rest = np.where(mask, rest << s, rest)
    rho = np.minimum(rho, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, np.uint8)
    np.maximum.at(regs, bucket, rho)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (large-range correction omitted: 64-bit hashes make
    collisions at 2^32 irrelevant here)."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, group_col: str, value_col: str, p: int = _HLL_P,
                 alias: str = "approx_distinct"):
    """Approximate COUNT(DISTINCT value) per group via HyperLogLog.

    Map side: one uint8[2^p] register blob per (batch, group) — numpy
    max-scatter over vectorized xxhash of the values; constant size no
    matter how many rows the batch holds. Reduce side: registers merge by
    elementwise max (associative + commutative + idempotent, so retries
    and any partitioning give identical sketches), then one estimator
    call per group. This is the scale path for cardinality at 100 TB; the
    exact twin is ``relational.distinct_count``.
    """
    import polars as pl

    def _partial(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[value_col], pa.string())
        h = pl.from_arrow(vals).hash(seed=0).to_numpy().astype(np.uint64)
        gv = batch[group_col]
        out_g, out_r = [], []
        for g in pc.unique(gv).to_pylist():
            sel = h[pc.equal(gv, g).combine_chunks()
                    .to_numpy(zero_copy_only=False)]
            out_g.append(g)
            out_r.append(_hll_registers(sel, p).tobytes())
        return pa.table({group_col: pa.array(out_g),
                         "regs": pa.array(out_r, pa.binary())})

    def _merge(group: pa.Table) -> pa.Table:
        blobs = group["regs"].to_pylist()
        acc = np.frombuffer(blobs[0], np.uint8).copy()
        for b in blobs[1:]:
            np.maximum(acc, np.frombuffer(b, np.uint8), out=acc)
        return pa.table({
            group_col: pa.array([group[group_col][0].as_py()]),
            alias: pa.array([int(round(_hll_estimate(acc)))], pa.int64()),
        })

    return (ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col)
            .map_groups(_merge, batch_format="pyarrow"))


# --------------------------------------------------- stratified sample ----


def stratified_sample_md5(ds, group_col: str, key_col: str, k: int):
    """Deterministic stratified sample: per group, the k rows with the
    smallest md5(str(key)). The per-group twin of ``sample_topk_md5`` —
    a uniform, cross-engine-reproducible sample from EVERY stratum (the
    training-data "balance by language/source" primitive). Rides on
    ``grouped_topk``'s map-side pruning, so each batch contributes at
    most k candidate rows per stratum to the shuffle.
    """
    import hashlib

    def _h(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].combine_chunks()
        h = pa.array([hashlib.md5(str(v).encode()).hexdigest()
                      for v in keys.to_pylist()], pa.string())
        return batch.append_column("h", h)

    hashed = ds.map_batches(_h, batch_format="pyarrow",
                            zero_copy_batch=True)
    return grouped_topk(hashed, group_col, "h", key_col, k=k,
                        descending=False)


# ------------------------------------------------ grouped correlation ----


def grouped_corr(ds, group_col: str, x_col: str, y_col: str,
                 y_cents: bool = False, alias: str = "corr"):
    """Pearson correlation per group from EXACT integer moments.

    Single pass: each batch emits int64 partial moments (n, Sx, Sy, Sxx,
    Syy, Sxy), one groupby sums them, and the final (tiny) stage computes
    ``(n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))`` with
    Python arbitrary-precision ints up to the last float64 conversion —
    the same value any SQL engine gets from HUGEINT moments, so the
    double is bit-identical regardless of row order or partitioning
    (streaming Welford implementations cannot promise that); the output
    is then rounded to 6dp with the engine-independent floor round
    (``functions/rounding.py``, round-5 drift policy), matching the
    SQL twin's identical floor expression. x must be
    integral; y is either integral or money rounded to cents
    (``y_cents``). int64 is safe per batch; the cross-batch sums ride
    int64 too — at 10^12-row scale promote the partials to float128/
    decimal or shard the moments.
    """
    from ray.data.aggregate import Sum

    def _moments(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch[x_col], pa.int64())
        y = _cents(batch[y_col]) if y_cents \
            else pc.cast(batch[y_col], pa.int64())
        xn = x.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(x, pa.ChunkedArray) else x.to_numpy()
        yn = y.combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(y, pa.ChunkedArray) else y.to_numpy()
        g = batch[group_col]
        t = pa.table({group_col: g,
                      "n": pa.array(np.ones(len(xn), np.int64)),
                      "sx": pa.array(xn), "sy": pa.array(yn),
                      "sxx": pa.array(xn * xn), "syy": pa.array(yn * yn),
                      "sxy": pa.array(xn * yn)})
        agg = t.group_by([group_col]).aggregate(
            [(c, "sum") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
        return agg.rename_columns(
            [group_col, "n", "sx", "sy", "sxx", "syy", "sxy"])

    def _final(batch: pa.Table) -> pa.Table:
        import math
        out_g, out_c = [], []
        for i in range(len(batch)):
            n, sx, sy, sxx, syy, sxy = (
                int(batch[c][i].as_py())
                for c in ("n", "sx", "sy", "sxx", "syy", "sxy"))
            num = n * sxy - sx * sy
            d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
            c = (round6_scalar(float(num) / math.sqrt(float(d1) * float(d2)))
                 if d1 > 0 and d2 > 0 else None)
            out_g.append(batch[group_col][i].as_py())
            out_c.append(c)
        return pa.table({group_col: pa.array(out_g),
                         alias: pa.array(out_c, pa.float64())})

    return (ds.map_batches(_moments, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col)
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
            .map_batches(_final, batch_format="pyarrow"))


# ------------------------------------------------------- grouped mode ----


def grouped_mode(ds, group_col: str, val_col: str, alias: str = "mode"):
    """Most frequent value per group, ties broken by the SMALLEST value
    (an explicit total order — SQL ``mode()`` tie behavior is
    engine-defined, this is not). Map-side (group, value) histogram,
    then the grouped-top-k machinery picks count-desc/value-asc rank 1.
    The histogram shuffle carries distinct cells, never rows.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col, val_col]) \
            .group_by([group_col, val_col]).aggregate([([], "count_all")])
        return g.rename_columns([group_col, val_col, "n"])

    hist = (ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([group_col, val_col])
            .aggregate(Sum("n", alias_name="n")))
    top = grouped_topk(hist, group_col, "n", val_col, k=1)

    def _name(batch: pa.Table) -> pa.Table:
        return pa.table({group_col: batch[group_col],
                         alias: batch[val_col],
                         "n": batch["n"]})

    return top.map_batches(_name, batch_format="pyarrow")
