"""Relational operators for the training-data pipeline: broadcast hash
join, join+top-k, gap sessionization, as-of join, static range join, and
tumbling-window aggregates.

These go beyond the reference's operator set (the brief's "operations a
large-scale training-data pipeline would need"); each is expressed
Ray-Data-first and shuffle-minimal:

- Small dimension sides are broadcast ONCE via ``ray.put`` as zero-copy
  buffers (sorted ``int64`` key vector + Arrow payload arrays), looked up
  with ``np.searchsorted`` inside ``map_batches`` — never a distributed
  join shuffle, never per-task dict/Index deserialization.
- Order-dependent operators (sessionize, as-of) hash-bucket rows by the
  partition key (``key % n_buckets``) and run ONE vectorized numpy kernel
  per bucket group, so the shuffle moves each row once and the per-group
  Python-call overhead is O(buckets), not O(keys). The partitioning
  assumption: all rows of one key fit in one bucket group's memory —
  true for per-user event streams (the hot key is bounded by one user's
  history, not the corpus).
- Money sums are computed in integer cents (``round(x*100)`` as int64) so
  distributed partial aggregation is exact and bit-identical to any SQL
  engine regardless of summation order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data.aggregate import Count, Sum

_US_PER_S = 1_000_000


def _ts_us(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """timestamp[*] -> int64 epoch microseconds (DuckDB ``epoch_us``)."""
    return pc.cast(pc.cast(arr, pa.timestamp("us")), pa.int64())


def _cents(arr) -> pa.ChunkedArray:
    """double dollars -> int64 cents, half-away-from-zero like SQL round."""
    return pc.cast(pc.round(pc.multiply(pc.cast(arr, pa.float64()), 100.0),
                            round_mode="half_towards_infinity"), pa.int64())


# ------------------------------------------------------ broadcast join ----

def broadcast_join(ds, right: pa.Table, left_on: str, right_on: str,
                   payload: list[str] | None = None):
    """Left broadcast hash join on an int64 key.

    ``right`` must be driver-small (a dimension). It is sorted by key and
    shipped once through the object store as a numpy key vector plus Arrow
    payload columns — zero-copy reads in every map task, no shuffle of the
    big side, no per-task hashtable build (``np.searchsorted`` per batch).
    Unmatched left rows keep nulls in the payload columns.
    """
    payload = payload or [c for c in right.column_names if c != right_on]
    keys = right[right_on].combine_chunks().to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    cols = {c: right[c].combine_chunks().take(pa.array(order))
            for c in payload}
    ref = ray.put((keys, cols))

    def _join(batch: pa.Table) -> pa.Table:
        k_arr, p_cols = ray.get(ref)
        if len(k_arr) == 0:
            out = batch
            for c, arr in p_cols.items():
                out = out.append_column(c, pa.nulls(len(batch), arr.type))
            return out
        bk = batch[left_on].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(k_arr, bk)
        idx_c = np.minimum(idx, len(k_arr) - 1)
        hit = k_arr[idx_c] == bk
        take = pa.array(np.where(hit, idx_c, -1), pa.int64())
        take = pc.if_else(pc.equal(take, -1), pa.scalar(None, pa.int64()),
                          take)
        out = batch
        for c, arr in p_cols.items():
            out = out.append_column(c, arr.take(take))
        return out

    return ds.map_batches(_join, batch_format="pyarrow",
                          zero_copy_batch=True)


def revenue_topk(orders_ds, customer: pa.Table, k: int = 10):
    """Per-customer order revenue top-k with the customer name joined in.

    Pre-aggregates integer-cent revenue per custkey (partial combine inside
    the groupby), broadcast-joins the small customer dim, then sorts only
    the one-row-per-customer aggregate. Ties break on ascending custkey.
    """
    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "revenue_cents": _cents(batch["o_totalprice"]),
        })

    agg = (orders_ds.map_batches(_prep, batch_format="pyarrow",
                                 zero_copy_batch=True)
           .groupby("o_custkey")
           .aggregate(Sum("revenue_cents", alias_name="revenue_cents"),
                      Count("revenue_cents", alias_name="n_orders")))
    joined = broadcast_join(agg, customer, "o_custkey", "c_custkey",
                            payload=["c_name"])
    return streaming_topk(joined, [("revenue_cents", True),
                                   ("o_custkey", False)], k)


def streaming_topk(ds, order_by, k: int) -> pa.Table:
    """Global top-k WITHOUT the sort all-to-all: the dataset streams and the
    driver folds each (already small, one-row-per-group) block into a
    k-row buffer — O(k + block) driver memory, deterministic under any
    partitioning because ``order_by`` is a total order.

    ``order_by``: list of ``(column, descending)``; the k rows come back
    as a pyarrow Table sorted by that order. Replaces ``.sort().limit(k)``
    (two extra barriers, a full-shuffle of the aggregate) on every top-k
    tail in this module."""
    import pandas as pd

    cols = [c for c, _ in order_by]
    asc = [not d for _, d in order_by]
    buf = None
    for b in ds.iter_batches(batch_format="pandas"):
        cand = b if buf is None else pd.concat([buf, b], ignore_index=True)
        buf = cand.sort_values(cols, ascending=asc, kind="mergesort") \
            .head(k).reset_index(drop=True)
    if buf is None:
        return pa.table({})
    return pa.Table.from_pandas(buf, preserve_index=False)


# -------------------------------------------------------- sessionization ----

def _check_hot_keys(keys, first, limit: int, op: str):
    """Partitioning-contract guard for the bucketed per-key kernels
    (sessionize / per_key_window): every row of one key must fit one bucket
    group. A pathological hot key (one user with 10^9 events) would
    otherwise blow the group block silently — this mirrors the pairs
    stage's skew observability (oversized flags, salted hot keys): detect
    and RAISE with the key named, never degrade silently.

    ``first`` is the boolean run-start mask over the key-sorted rows."""
    import numpy as np
    starts = np.flatnonzero(first)
    if not len(starts):
        return
    lens = np.diff(np.r_[starts, len(keys)])
    mx = int(lens.max())
    if mx > limit:
        k = keys[starts[int(np.argmax(lens))]]
        raise ValueError(
            f"{op}: hot key {k!r} has {mx} rows in one bucket group "
            f"(hot_key_limit={limit}). A single key's full history must fit "
            f"one group; pre-aggregate, shard this key upstream, or raise "
            f"hot_key_limit if the memory budget allows.")


def sessionize(events_ds, gap_s: int = 1800, n_buckets: int = 64,
               hot_key_limit: int = 10_000_000):
    """Gap-based sessionization: one session row per maximal run of a
    user's events with inter-event gaps <= ``gap_s``.

    Rows are hash-bucketed by ``user_id % n_buckets``; each bucket group is
    ONE numpy kernel (lexsort + diff + cumsum + reduceat), so the per-group
    Python overhead is O(n_buckets) and the shuffle moves each row once.
    Output: user_id, session_id (1-based per user in time order),
    start_us, end_us, n_events, duration_us.
    """
    gap_us = gap_s * _US_PER_S

    def _bucket(batch: pa.Table) -> pa.Table:
        uid = pc.cast(batch["user_id"], pa.int64())
        return pa.table({
            "user_id": uid,
            "ts_us": _ts_us(batch["ts"]),
            "bucket": pc.cast(
                pc.bit_wise_and(uid, n_buckets - 1), pa.int32()),
        })

    def _sessions(group: pa.Table) -> pa.Table:
        uid = group["user_id"].combine_chunks().to_numpy(
            zero_copy_only=False)
        ts = group["ts_us"].combine_chunks().to_numpy(zero_copy_only=False)
        o = np.lexsort((ts, uid))
        uid, ts = uid[o], ts[o]
        new_user = np.empty(len(uid), bool)
        new_user[0] = True
        np.not_equal(uid[1:], uid[:-1], out=new_user[1:])
        _check_hot_keys(uid, new_user, hot_key_limit, "sessionize")
        new_sess = new_user.copy()
        np.greater(ts[1:] - ts[:-1], gap_us, out=new_sess[1:])
        new_sess |= new_user
        starts = np.flatnonzero(new_sess)
        sid_global = np.cumsum(new_sess) - 1          # 0-based over bucket
        # per-user 1-based ordinal: subtract the user's first session id
        user_first = sid_global[np.flatnonzero(new_user)]
        user_ord = np.cumsum(new_user) - 1
        session_id = sid_global - user_first[user_ord] + 1
        ends = np.r_[starts[1:], len(uid)] - 1
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_id": pa.array(session_id[starts], pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[ends], pa.int64()),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
            "duration_us": pa.array(ts[ends] - ts[starts], pa.int64()),
        })

    assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
    return (events_ds.map_batches(_bucket, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(_sessions, batch_format="pyarrow"))


# ------------------------------------------------------------ as-of join ----

def asof_join(left_ds, right_ds, by: str, on_us: str,
              right_payload: list[str], n_buckets: int = 64):
    """Partitioned as-of join: for each left row, the right row with the
    greatest ``on_us`` <= left's ``on_us`` within the same ``by`` key
    (DuckDB ``ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on``).

    Both sides are tagged and unioned, hash-bucketed on ``by``, and each
    bucket group resolves matches with ONE vectorized last-seen scan
    (monotone index cummax segmented by key-group start — a leaked index
    from the previous key is always < the group start, so the same compare
    that validates the match also fences the segments). Right payload
    columns must not collide with left column names.

    Scale notes: the shuffle moves each row once; per-key history must fit
    in one bucket group. Equal ``on_us`` on both sides matches (right
    sorts first); ties between right rows at the same instant resolve to
    the later row in (on_us, tag) sort order — make ``on_us`` unique per
    key for fully deterministic output.
    """
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    left_cols = [c for c in l_schema.names if c not in (by, on_us)]
    l_types = [l_schema.types[l_schema.names.index(c)] for c in left_cols]
    r_types = [r_schema.types[r_schema.names.index(c)]
               for c in right_payload]
    all_names = [by, on_us, "__tag", "bucket"] + left_cols + right_payload

    def _tag(side: int, keep: list, nulls: list):
        # one fused pass per side: tag + bucket + null-pad the OTHER
        # side's payload so the union needs no alignment pass
        def _f(batch: pa.Table) -> pa.Table:
            key = pc.cast(batch[by], pa.int64())
            cols = {by: key, on_us: pc.cast(batch[on_us], pa.int64()),
                    "__tag": pa.array(np.full(len(batch), side, np.int8)),
                    "bucket": pc.cast(pc.bit_wise_and(key, n_buckets - 1),
                                      pa.int32())}
            for c in keep:
                cols[c] = batch[c]
            for c, t in nulls:
                cols[c] = pa.nulls(len(batch), t)
            return pa.table(cols).select(all_names)
        return _f

    tagged_l = left_ds.map_batches(
        _tag(1, left_cols, list(zip(right_payload, r_types))),
        batch_format="pyarrow", zero_copy_batch=True)
    tagged_r = right_ds.map_batches(
        _tag(0, right_payload, list(zip(left_cols, l_types))),
        batch_format="pyarrow", zero_copy_batch=True)
    both = tagged_l.union(tagged_r)

    def _resolve(group: pa.Table) -> pa.Table:
        key = group[by].combine_chunks().to_numpy(zero_copy_only=False)
        on = group[on_us].combine_chunks().to_numpy(zero_copy_only=False)
        tag = group["__tag"].combine_chunks().to_numpy(
            zero_copy_only=False)
        o = np.lexsort((tag, on, key))
        key, on, tag = key[o], on[o], tag[o]
        n = len(key)
        grp_start = np.empty(n, np.int64)
        new_key = np.empty(n, bool)
        new_key[0] = True
        np.not_equal(key[1:], key[:-1], out=new_key[1:])
        grp_start[new_key] = np.flatnonzero(new_key)
        grp_start = np.maximum.accumulate(
            np.where(new_key, grp_start, -1))
        ridx = np.where(tag == 0, np.arange(n), -1)
        last_r = np.maximum.accumulate(ridx)
        is_left = tag == 1
        match = last_r[is_left]
        valid = match >= grp_start[is_left]
        take_r = pa.array(np.where(valid, o[np.maximum(match, 0)], -1),
                          pa.int64())
        take_r = pc.if_else(pc.equal(take_r, -1),
                            pa.scalar(None, pa.int64()), take_r)
        take_l = pa.array(o[is_left], pa.int64())
        cols = {by: pa.array(key[is_left], pa.int64()),
                on_us: pa.array(on[is_left], pa.int64())}
        for c in left_cols:
            cols[c] = group[c].combine_chunks().take(take_l)
        for c in right_payload:
            cols[c] = group[c].combine_chunks().take(take_r)
        return pa.table(cols)

    assert n_buckets & (n_buckets - 1) == 0
    return both.groupby("bucket").map_groups(
        _resolve, batch_format="pyarrow")


# ------------------------------------------------------------ range join ----

def range_join_agg(events_ds, edges: list[float], labels: list[str],
                   value_col: str = "value"):
    """Static range (band) join + aggregate: each row lands in the band
    with ``edges[i] <= value < edges[i+1]``; rows outside all bands drop
    (SQL inner ``JOIN bands ON v >= lo AND v < hi``).

    The band table is broadcast implicitly (it's a constant captured by
    the batch fn); banding is one ``np.searchsorted`` per batch, and the
    per-band aggregate pre-combines inside map tasks. Value sums are
    integer cents so the distributed combine is exact.
    """
    assert len(labels) == len(edges) - 1
    e = np.asarray(edges, np.float64)
    lab = np.asarray(labels, object)

    def _band(batch: pa.Table) -> pa.Table:
        v = batch[value_col].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        i = np.searchsorted(e, v, side="right") - 1
        ok = (i >= 0) & (i < len(lab)) & (v >= e[0]) & (v < e[-1])
        i_ok = i[ok]
        return pa.table({
            "band": pa.array(lab[i_ok], pa.string()),
            "lo": pa.array(e[i_ok], pa.float64()),
            "hi": pa.array(e[i_ok + 1], pa.float64()),
            "value_cents": _cents(pa.array(v[ok])),
        })

    return (events_ds.map_batches(_band, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby(["band", "lo", "hi"])
            .aggregate(Count("value_cents", alias_name="n"),
                       Sum("value_cents", alias_name="sum_value_cents"))
            .sort("lo"))


# ------------------------------------------------------- big x big join ----

def _live_partitions(cap: int = 32) -> int:
    """Shuffle partition count sized to the LIVE cluster: join/groupby
    aggregator pools sized >= the CPU count deadlock or thrash small
    clusters (the 4-cpu test session), while a fixed small count starves
    big ones."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(2, min(cap, cpus // 2))


def hash_join(left_ds, right_ds, on: str, right_on: str | None = None,
              join_type: str = "inner",
              num_partitions: int | None = None):
    """Distributed hash join for two BIG sides (neither fits a broadcast).

    Thin, documented front over ``Dataset.join``: both sides are hash-
    partitioned on the key into ``num_partitions`` shuffle partitions
    (default: sized to the live cluster) and joined partition-wise — the
    all-to-all exchange moves each row once. Use :func:`broadcast_join`
    instead whenever one side is driver-small (dimension tables): it
    avoids the shuffle entirely. Partitioning assumption: a single key's
    rows fit in one partition's memory; salt hot keys upstream if a key
    is corpus-scale (see ``stages/pairs.py`` for the two-level trick).
    """
    return left_ds.join(
        right_ds, join_type=join_type,
        num_partitions=num_partitions or _live_partitions(),
        on=(on,), right_on=(right_on or on,))


def _rev_cents(batch: pa.Table) -> pa.ChunkedArray:
    """Exact integer-cent line revenue: round(price * (1-disc) * 100).

    The float product is evaluated in the SAME operand order as the SQL
    oracle expression, so the doubles agree bit-for-bit before the one
    deterministic rounding."""
    price = pc.cast(batch["l_extendedprice"], pa.float64())
    disc = pc.cast(batch["l_discount"], pa.float64())
    rev = pc.multiply(pc.multiply(price, pc.subtract(1.0, disc)), 100.0)
    return pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                   pa.int64())


def _date_str(ts_arr) -> pa.ChunkedArray:
    """timestamp -> 'YYYY-MM-DD' string (dtype-stable across engines)."""
    return pc.strftime(pc.cast(ts_arr, pa.timestamp("us")), format="%Y-%m-%d")


def _isin_sorted(sorted_keys: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized membership against a broadcast SORTED int64 key vector."""
    if len(sorted_keys) == 0:
        return np.zeros(len(values), bool)
    idx = np.clip(np.searchsorted(sorted_keys, values), 0,
                  len(sorted_keys) - 1)
    return sorted_keys[idx] == values


def unshipped_revenue_topk(lineitem_ds, orders_ds, customer: pa.Table,
                           segment: str, cutoff_us: int, k: int = 10,
                           num_partitions: int | None = None,
                           broadcast_limit: int = 2_000_000):
    """TPC-H Q3 shape: top-k revenue among orders of one market segment
    placed before ``cutoff_us`` with line items still unshipped after it.

    Plan (shuffle-minimal): the segment's custkeys broadcast once as a
    sorted int64 vector (filter pushed into the orders map — no customer
    shuffle). Then two physical strategies gated on the FILTERED order
    count (segment x date kills ~85% of orders):

    - **broadcast** (surviving orders <= broadcast_limit): the filtered
      (orderkey, date, priority) table is ``ray.put`` once; lineitem
      filters by shipdate AND membership, pre-aggregates cents per
      orderkey INSIDE each map task (pyarrow group_by), and one tiny
      groupby over surviving orderkeys finishes — zero big shuffles.
    - **hash join** (bigger): lineitem pre-aggregates revenue per
      orderkey, then the big x big :func:`hash_join` moves one row per
      surviving order, not one per line item.

    Only the tiny top-k fold runs on the driver. Ties at the k boundary
    break on ascending orderkey — deterministic under any partitioning.
    """
    seg_keys = np.sort(
        customer.filter(pc.equal(customer["c_mktsegment"], segment))
        ["c_custkey"].combine_chunks().to_numpy(zero_copy_only=False)
        .astype(np.int64))
    seg_ref = ray.put(seg_keys)

    def _orders(batch: pa.Table) -> pa.Table:
        keys = ray.get(seg_ref)
        ts = _ts_us(batch["o_orderdate"]).combine_chunks().to_numpy(
            zero_copy_only=False)
        ck = batch["o_custkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = pa.array((ts < cutoff_us) & _isin_sorted(keys, ck))
        t = batch.filter(keep)
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_orderdate": _date_str(t["o_orderdate"]),
            "o_orderpriority": t["o_orderpriority"],
        })

    def _lines(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch["l_shipdate"])
        t = batch.filter(pc.greater(ts, cutoff_us))
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "revenue_cents": _rev_cents(t),
        })

    orders = orders_ds.map_batches(_orders, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()

    if orders.count() <= broadcast_limit:
        obatches = list(orders.iter_batches(batch_format="pyarrow"))
        # segment x date can filter EVERY order out -> zero batches
        otbl = pa.concat_tables(obatches) if obatches else pa.table({
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate": pa.array([], pa.string()),
            "o_orderpriority": pa.array([], pa.string())})
        okeys = otbl["o_orderkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        order_sort = np.argsort(okeys, kind="stable")
        okeys_sorted = okeys[order_sort]
        oref = ray.put((okeys_sorted,
                        otbl["o_orderdate"].take(pa.array(order_sort)),
                        otbl["o_orderpriority"].take(pa.array(order_sort))))

        def _lines_bcast(batch: pa.Table) -> pa.Table:
            keys_sorted, _, _ = ray.get(oref)
            ts = _ts_us(batch["l_shipdate"])
            t = batch.filter(pc.greater(ts, cutoff_us))
            lk = t["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            t = t.filter(pa.array(_isin_sorted(keys_sorted, lk)))
            # partial agg inside the task: one row per surviving orderkey
            part = pa.table({
                "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
                "revenue_cents": _rev_cents(t),
            }).group_by("l_orderkey").aggregate(
                [("revenue_cents", "sum")])
            return pa.table({"l_orderkey": part["l_orderkey"],
                             "revenue_cents": part["revenue_cents_sum"]})

        rev = (lineitem_ds.map_batches(_lines_bcast, batch_format="pyarrow",
                                       zero_copy_batch=True)
               .groupby("l_orderkey")
               .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))

        def _attach(batch: pa.Table) -> pa.Table:
            keys_sorted, dates, prios = ray.get(oref)
            lk = batch["l_orderkey"].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(keys_sorted, lk)
            idx = pa.array(pos)
            return pa.table({
                "l_orderkey": batch["l_orderkey"],
                "revenue_cents": batch["revenue_cents"],
                "o_orderdate": dates.take(idx),
                "o_orderpriority": prios.take(idx),
            })

        joined = rev.map_batches(_attach, batch_format="pyarrow",
                                 zero_copy_batch=True)
    else:
        rev = (lineitem_ds.map_batches(_lines, batch_format="pyarrow",
                                       zero_copy_batch=True)
               .groupby("l_orderkey")
               .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))
        joined = hash_join(rev, orders,
                           on="l_orderkey", right_on="o_orderkey",
                           num_partitions=num_partitions)

    return streaming_topk(
        joined.select_columns(["l_orderkey", "revenue_cents",
                               "o_orderdate", "o_orderpriority"]),
        [("revenue_cents", True), ("l_orderkey", False)], k)


def regional_supplier_volume(lineitem_ds, orders_ds, customer: pa.Table,
                             supplier: pa.Table, nation: pa.Table,
                             region: pa.Table, region_name: str,
                             t0_us: int, t1_us: int,
                             num_partitions: int | None = None):
    """TPC-H Q5 shape: per-nation revenue where the customer and the
    supplier share a nation inside one region, for orders in a date range.

    Plan: the four dimension sides (customer->nation, supplier->nation,
    nation->name, region membership) broadcast once as sorted int64 key
    vectors + payload arrays; the only shuffle is the big x big
    lineitem ⋈ orders :func:`hash_join` on orderkey plus the final tiny
    per-nation groupby of pre-combined cents."""
    r_keys = region.filter(pc.equal(region["r_name"], region_name))
    region_nkeys = np.sort(
        nation.filter(pc.is_in(nation["n_regionkey"],
                               value_set=r_keys["r_regionkey"]
                               .combine_chunks()))
        ["n_nationkey"].combine_chunks().to_numpy(zero_copy_only=False)
        .astype(np.int64))
    nk = nation["n_nationkey"].combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_order = np.argsort(nk, kind="stable")
    nation_names = nation["n_name"].combine_chunks().take(
        pa.array(n_order))

    def _dim(tbl: pa.Table, key: str, val: str):
        ks = tbl[key].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        o = np.argsort(ks, kind="stable")
        return ks[o], tbl[val].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)[o]

    dims_ref = ray.put((
        _dim(customer, "c_custkey", "c_nationkey"),
        _dim(supplier, "s_suppkey", "s_nationkey"),
        region_nkeys, np.sort(nk),
        nation_names.to_numpy(zero_copy_only=False)))

    def _orders(batch: pa.Table) -> pa.Table:
        (ck, cn), _, _, _, _ = ray.get(dims_ref)
        ts = _ts_us(batch["o_orderdate"]).combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = (ts >= t0_us) & (ts < t1_us)
        t = batch.filter(pa.array(keep))
        cust = t["o_custkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        c_nat = cn[np.clip(np.searchsorted(ck, cust), 0, len(ck) - 1)]
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "c_nation": pa.array(c_nat, pa.int64()),
        })

    def _lines(batch: pa.Table) -> pa.Table:
        _, (sk, sn), _, _, _ = ray.get(dims_ref)
        supp = batch["l_suppkey"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        s_nat = sn[np.clip(np.searchsorted(sk, supp), 0, len(sk) - 1)]
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "s_nation": pa.array(s_nat, pa.int64()),
            "revenue_cents": _rev_cents(batch),
        })

    orders = orders_ds.map_batches(_orders, batch_format="pyarrow",
                                   zero_copy_batch=True)
    lines = lineitem_ds.map_batches(_lines, batch_format="pyarrow",
                                    zero_copy_batch=True)
    joined = hash_join(lines, orders, on="l_orderkey", right_on="o_orderkey",
                       num_partitions=num_partitions)

    def _filter_name(batch: pa.Table) -> pa.Table:
        _, _, in_region, nk_sorted, names = ray.get(dims_ref)
        sn = batch["s_nation"].combine_chunks().to_numpy(
            zero_copy_only=False)
        cn = batch["c_nation"].combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = (sn == cn) & _isin_sorted(in_region, sn)
        t = batch.filter(pa.array(keep))
        sn_k = t["s_nation"].combine_chunks().to_numpy(
            zero_copy_only=False)
        name = names[np.searchsorted(nk_sorted, sn_k)]
        return pa.table({
            "n_name": pa.array(name, pa.string()),
            "revenue_cents": t["revenue_cents"],
        })

    agg = (joined.map_batches(_filter_name, batch_format="pyarrow")
           .groupby("n_name")
           .aggregate(Sum("revenue_cents", alias_name="revenue_cents")))
    # one row per nation in the region: the "top-k" is the whole set,
    # ordered — the streaming fold replaces a sort barrier
    return streaming_topk(agg, [("revenue_cents", True),
                                ("n_name", False)], k=1 << 30)


# --------------------------------------------------------- window agg ----

def sliding_window_agg(events_ds, width_s: int = 7200, slide_s: int = 3600):
    """Sliding (hopping) window aggregate: every event lands in the
    ``width_s / slide_s`` windows covering its timestamp; output one row
    per (window_start, event_type) with count + exact cent sum.

    The expansion factor is the constant ``width/slide`` (embarrassingly
    parallel ``np.repeat`` per batch); the groupby shuffles pre-combined
    partials only. ``width_s`` must be a multiple of ``slide_s``."""
    assert width_s % slide_s == 0, "width must be a multiple of slide"
    n_sub = width_s // slide_s
    slide_us = slide_s * _US_PER_S

    def _win(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch["ts"]).combine_chunks().to_numpy(
            zero_copy_only=False)
        base = (ts // slide_us) * slide_us
        offs = (np.arange(n_sub, dtype=np.int64) * slide_us)
        win = (np.repeat(base, n_sub).reshape(-1, n_sub) - offs).ravel()
        rep = pa.array(np.repeat(np.arange(len(ts)), n_sub), pa.int64())
        return pa.table({
            "window_us": pa.array(win, pa.int64()),
            "event_type": batch["event_type"].combine_chunks().take(rep),
            "value_cents": _cents(batch["value"]).combine_chunks()
            .take(rep),
        })

    return (events_ds.map_batches(_win, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby(["window_us", "event_type"])
            .aggregate(Count("value_cents", alias_name="n"),
                       Sum("value_cents", alias_name="sum_value_cents"))
            .sort(["window_us", "event_type"]))


def tumbling_window_agg(events_ds, width_s: int = 3600):
    """Tumbling-window aggregate: (window_start, event_type) -> count +
    exact cent sum. Window assignment is embarrassingly parallel; the
    groupby shuffles pre-aggregated partials (one row per window x type
    per block)."""
    w_us = width_s * _US_PER_S

    def _win(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch["ts"])
        return pa.table({
            "window_us": pc.multiply(pc.divide(ts, w_us), w_us),
            "event_type": batch["event_type"],
            "value_cents": _cents(batch["value"]),
        })

    return (events_ds.map_batches(_win, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby(["window_us", "event_type"])
            .aggregate(Count("value_cents", alias_name="n"),
                       Sum("value_cents", alias_name="sum_value_cents"))
            .sort(["window_us", "event_type"]))


# ------------------------------------------------- semi / anti join ----

def _null_key_sentinel(right_ds, right_on: str):
    """Union ONE null-key row onto the right side: a right side that
    filters down to ZERO rows loses its schema through the shuffle and
    Acero aborts with "no match for key field" — while a null key matches
    nothing under SQL join semantics (verified for Acero's left_semi /
    left_anti), so the sentinel is invisible in the result. Costs one
    1-row block; schema comes from dataset metadata (no execution).
    The sentinel goes FIRST in the union: the first operand's schema is
    the precedent the shuffle aggregator resolves empty bundles against
    (sentinel-last still aborted on an all-empty right block)."""
    schema = right_ds.schema()
    sentinel = ray.data.from_arrow(pa.table(
        {n: pa.nulls(1, t) for n, t in zip(schema.names, schema.types)}))
    return sentinel.union(right_ds)


def semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
              num_partitions: int | None = None):
    """Rows of ``left_ds`` with AT LEAST ONE key match in ``right_ds``
    (SQL ``WHERE EXISTS``), keeping only left columns and never
    duplicating a left row on multi-match — Ray's native ``left_semi``
    hash join (one all-to-all, each row moves once). New operator beyond
    the reference (its 1-vs-1 `compare_addresses` has no set semantics).
    The right side gets a null-key sentinel so a zero-row right (ledger
    filter matching nothing) degrades to the correct answer instead of a
    lost-schema Acero abort (see :func:`_null_key_sentinel`)."""
    right_on = right_on or on
    return left_ds.join(_null_key_sentinel(right_ds, right_on),
                        join_type="left_semi",
                        num_partitions=num_partitions or _live_partitions(),
                        on=(on,), right_on=(right_on,))


def anti_join(left_ds, right_ds, on: str, right_on: str | None = None,
              num_partitions: int | None = None):
    """Rows of ``left_ds`` with NO key match in ``right_ds`` (SQL
    ``WHERE NOT EXISTS`` / ``NOT IN`` with non-null keys) — native
    ``left_anti`` hash join. The dedup/backfill primitive: "which
    documents are NOT in the processed ledger" at 100 TB is this exact
    shape, hash-partitioned so neither side materializes. Null-key
    sentinel on the right side as in :func:`semi_join`."""
    right_on = right_on or on
    return left_ds.join(_null_key_sentinel(right_ds, right_on),
                        join_type="left_anti",
                        num_partitions=num_partitions or _live_partitions(),
                        on=(on,), right_on=(right_on,))


# --------------------------------------------------- distinct count ----

def distinct_count(ds, group_col: str, distinct_col: str,
                   alias: str = "n_distinct"):
    """(group) -> COUNT(DISTINCT distinct_col), exact.

    Map side first collapses each block to its LOCAL distinct
    (group, value) pairs (pyarrow group_by — vectorized, no Python rows),
    so the first shuffle moves one row per distinct pair per block, not
    one per input row; the global distinct is then a (group, value)
    groupby whose result is re-grouped once more — the second shuffle is
    tiny (one row per distinct pair). Mass duplication (the 100-TB skew
    case) collapses before it ever ships."""
    def _local_distinct(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, distinct_col]).group_by(
            [group_col, distinct_col]).aggregate([])

    pairs = (ds.map_batches(_local_distinct, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby([group_col, distinct_col])
             .aggregate(Count(distinct_col, alias_name="_dup")))

    def _drop(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, distinct_col])

    return (pairs.map_batches(_drop, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby(group_col)
            .aggregate(Count(distinct_col, alias_name=alias))
            .sort(group_col))
