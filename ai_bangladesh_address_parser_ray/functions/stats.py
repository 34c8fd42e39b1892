"""Corpus statistics / grouped aggregates / top-k (reference A1-A3 family).

Re-expresses ``get_statistics`` / ``suggest_addresses``
(``/root/reference/src/core/utils/address_utils.py:262-324,209-259``) as
partial-aggregating Ray Data groupbys: combine happens inside map tasks, the
shuffle moves one row per (group x block). Numeric outputs rounded to 6
decimals for oracle comparability; top-k tie-break is (count desc, key asc).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def group_stats(ds, key: str, value_col: str):
    """groupby(key) -> count/mean/sum of value_col, deterministic order."""
    return ds.groupby(key).aggregate(
        Count(value_col, alias_name="n"),
        Mean(value_col, alias_name="avg_value"),
        Sum(value_col, alias_name="sum_value"),
    ).sort(key)


def doc_stats_by_lang(ds):
    """documents stats per lang: n_docs, avg/min/max n_chars.

    avg of int64 is sum/count with an exactly-representable integer sum
    (bit-identical to DuckDB's AVG); the emitted avg is still rounded to
    6dp on both sides per the round-5 float policy (min/max are raw input
    passthroughs and stay exact)."""
    from .rounding import round6_arrow

    def _round_avg(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("avg_chars")
        return batch.set_column(i, "avg_chars",
                                round6_arrow(batch["avg_chars"]))

    return (ds.select_columns(["lang", "n_chars"]).groupby("lang").aggregate(
        Count("n_chars", alias_name="n_docs"),
        Mean("n_chars", alias_name="avg_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    ).sort("lang")
        .map_batches(_round_avg, batch_format="pyarrow",
                     zero_copy_batch=True))


def top_k_by_count(ds, key: str, k: int = 10):
    """Top-k keys by row count (A3 shape). Count shuffles pre-aggregated
    partials; the sort input is one row per distinct key."""
    counted = ds.groupby(key).aggregate(Count(key, alias_name="n"))

    def _neg(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_negn", pc.multiply(pc.cast(batch["n"], pa.int64()), -1))

    return (counted.map_batches(_neg, batch_format="pyarrow")
            .sort(["_negn", key]).limit(k).drop_columns(["_negn"]))


def completeness_stats(extracted_ds, component_fields):
    """Mean fraction of the 9 components present (A1 'completeness')."""
    def _frac(batch: pa.Table) -> pa.Table:
        present = None
        for f in component_fields:
            m = pc.cast(pc.greater(pc.utf8_length(
                pc.fill_null(batch[f], "")), 0), pa.int32())
            present = m if present is None else pc.add(present, m)
        return pa.table({"completeness": pc.divide(
            pc.cast(present, pa.float64()), float(len(component_fields)))})
    fracs = extracted_ds.map_batches(_frac, batch_format="pyarrow")
    agg = fracs.aggregate(Mean("completeness", alias_name="mean_completeness"),
                          Count("completeness", alias_name="n_rows"))
    return agg


def rollup_counts(ds, keys: list[str], alias: str = "n"):
    """GROUP BY ROLLUP(keys): counts at every prefix grouping level, with
    nulls in the rolled-up key columns (SQL ROLLUP convention).

    Scale shape: ONE shuffle pre-aggregates at the finest level; every
    coarser level is derived from that already-tiny aggregate (distinct
    key combos, not rows) with driver-side pyarrow group_bys — the same
    "aggregate the aggregate" trick that makes CUBE/ROLLUP cheap in MPP
    engines. Assumes the finest aggregate fits on the driver, which any
    consumer of a ROLLUP result already assumes.
    """
    from ray.data.aggregate import Count

    finest_ds = ds.groupby(keys).aggregate(Count(alias_name=alias))
    fbatches = list(finest_ds.iter_batches(batch_format="pyarrow"))
    if fbatches:
        finest = pa.concat_tables(fbatches)
    else:
        # empty input -> zero aggregate batches; SQL ROLLUP still emits
        # the grand-total row (count 0), which the depth-0 level below
        # derives from this typed empty finest
        sch = ds.schema()
        types = dict(zip(sch.names, sch.types))
        finest = pa.table({
            **{c: pa.array([], types[c]) for c in keys},
            alias: pa.array([], pa.int64())})
    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        if kept:
            lvl = finest.group_by(kept).aggregate([(alias, "sum")]) \
                .rename_columns(kept + [alias])
        else:
            lvl = pa.table({alias: pa.array(
                [pc.sum(finest[alias]).as_py() or 0], pa.int64())})
        for k in keys[depth:]:
            lvl = lvl.append_column(
                k, pa.nulls(len(lvl), finest.schema.field(k).type))
        levels.append(lvl.select(keys + [alias]))
    out = pa.concat_tables(t.select(keys + [alias]) for t in levels)
    return out.set_column(
        out.schema.get_field_index(alias),
        alias, pc.cast(out[alias], pa.int64()))


def pivot_counts(ds, row_key: str, col_key: str, col_values: list[str],
                 total_alias: str = "n_total"):
    """Pivot row counts: one output row per ``row_key``, one ``n_<v>``
    column per value of ``col_key`` (the SQL conditional-aggregation
    pivot). ``col_values`` is the static column contract — a value
    outside it still counts toward ``n_total``.

    Scale shape: each batch pre-aggregates (row, col) cell counts (the
    map-side combine), the shuffle carries histogram cells only, and one
    tiny map_groups per row key lays out the wide row.
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.select([row_key, col_key]) \
            .group_by([row_key, col_key]).aggregate([([], "count_all")])
        return g.rename_columns([row_key, col_key, "n"])

    def _widen(group: pa.Table) -> pa.Table:
        cols = group[col_key].to_pylist()
        n = group["n"].to_pylist()
        by = dict(zip(cols, n))
        row = {row_key: [group[row_key][0].as_py()]}
        for v in col_values:
            row[f"n_{v}"] = pa.array([by.get(v, 0)], pa.int64())
        row[total_alias] = pa.array([sum(n)], pa.int64())
        return pa.table(row)

    return (ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby([row_key, col_key])
            .aggregate(Sum("n", alias_name="n"))
            .groupby(row_key)
            .map_groups(_widen, batch_format="pyarrow"))
