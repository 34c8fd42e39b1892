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

    avg of int64 is sum/count with an exactly-representable integer sum, so
    the double is bit-identical to DuckDB's AVG — no rounding."""
    return ds.select_columns(["lang", "n_chars"]).groupby("lang").aggregate(
        Count("n_chars", alias_name="n_docs"),
        Mean("n_chars", alias_name="avg_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    ).sort("lang")


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
