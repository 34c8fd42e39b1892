"""Post-extraction utility stages: validation, formatting, statistics.

Distributed twins of the reference's corpus utilities
(``/root/reference/src/core/utils/address_utils.py``):

- :func:`validate_stage`  (A5, :9-66)  — fully vectorized pyarrow.compute:
  completeness fraction, required-field gate, postal format check,
  score = 0.7*required + 0.3*completeness
- :func:`format_stage`    (A6, :69-128) — canonical string assembly per row
  (string concat per style; python loop over the batch, cheap)
- :func:`district_distribution` / :func:`corpus_statistics` (A1, :262-324)
  — partial-aggregating groupbys, driver only sees the tiny result
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import COMPONENT_FIELDS
from ..kernel.validate_format import format_address


def _present(batch: pa.Table, field: str):
    return pc.greater(pc.utf8_length(
        pc.utf8_trim_whitespace(pc.fill_null(batch[field], ""))), 0)


def validate_stage(ds):
    """Append is_valid / completeness / missing_count / v_score columns.

    Pure pyarrow.compute kernel chain — semantics match
    ``kernel.validate_format.validate_address`` element-wise (tested)."""
    def _f(batch: pa.Table) -> pa.Table:
        n_present = None
        for f in COMPONENT_FIELDS:
            m = pc.cast(_present(batch, f), pa.int32())
            n_present = m if n_present is None else pc.add(n_present, m)
        completeness = pc.divide(pc.cast(n_present, pa.float64()),
                                 float(len(COMPONENT_FIELDS)))
        required_ok = pc.or_(_present(batch, "district"),
                             _present(batch, "area"))
        postal = pc.utf8_trim_whitespace(
            pc.fill_null(batch["postal_code"], ""))
        postal_bad = pc.and_(
            pc.greater(pc.utf8_length(postal), 0),
            pc.invert(pc.match_substring_regex(postal, r"^\d{4}$")))
        is_valid = pc.and_(required_ok, pc.invert(postal_bad))
        score = pc.round(pc.add(
            pc.multiply(pc.cast(required_ok, pa.float64()), 0.7),
            pc.multiply(completeness, 0.3)), ndigits=3)
        return (batch
                .append_column("is_valid", is_valid)
                .append_column("completeness", completeness)
                .append_column("missing_count", pc.subtract(
                    pa.scalar(len(COMPONENT_FIELDS), pa.int32()), n_present))
                .append_column("v_score", score))
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def format_stage(ds, style: str = "full", separator: str = ", ",
                 include_postal: bool = True, out_col: str = "formatted"):
    def _f(batch: pa.Table) -> pa.Table:
        rows = batch.select(COMPONENT_FIELDS).to_pylist()
        vals = [format_address(r, style, separator, include_postal)
                for r in rows]
        return batch.append_column(out_col, pa.array(vals, pa.string()))
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def geo_validate_stage(ds):
    """Stage: geographic consistency + hierarchy enrichment per turn
    (reference ``geographic_validator.py:37-169`` surfaced as columns).

    Adds ``geo_valid`` (hierarchy-consistent), ``geo_conflicts`` (count),
    and ``geo_upazila`` (reverse postal->upazila lookup, "" if unknown).
    The GeoHierarchy dim builds once per worker process (module cache in
    kernel.geo) — the broadcast-small-side pattern."""
    def _f(batch: pa.Table) -> pa.Table:
        from ..kernel.geo import default_geo
        geo = default_geo()
        valid, nconf, upz = [], [], []
        for row in batch.select(
                ["area", "district", "division", "postal_code"]).to_pylist():
            v = geo.validate_location(
                area=row.get("area") or None,
                district=row.get("district") or None,
                division=row.get("division") or None,
                postal_code=row.get("postal_code") or None)
            valid.append(v["valid"])
            nconf.append(len(v["conflicts"]))
            h = geo.get_full_hierarchy(row.get("postal_code") or "")
            upz.append(h["upazila"] if h else "")
        return (batch
                .append_column("geo_valid", pa.array(valid, pa.bool_()))
                .append_column("geo_conflicts", pa.array(nconf, pa.int32()))
                .append_column("geo_upazila", pa.array(upz, pa.string())))
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def district_distribution(extracted, k: int = 10):
    """A1's top-10 district histogram over rows that extracted a district."""
    from ..functions.stats import top_k_by_count
    nonempty = extracted.select_columns(["district"]).map_batches(
        lambda b: b.filter(pc.greater(
            pc.utf8_length(pc.fill_null(b["district"], "")), 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    return top_k_by_count(nonempty, "district", k=k)


def suggest_topk(queries, limit: int = 5) -> pa.Table:
    """A3 top-k suggestion (``address_utils.py:209-259``): substring boost +
    SequenceMatcher over the gazetteer dim. The dim is tiny (dozens of
    areas), so this is a driver-side scan by design — the distributed analog
    (broadcast the dim, score inside map_batches) only pays when the query
    stream itself is large, which the reference API (one query per call)
    never is. Returns (query, rank, area, district, division, score)."""
    from ..kernel.validate_format import suggest_areas
    rows = {"query": [], "rank": [], "area": [], "district": [],
            "division": [], "score": []}
    for q in queries:
        for rank, s in enumerate(suggest_areas(q, limit=limit), start=1):
            rows["query"].append(q)
            rows["rank"].append(rank)
            rows["area"].append(s["area"])
            rows["district"].append(s["district"])
            rows["division"].append(s["division"])
            rows["score"].append(float(s["score"]))
    return pa.table({
        "query": pa.array(rows["query"], pa.string()),
        "rank": pa.array(rows["rank"], pa.int32()),
        "area": pa.array(rows["area"], pa.string()),
        "district": pa.array(rows["district"], pa.string()),
        "division": pa.array(rows["division"], pa.string()),
        "score": pa.array(rows["score"], pa.float64()),
    })


def compare_adjacent_stage(extracted, num_partitions: int = 16):
    """P1/P2 pairwise comparison (``address_utils.py:131-206`` via
    ``extractor.py:425-452``) as a distributed stage: within each
    conversation, compare each mention turn's extracted components to the
    NEXT mention turn's (sorted by turn_idx). One groupby shuffle on
    conv_id — conversations are naturally bounded (tens of turns), so no
    skew handling needed; extraction is never repeated per pair (the
    reference re-extracts both sides on every compare call).

    Returns (conv_id, turn_a, turn_b, similarity, score, match).

    Vectorized (VERDICT r4 #8): adjacent pairs assemble by a shifted
    slice of the sorted group, and scoring goes through the batch twin
    ``stages.scoring.compare_components_batch`` (equality fast path +
    SequenceMatcher residual) instead of a per-row Python loop."""
    from .scoring import compare_components_batch

    def _pairs(df):
        import pandas as pd
        df = df.sort_values("turn_idx").reset_index(drop=True)
        if len(df) < 2:
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype="object"),
                "turn_a": pd.Series([], dtype="int64"),
                "turn_b": pd.Series([], dtype="int64"),
                "similarity": pd.Series([], dtype="float64"),
                "score": pd.Series([], dtype="float64"),
                "match": pd.Series([], dtype="bool"),
            })
        a = df.iloc[:-1].reset_index(drop=True)
        b = df.iloc[1:].reset_index(drop=True)
        pair = pd.DataFrame({f"l_{f}": a[f] for f in COMPONENT_FIELDS}
                            | {f"r_{f}": b[f] for f in COMPONENT_FIELDS})
        similarity, score, match = compare_components_batch(pair)
        return pd.DataFrame({
            "conv_id": a["conv_id"],
            "turn_a": a["turn_idx"].astype("int64"),
            "turn_b": b["turn_idx"].astype("int64"),
            "similarity": similarity,
            "score": score,
            "match": match,
        })

    cols = ["conv_id", "turn_idx"] + list(COMPONENT_FIELDS)
    mentions = extracted.select_columns(cols).map_batches(
        lambda b: b.filter(pc.greater(
            pc.utf8_length(pc.fill_null(b["area"], "")), 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    return mentions.groupby("conv_id").map_groups(
        _pairs, batch_format="pandas")


def corpus_statistics(extracted):
    """A1 scalars (reference ``get_statistics``,
    ``address_utils.py:262-324``): row count, mean completeness, mean
    confidence, plus a per-component MISSING count. One distributed pass:
    per-batch partial sums inside map tasks, one global aggregate — the
    driver only ever sees the 1-row result."""
    from ray.data.aggregate import Count, Mean, Sum

    def _with_missing(batch: pa.Table) -> pa.Table:
        out = batch
        for f in COMPONENT_FIELDS:
            miss = pc.cast(pc.equal(
                pc.utf8_length(pc.fill_null(batch[f], "")), 0), pa.int64())
            out = out.append_column("missing_" + f, miss)
        return out

    v = validate_stage(extracted).map_batches(
        _with_missing, batch_format="pyarrow", zero_copy_batch=True)
    aggs = [Count("completeness", alias_name="n_rows"),
            Mean("completeness", alias_name="mean_completeness"),
            Mean("overall_confidence", alias_name="mean_confidence")]
    aggs += [Sum("missing_" + f, alias_name="missing_" + f)
             for f in COMPONENT_FIELDS]
    agg = v.aggregate(*aggs)
    return pa.table({k: [v] for k, v in agg.items()})


def area_distribution(extracted, k: int = 20):
    """A1 distribution: top-k areas by mention count (reference
    ``areas.most_common(20)``), deterministic ties by name."""
    return _field_distribution(extracted, "area", k)


def division_distribution(extracted, k: int = 8):
    """A1 distribution: top-k divisions (reference
    ``divisions.most_common(8)``)."""
    return _field_distribution(extracted, "division", k)


def _field_distribution(extracted, field: str, k: int):
    from ..functions.stats import top_k_by_count
    nonempty = extracted.select_columns([field]).map_batches(
        lambda b: b.filter(pc.greater(
            pc.utf8_length(pc.fill_null(b[field], "")), 0)),
        batch_format="pyarrow", zero_copy_batch=True)
    return top_k_by_count(nonempty, field, k=k)


def component_distributions(extracted, ks: dict | None = None):
    """All A1 top-k distributions in ONE extract pass, long format
    ``(component, value, n, rank)`` — district/area/division histograms
    with the reference's per-component k (most_common(10/20/8)). One
    combined query keeps the whole distribution family inside the driver's
    50-query correctness cap (VERDICT r3 #7) AND runs the expensive
    extract stage once instead of three times. Count cells pre-aggregate
    per batch; the shuffle carries (component, value, n) histogram rows;
    ties break by value ascending (same order as the per-field queries)."""
    from ray.data.aggregate import Sum
    from ..functions.windows import grouped_topk

    ks = ks or {"district": 10, "area": 20, "division": 8}
    fields = sorted(ks)

    def _long(batch: pa.Table) -> pa.Table:
        parts = []
        for f in fields:
            v = pc.fill_null(batch[f], "")
            t = pa.table({
                "component": pa.array([f] * batch.num_rows, pa.string()),
                "value": v})
            parts.append(t.filter(pc.greater(pc.utf8_length(v), 0)))
        return pa.concat_tables(parts)

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["component", "value"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["component", "value", "n"])

    hist = (extracted.select_columns(fields)
            .map_batches(_long, batch_format="pyarrow",
                         zero_copy_batch=True)
            .map_batches(_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby(["component", "value"])
            .aggregate(Sum("n", alias_name="n")))
    top = grouped_topk(hist, "component", "n", "value", k=max(ks.values()))

    def _cut(batch: pa.Table) -> pa.Table:
        karr = pa.array([ks[c] for c in batch["component"].to_pylist()],
                        pa.int64())
        return batch.filter(pc.less_equal(batch["rank"], karr))

    return top.map_batches(_cut, batch_format="pyarrow",
                           zero_copy_batch=True)
