"""Stage: fused 9-stage extraction as an actor-pool map_batches.

``ExtractTurns`` is a callable CLASS: the kernel (compiled pattern bank +
gazetteer dim — the broadcast small side) is built once per actor in
``__init__`` and reused for every batch, exactly the reference's
load-once-per-process amortization (``api/python/fastapi_server.py:34-38``)
made horizontal.

``dedup_extract_stage`` replaces the reference's memo cache
(``src/core/extractor.py:129-141``) with the scale-correct equivalent:
shuffle distinct ``norm_text`` (SHUFFLE 1), extract each distinct string
once, hash-join results back to turns. Semantically identical to a 100%
cache-hit memo, but distributed and unbounded.
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa

from .. import COMPONENT_FIELDS
from ..kernel.extract import ExtractionKernel


class ExtractTurns:
    """Actor: batch of norm_text -> 9 component columns + overall_confidence."""

    def __init__(self, thresholds: Optional[Dict[str, float]] = None,
                 stages: Optional[Dict[str, bool]] = None,
                 text_column: str = "norm_text"):
        self.kernel = ExtractionKernel(thresholds=thresholds, stages=stages)
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        cols = {f: [] for f in COMPONENT_FIELDS}
        confs = []
        extract = self.kernel.extract  # bind once; hot loop below is the
        # per-distinct-string regex kernel — O(distinct), not O(turns)
        for t in texts:
            # norm_text is already normalized; stage 2 inside the kernel is
            # idempotent on normalized input so reuse the fused path as-is
            res = extract(t or "")
            comp = res["components"]
            for f in COMPONENT_FIELDS:
                cols[f].append(comp[f])
            confs.append(res["overall_confidence"])
        out = batch
        for f in COMPONENT_FIELDS:
            out = out.append_column(f, pa.array(cols[f], pa.string()))
        out = out.append_column(
            "overall_confidence", pa.array(confs, pa.float64()))
        return out


def _auto_concurrency(concurrency):
    """Leave headroom for shuffle-aggregator actors and map tasks: an actor
    pool that grabs every CPU deadlocks the downstream hash shuffle on
    small clusters."""
    if concurrency is not None:
        return concurrency
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(2, cpus // 4)


def extract_stage(ds, concurrency=None, batch_size: int = 1024,
                  thresholds=None, stages=None, text_column="norm_text"):
    concurrency = _auto_concurrency(concurrency)
    return ds.map_batches(
        ExtractTurns,
        fn_constructor_kwargs={"thresholds": thresholds, "stages": stages,
                               "text_column": text_column},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def dedup_extract_stage(ds, concurrency=None, batch_size: int = 1024,
                        num_partitions: int = 16,
                        thresholds=None, stages=None):
    """Exact-dedup-before-compute: extract once per distinct norm_text, then
    hash-join the component columns back onto every turn.

    groupby().count() runs with partial pre-aggregation inside map tasks, so
    the shuffle moves one row per distinct string, not per turn.
    """
    distinct = (
        ds.select_columns(["norm_text"])      # prune: only the key crosses
        .groupby("norm_text")
        .count()
        .drop_columns(["count()"])
    )
    extracted = extract_stage(
        distinct, concurrency=concurrency, batch_size=batch_size,
        thresholds=thresholds, stages=stages)
    return ds.join(
        extracted,
        join_type="inner",
        num_partitions=num_partitions,
        on=("norm_text",),
    )
