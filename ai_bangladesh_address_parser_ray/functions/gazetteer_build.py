"""Distributed gazetteer-dim build (SURVEY.md A2/S7).

The reference builds its gazetteer by scanning a labels JSON on one process
(``/root/reference/src/core/stages/gazetteer.py:58-128``). At corpus scale
the same agg is a pre-aggregated groupby: count distinct
``(area, district, division, postal_code)`` combos across the cluster (the
shuffle moves ONE row per distinct combo per block, thanks to partial
aggregation), then finalize the tiny count table on the driver with the
reference's mode/frequency rules (``kernel.gazetteer.build_from_labels``).
"""

from __future__ import annotations

from ..kernel.gazetteer import Gazetteer, build_from_labels

_COLS = ["area", "district", "division", "postal_code"]


def build_gazetteer(labels_ds) -> "Gazetteer":
    """labels_ds: Dataset with (area, district, division, postal_code)
    columns (extra columns are pruned before the shuffle)."""
    counts = labels_ds.select_columns(_COLS).groupby(_COLS).count()
    rows = []
    for b in counts.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            r["n"] = r.pop("count()")
            rows.append(r)
    return build_from_labels(rows)
