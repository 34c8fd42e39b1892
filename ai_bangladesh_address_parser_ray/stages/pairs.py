"""Stage: candidate-pair generation (SHUFFLE 2: groupby block_key).

``groupby("block_key").map_groups(...)``: each block emits its candidate
pairs with both sides' components inlined, so scoring needs no further join.

Skew handling (the Dhaka problem — SURVEY.md §4.2): pair count is quadratic
per block, so a group-size *cap* bounds the worst case. Blocks with
``n <= cap`` emit all C(n,2) pairs; oversized blocks switch to
sorted-neighborhood generation — rows sorted by (house, road, node_id) so
same-entity records are adjacent, then a sliding window of ``window`` emits
O(n*window) pairs. Every oversized block is counted and surfaced in the
pipeline metrics (no silent truncation).

A pair can be produced by several keys (ad/pc/sx/mh overlap heavily), so a
second groupby on the canonical ``pair_key`` dedups before scoring — this
also re-balances the scoring stage across the cluster.
"""

from __future__ import annotations

import pandas as pd

from .. import COMPONENT_FIELDS

_L = ["l_" + f for f in COMPONENT_FIELDS]
_R = ["r_" + f for f in COMPONENT_FIELDS]
PAIR_COLUMNS = ["pair_key", "u", "v"] + _L + _R


def _pairs_from_group(df: pd.DataFrame, cap: int, window: int) -> pd.DataFrame:
    # dedup nodes within the block (one node can reach a key twice only via
    # a bug, but keep the invariant explicit), sort for determinism
    df = (df.drop_duplicates("node_id")
            .sort_values(["house_number", "road", "node_id"])
            .reset_index(drop=True))
    n = len(df)
    if n < 2:
        return pd.DataFrame(columns=PAIR_COLUMNS)

    idx_pairs = []
    if n <= cap:
        for i in range(n - 1):
            for j in range(i + 1, n):
                idx_pairs.append((i, j))
    else:
        for i in range(n - 1):
            for j in range(i + 1, min(i + 1 + window, n)):
                idx_pairs.append((i, j))

    li = [p[0] for p in idx_pairs]
    ri = [p[1] for p in idx_pairs]
    left = df.iloc[li].reset_index(drop=True)
    right = df.iloc[ri].reset_index(drop=True)
    u = left["node_id"].to_numpy()
    v = right["node_id"].to_numpy()
    # canonical orientation u < v so the same pair dedups across blocks
    swap = u > v
    u2 = u.copy()
    u2[swap] = v[swap]
    v2 = v.copy()
    v2[swap] = u[swap]
    out = {"pair_key": [f"{a}||{b}" for a, b in zip(u2, v2)],
           "u": u2, "v": v2}
    for f in COMPONENT_FIELDS:
        lvals = left[f].to_numpy()
        rvals = right[f].to_numpy()
        lv = lvals.copy()
        lv[swap] = rvals[swap]
        rv = rvals.copy()
        rv[swap] = lvals[swap]
        out["l_" + f] = lv
        out["r_" + f] = rv
    return pd.DataFrame(out)


def candidate_pairs_stage(ds, cap: int = 64, window: int = 8,
                          oversize_counter=None):
    """blocked rows -> candidate-pair table (NOT deduped across keys).

    A pair reached via several blocking keys (ad/pc/sx/mh overlap heavily)
    is emitted once per key. We deliberately do NOT shuffle the wide pair
    table on pair_key to dedup here: scoring a duplicate is a vectorized
    equality check (~ns), while deduping first would move every pair row
    (21 columns) through an extra all-to-all exchange. Dedup happens after
    scoring on the *edge* table (3 columns, matches only) — see
    ``linkage.run_linkage`` — and union-find is invariant to duplicate
    edges anyway.
    """

    def gen(df: pd.DataFrame) -> pd.DataFrame:
        if oversize_counter is not None and len(df) > cap:
            oversize_counter.add.remote(df["block_key"].iloc[0], len(df))
        return _pairs_from_group(df, cap, window)

    return ds.groupby("block_key").map_groups(gen, batch_format="pandas")
