"""Stage: pairwise scoring (P1 semantics, JW/Lev/Jaccard ensemble).

map_batches over the candidate-pair table. Fast path first: the huge
majority of candidate pairs either share every weighted field verbatim
(same-entity variants after extraction canonicalizes them) or disagree on an
identifier field — both decided by vectorized equality; only the residual
fuzzy comparisons run the Python ensemble. Stateless (the kernel scorer is a
pure module function), so plain tasks — no actor needed.
"""

from __future__ import annotations

import pandas as pd

from ..kernel.compare import MATCH_THRESHOLD, score_pair
from .. import COMPONENT_FIELDS


def _score_batch(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    import numpy as np

    # vectorized fast path: pairs whose 9 component fields are all equal
    # score exactly 1.0 (score_pair of identical non-empty components) —
    # after extraction canonicalizes surface variants, this is the common
    # case, and also what makes duplicate pairs from overlapping blocking
    # keys nearly free to re-score
    all_eq = np.ones(len(df), dtype=bool)
    any_field = np.zeros(len(df), dtype=bool)
    for f in COMPONENT_FIELDS:
        l = df["l_" + f].fillna("").to_numpy()
        r = df["r_" + f].fillna("").to_numpy()
        all_eq &= (l == r)
        any_field |= (l != "") | (r != "")
    fast = all_eq & any_field

    scores = np.empty(len(df), dtype="float64")
    matches = np.empty(len(df), dtype=bool)
    scores[fast] = 1.0
    matches[fast] = True

    if (~fast).any():
        slow = df.loc[~fast]
        s_scores, s_matches = [], []
        for row in slow.itertuples(index=False):
            d = row._asdict()
            c1 = {f: d["l_" + f] for f in COMPONENT_FIELDS}
            c2 = {f: d["r_" + f] for f in COMPONENT_FIELDS}
            s = score_pair(c1, c2, threshold)
            s_scores.append(s["score"])
            s_matches.append(s["match"])
        scores[~fast] = s_scores
        matches[~fast] = s_matches

    out = df[["pair_key", "u", "v"]].copy()
    out["score"] = pd.Series(scores, index=df.index, dtype="float64")
    out["match"] = pd.Series(matches, index=df.index, dtype="bool")
    return out


def score_pairs_stage(ds, threshold: float = MATCH_THRESHOLD,
                      batch_size: int = 2048):
    return ds.map_batches(
        _score_batch,
        fn_kwargs={"threshold": threshold},
        batch_format="pandas",
        batch_size=batch_size,
    )
