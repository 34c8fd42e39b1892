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
    scores = []
    matches = []
    for row in df.itertuples(index=False):
        d = row._asdict()
        c1 = {f: d["l_" + f] for f in COMPONENT_FIELDS}
        c2 = {f: d["r_" + f] for f in COMPONENT_FIELDS}
        s = score_pair(c1, c2, threshold)
        scores.append(s["score"])
        matches.append(s["match"])
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
