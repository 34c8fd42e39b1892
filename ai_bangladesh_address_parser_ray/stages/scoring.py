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


from ..kernel.compare import (ALL_COMPONENTS, COMPARE_WEIGHTS,
                              _IDENTIFIER_FIELDS)


def _score_batch(df: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Vectorized twin of ``kernel.compare.score_pair`` over a pair batch.

    After extraction canonicalizes surface variants, almost every component
    similarity is decided by exact (lowercased) equality — 1.0 — or by the
    identifier-exact rule — 0.0. Both vectorize. Only pairs with a
    non-equal *textual* field (fuzzy ensemble needed) fall back to the
    Python kernel, row by row; tests assert batch == kernel element-wise.
    """
    import numpy as np

    n = len(df)
    ncomp = len(ALL_COMPONENTS)
    sims = np.full((ncomp, n), np.nan)
    slow_mask = np.zeros(n, dtype=bool)

    for i, f in enumerate(ALL_COMPONENTS):
        ls = df["l_" + f].fillna("").astype(str).str.strip().str.lower()
        rs = df["r_" + f].fillna("").astype(str).str.strip().str.lower()
        l, r = ls.to_numpy(), rs.to_numpy()
        both = (l != "") & (r != "")
        eq = both & (l == r)
        sims[i, eq] = 1.0
        ne = both & ~eq
        if ne.any():
            if f in _IDENTIFIER_FIELDS:
                # vectorized twin of kernel _is_identifier — any digits AND
                # (short OR digit-dominant among alphanumerics) — computed
                # only on the (rare) non-equal subset
                ne_idx = np.flatnonzero(ne)
                ls_s = ls.iloc[ne_idx]
                rs_s = rs.iloc[ne_idx]
                nd_l = ls_s.str.count(r"\d").to_numpy()
                nd_r = rs_s.str.count(r"\d").to_numpy()
                an_l = ls_s.str.count(r"[0-9a-zA-Z]").to_numpy()
                an_r = rs_s.str.count(r"[0-9a-zA-Z]").to_numpy()
                is_id_l = (nd_l > 0) & ((ls_s.str.len().le(6).to_numpy())
                                        | (nd_l * 2 >= an_l))
                is_id_r = (nd_r > 0) & ((rs_s.str.len().le(6).to_numpy())
                                        | (nd_r * 2 >= an_r))
                id_exact = is_id_l | is_id_r
                sims[i, ne_idx[id_exact]] = 0.0
                slow_mask[ne_idx[~id_exact]] = True
            else:
                slow_mask |= ne

    w = np.array([COMPARE_WEIGHTS.get(f, 0.0) for f in ALL_COMPONENTS])
    present = ~np.isnan(sims)
    weighted_present = present & (w[:, None] > 0)
    tw = (w[:, None] * weighted_present).sum(axis=0)
    ws = np.nansum(np.where(weighted_present, sims, 0.0) * w[:, None], axis=0)
    # tw == 0 -> fall back to avg of all present sims (kernel semantics);
    # no sims at all -> 0.0
    n_present = present.sum(axis=0)
    avg = np.where(n_present > 0,
                   np.nansum(np.where(present, sims, 0.0), axis=0)
                   / np.maximum(n_present, 1), 0.0)
    scores = np.round(np.where(tw > 0, ws / np.maximum(tw, 1e-12), avg), 3)
    matches = scores >= threshold

    if slow_mask.any():
        slow = df.loc[slow_mask]
        s_scores, s_matches = [], []
        for row in slow.itertuples(index=False):
            d = row._asdict()
            c1 = {f: d["l_" + f] for f in COMPONENT_FIELDS}
            c2 = {f: d["r_" + f] for f in COMPONENT_FIELDS}
            s = score_pair(c1, c2, threshold)
            s_scores.append(s["score"])
            s_matches.append(s["match"])
        scores[slow_mask] = s_scores
        matches[slow_mask] = s_matches

    # pair_key is absent on the fused-scoring path (pairs.py elides it)
    keep = [c for c in ("pair_key", "u", "v") if c in df.columns]
    out = df[keep].copy()
    out["score"] = pd.Series(scores, index=df.index, dtype="float64")
    out["match"] = pd.Series(matches, index=df.index, dtype="bool")
    return out


def compare_components_batch(df: pd.DataFrame):
    """Vectorized twin of ``kernel.compare.compare_components`` over a
    pair frame with ``l_<comp>`` / ``r_<comp>`` columns -> numpy arrays
    ``(similarity, score, match)`` (the reference-parity SequenceMatcher
    comparison, NOT the linkage ensemble: every non-equal both-present
    pair runs seq_ratio). Same fast-path shape as :func:`_score_batch` —
    exact lowercased equality decides sim=1.0 vectorized; only the
    residual non-equal cells call the Python SequenceMatcher (rare after
    extraction canonicalizes variants). Tests assert element-wise
    equality with the scalar kernel."""
    import numpy as np

    from ..kernel.compare import seq_ratio

    n = len(df)
    ncomp = len(ALL_COMPONENTS)
    sims = np.full((ncomp, n), np.nan)
    for i, f in enumerate(ALL_COMPONENTS):
        ls = df["l_" + f].fillna("").astype(str).str.strip().str.lower()
        rs = df["r_" + f].fillna("").astype(str).str.strip().str.lower()
        l, r = ls.to_numpy(), rs.to_numpy()
        both = (l != "") & (r != "")
        eq = both & (l == r)
        sims[i, eq] = 1.0
        for j in np.flatnonzero(both & ~eq):
            sims[i, j] = seq_ratio(l[j], r[j])

    present = ~np.isnan(sims)
    n_present = present.sum(axis=0)
    avg = np.where(n_present > 0,
                   np.nansum(np.where(present, sims, 0.0), axis=0)
                   / np.maximum(n_present, 1), 0.0)
    w = np.array([COMPARE_WEIGHTS.get(f, 0.0) for f in ALL_COMPONENTS])
    wp = present & (w[:, None] > 0)
    tw = (w[:, None] * wp).sum(axis=0)
    ws = np.nansum(np.where(wp, sims, 0.0) * w[:, None], axis=0)
    score = np.where(tw > 0, ws / np.maximum(tw, 1e-12), avg)
    # kernel order: match decided on the RAW score, outputs rounded after
    match = score >= MATCH_THRESHOLD
    return np.round(avg, 3), np.round(score, 3), match


def score_pairs_stage(ds, threshold: float = MATCH_THRESHOLD,
                      batch_size: int = 2048):
    return ds.map_batches(
        _score_batch,
        fn_kwargs={"threshold": threshold},
        batch_format="pandas",
        batch_size=batch_size,
    )
