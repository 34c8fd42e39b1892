"""Pairwise-F1 evaluation at the reference blocking keys (BASELINE metric).

Labeled pairs = candidate pairs of *labeled mention turns* that share at
least one blocking key (``stages.blocking.keys_for_row`` — the same recipe
the pipeline shuffles on, which is what "at the same blocking key" means in
``BASELINE.json``). A pair is positive iff both mentions carry the same
ground-truth ``entity_id``; predicted-positive iff the pipeline assigned the
same ``cluster_id``. Driver-side: the labeled mention set is test-scale.
"""

from __future__ import annotations

import collections
import itertools
from typing import Dict, Tuple

import pandas as pd

from .. import COMPONENT_FIELDS
from ..stages.blocking import keys_for_row


def pairwise_f1(turns_df: pd.DataFrame, mentions_df: pd.DataFrame,
                max_block: int = 1000) -> Dict:
    """turns_df: pipeline output (conv_id, turn_idx, components..., cluster_id)
    mentions_df: ground truth (conv_id, turn_idx, entity_id)."""
    truth: Dict[Tuple[str, int], str] = {
        (r.conv_id, int(r.turn_idx)): r.entity_id
        for r in mentions_df.itertuples()
    }
    pred: Dict[Tuple[str, int], str] = {}
    by_key = collections.defaultdict(set)
    for r in turns_df.itertuples():
        k = (r.conv_id, int(r.turn_idx))
        if k not in truth:
            continue
        pred[k] = r.cluster_id
        row = {f: getattr(r, f) for f in COMPONENT_FIELDS}
        for bk in keys_for_row(row):
            by_key[bk].add(k)

    cand = set()
    for bk, nodes in by_key.items():
        if len(nodes) > max_block:
            continue
        for a, b in itertools.combinations(sorted(nodes), 2):
            cand.add((a, b))

    tp = fp = fn = tn = 0
    for a, b in cand:
        same_t = truth[a] == truth[b]
        same_p = pred.get(a) == pred.get(b) and pred.get(a) is not None
        if same_t and same_p:
            tp += 1
        elif same_p:
            fp += 1
        elif same_t:
            fn += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "precision": precision, "recall": recall, "f1": f1,
            "candidate_pairs": len(cand)}
