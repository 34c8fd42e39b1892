"""Stage: distributed transitive closure (SHUFFLE 3..k).

Iterative hash-partitioned min-label propagation over the match-edge table
(SURVEY.md P4): every node starts labeled with itself; each round every node
adopts ``min(own label, min(neighbor labels))`` via a hash join
(edges x labels) + ``groupby(node).min(label)``; fixed point when no label
changes. Monotone (labels only decrease), so replays/retries converge to the
identical partition — the determinism the resume test relies on.

Rounds are bounded by the graph diameter; blocking keeps components tiny
(an entity's mentions form a near-clique), so 2-4 rounds in practice with a
hard cap. Labels are materialized once per round — the label table is
O(#nodes-in-edges) = O(mentions), orders of magnitude smaller than the turn
table, and Ray's object store spills it if needed.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _rename(ds, mapping: dict):
    """rename via an Arrow map_batches (Dataset.rename_columns breaks on
    pandas-backed blocks in Ray 2.49)."""
    def _f(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def connected_components(edges, num_partitions: int = 32,
                         max_rounds: int = 12):
    """edges: Dataset[(u:string, v:string)] -> Dataset[(node_id, cluster_id)].

    cluster_id is the lexicographic min node_id of the component (stable,
    deterministic). Nodes not present in any edge are absent — callers give
    singletons their own node_id via a left join.
    """
    # symmetric edge list: (src, dst) both directions
    fwd = _rename(edges.select_columns(["u", "v"]),
                  {"u": "src", "v": "dst"}).select_columns(["src", "dst"])
    rev = _rename(edges.select_columns(["v", "u"]),
                  {"v": "src", "u": "dst"}).select_columns(["src", "dst"])
    sym = fwd.union(rev).materialize()

    # initial labels: every endpoint labels itself
    labels = (
        sym.select_columns(["src"])
        .groupby("src").count()
        .drop_columns(["count()"])
        .map_batches(lambda b: pa.table({"node_id": b["src"],
                                         "label": b["src"]}),
                     batch_format="pyarrow")
        .materialize()
    )

    for _ in range(max_rounds):
        # candidate label per node: min over neighbors' labels
        cand = (
            sym.join(labels, join_type="inner",
                     num_partitions=num_partitions,
                     on=("dst",), right_on=("node_id",))
            .select_columns(["src", "label"])
            .groupby("src").min("label")
        )
        cand = _rename(cand, {"src": "node_id", "min(label)": "nbr_label"})
        merged = labels.join(
            cand, join_type="left_outer", num_partitions=num_partitions,
            on=("node_id",),
        )

        def take_min(b):
            import pyarrow as pa
            import pyarrow.compute as pc
            nbr = pc.fill_null(b["nbr_label"], b["label"])
            new = pc.min_element_wise(b["label"], nbr)
            changed = pc.cast(pc.not_equal(new, b["label"]), pa.int64())
            return pa.table({"node_id": b["node_id"], "label": new,
                             "changed": changed})

        merged = merged.map_batches(take_min, batch_format="pyarrow") \
                       .materialize()
        n_changed = merged.sum("changed")
        labels = merged.drop_columns(["changed"]).materialize()
        if not n_changed:
            break

    return _rename(labels, {"label": "cluster_id"})
