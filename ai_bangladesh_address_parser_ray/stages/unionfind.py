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


BROADCAST_LABEL_LIMIT = 2_000_000


def connected_components(edges, num_partitions: int = 32,
                         max_rounds: int = 16,
                         broadcast_limit: int = BROADCAST_LABEL_LIMIT):
    """edges: Dataset[(u:string, v:string)] -> Dataset[(node_id, cluster_id)].

    cluster_id is the lexicographic min node_id of the component (stable,
    deterministic). Nodes not present in any edge are absent — callers give
    singletons their own node_id via a left join.

    Two physical strategies, same semantics:

    - **broadcast** (label table fits the driver, <= broadcast_limit nodes):
      per round, the label map is ``ray.put`` once and every edge block
      computes per-src partial min-neighbor-labels in a map task (no
      shuffle); the driver folds the tiny partials and fully
      path-compresses the label forest between rounds, so convergence is
      O(log diameter) rounds. Edge blocks stream — only labels live on the
      driver. Blocking keeps components (and thus the label table per
      connected subgraph) small; 2M labels ~ 100 MB.
    - **hash-join** (label table too big to broadcast): classic iterative
      hash-partitioned min-label propagation — edges x labels join,
      groupby(src).min(label), left join back, repeat to fixed point.

    Both are monotone (labels only decrease), so retries/replays converge
    to the identical partition.
    """
    # symmetric edge list: (src, dst) both directions
    fwd = _rename(edges.select_columns(["u", "v"]),
                  {"u": "src", "v": "dst"}).select_columns(["src", "dst"])
    rev = _rename(edges.select_columns(["v", "u"]),
                  {"v": "src", "u": "dst"}).select_columns(["src", "dst"])
    sym = fwd.union(rev).materialize()

    if sym.count() <= 2 * broadcast_limit:
        return _broadcast_components(sym, max_rounds)

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


def _broadcast_components(sym, max_rounds: int):
    """Broadcast-label propagation (see connected_components docstring)."""
    import pandas as pd
    import ray

    # initial labels: every endpoint labels itself (driver dict, small side)
    labels: dict = {}
    for b in sym.select_columns(["src"]).iter_batches(batch_format="pyarrow"):
        for nid in b["src"].to_pylist():
            labels[nid] = nid

    for _ in range(max_rounds):
        ref = ray.put(labels)

        def prop(batch: pa.Table) -> pa.Table:
            lab = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            df = pd.DataFrame({"src": batch["src"].to_pylist(),
                               "dst": batch["dst"].to_pylist()})
            df["dlab"] = df["dst"].map(lab)
            part = df.groupby("src", sort=False)["dlab"].min().reset_index()
            return pa.table({"node_id": part["src"].astype(str),
                             "label": part["dlab"].astype(str)})

        partials = sym.map_batches(prop, batch_format="pyarrow",
                                   zero_copy_batch=True)
        changed = 0
        for b in partials.iter_batches(batch_format="pyarrow"):
            for nid, cand in zip(b["node_id"].to_pylist(),
                                 b["label"].to_pylist()):
                if cand < labels[nid]:
                    labels[nid] = cand
                    changed += 1
        # full path compression: label(node) <- root label; O(nodes)
        for nid in labels:
            root = nid
            while labels[root] != root:
                root = labels[root]
            while labels[nid] != root:
                labels[nid], nid = root, labels[nid]
        if changed == 0:
            break

    nodes = sorted(labels)
    tbl = pa.table({"node_id": pa.array(nodes, pa.string()),
                    "cluster_id": pa.array([labels[n] for n in nodes],
                                           pa.string())})
    import ray.data as rd
    return rd.from_arrow(tbl)
