"""Stage: distributed transitive closure (SHUFFLE 3..k).

Iterative hash-partitioned min-label propagation over the match-edge table
(SURVEY.md P4): every node starts labeled with itself; each round every node
adopts ``min(own label, min(neighbor labels))``; fixed point when no label
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


# label-vector broadcast cap: 8M labels = a 64 MB int64 parent vector per
# round plus a ~200 MB one-time string universe on the driver — small-side
# territory for any realistic worker/driver heap. Beyond it the fully
# distributed hash-join strategy engages.
BROADCAST_LABEL_LIMIT = 8_000_000

# diagnostics of the last connected_components call (rounds used,
# convergence). DIAGNOSTIC ONLY: concurrent pipelines in one driver would
# cross-wire this global, so run_linkage passes its own ``run_info`` dict
# and consumes the joinback index from THAT, never from here.
LAST_RUN_INFO: dict = {}

# below this edge count the distributed machinery costs more than the work:
# a repartition + tree fold is ~1.5 s of fixed scheduling for a table a
# single numpy kernel closes in microseconds. The edge list is already
# small-side by definition here (it fits one block).
LOCAL_EDGE_LIMIT = 50_000


def _min_fixpoint(par, a, b):
    """par <- per-component min over the union of (a<->b) links.

    BOTH propagation directions every sweep: one-directional min-scatter
    loses links like stars {3->1},{3->0} (node 1 never learns 0 through
    3), and repartitioned edge blocks are not guaranteed to hold both
    directions of an edge."""
    import numpy as np
    while True:
        new = par.copy()
        np.minimum.at(new, a, par[b])
        np.minimum.at(new, b, par[a])
        np.minimum(new, new[new], out=new)     # pointer jump
        if np.array_equal(new, par):
            return par
        par = new


def connected_components(edges, num_partitions: int = 32,
                         max_rounds: int = 16,
                         broadcast_limit: int = BROADCAST_LABEL_LIMIT,
                         run_info: dict = None):
    """edges: Dataset[(u:string, v:string)] -> Dataset[(node_id, cluster_id)].

    cluster_id is the lexicographic min node_id of the component (stable,
    deterministic). Nodes not present in any edge are absent — callers give
    singletons their own node_id via a left join.

    Two physical strategies, same semantics:

    - **broadcast** (label table fits one worker's heap, <= broadcast_limit
      nodes): single-pass two-level union-find — each edge block computes
      its LOCAL min-label closure and emits a sparse star forest (touched
      node -> local min), a TREE of tasks (arity 8) union-finds the
      forests, and the driver scatters the one final (node, root) forest
      into the identity parent vector. No rounds, no per-round parent
      broadcast, and per-task output tracks block edges (not the node
      universe), so the phase keeps scaling as tasks are added.
    - **hash-join** (label table too big to broadcast): iterative
      hash-partitioned min-label propagation — edges x labels join,
      groupby(src).min(label), left join back — plus a pointer-jumping
      compression join per round (labels join labels on label==node), so
      reachable-hop distance DOUBLES per round: max_rounds=16 covers
      diameter 2^16, and long sorted-neighborhood chains cannot exhaust
      the round budget. If the budget is somehow exhausted unconverged we
      raise rather than silently return split components.

    Both are monotone (labels only decrease), so retries/replays converge
    to the identical partition.
    """
    import os as _os
    import time as _time
    _dbg = _os.environ.get("GRAFT_UF_DEBUG")
    _t = _time.time()

    def _mark(tag):
        nonlocal _t
        if _dbg:
            print(f"UF {tag}: {_time.time() - _t:.1f}s", flush=True)
        _t = _time.time()

    # Strategy gate on the NODE count, not the edge count: the broadcast
    # path's footprint is the label vector (nodes), and multi-edges from
    # overlapping blocking keys inflate the edge table ~3x without adding
    # a single node. The broadcast path never materializes a symmetric
    # STRING edge list — symmetrization happens in int index space inside
    # the one-pass conversion tasks (both directions emitted from each
    # edge block), halving the string bytes touched. Only the hash-join
    # fallback (label table beyond driver reach) builds the symmetric
    # string table it joins on.
    n_edges = edges.count()
    _mark(f"count_gate ({n_edges} edges)")
    if n_edges <= LOCAL_EDGE_LIMIT:
        import numpy as np
        tbl = pa.concat_tables(
            edges.iter_batches(batch_format="pyarrow", batch_size=65536),
            promote_options="default") if n_edges else None
        if n_edges == 0:
            tbl = pa.table({"u": pa.array([], pa.string()),
                            "v": pa.array([], pa.string())})
        ua = tbl["u"].combine_chunks().to_numpy(zero_copy_only=False)
        va = tbl["v"].combine_chunks().to_numpy(zero_copy_only=False)
        nodes = np.unique(np.concatenate([ua, va]))
        a = np.searchsorted(nodes, ua)
        b = np.searchsorted(nodes, va)
        par = _min_fixpoint(np.arange(len(nodes), dtype=np.int64), a, b)
        _mark(f"local_fixpoint ({len(nodes)} nodes)")
        _publish_info(run_info, {"strategy": "local", "rounds": 1,
                                 "converged": True, "n_nodes": len(nodes)})
        return ray.data.from_arrow(pa.table({
            "node_id": pa.array(nodes, pa.string()),
            "cluster_id": pa.array(nodes[par], pa.string())}))
    if n_edges <= 16 * broadcast_limit:
        nodes = _collect_universe(edges)
        _mark(f"collect_universe ({len(nodes)} nodes)")
        if len(nodes) <= broadcast_limit:
            return _broadcast_components(edges, max_rounds, nodes=nodes,
                                         run_info=run_info)

    # symmetric edge list: (src, dst) both directions
    fwd = _rename(edges.select_columns(["u", "v"]),
                  {"u": "src", "v": "dst"}).select_columns(["src", "dst"])
    rev = _rename(edges.select_columns(["v", "u"]),
                  {"v": "src", "u": "dst"}).select_columns(["src", "dst"])
    sym = fwd.union(rev).materialize()
    _mark("sym_materialize")
    return _hashjoin_components(sym, num_partitions, max_rounds,
                                run_info=run_info)


def _publish_info(run_info, info: dict):
    """Populate the caller's per-run dict (authoritative) and mirror into
    the diagnostic module global."""
    if run_info is not None:
        run_info.clear()
        run_info.update(info)
    LAST_RUN_INFO.clear()
    LAST_RUN_INFO.update(
        {k: v for k, v in info.items() if k != "joinback_index_ref"})


def _hashjoin_components(sym, num_partitions: int, max_rounds: int,
                         run_info: dict = None):
    """Fully-distributed strategy: no single structure is ever collected.

    Each round = one-hop neighbor-min propagation (join + groupby.min +
    join back) FOLLOWED by one pointer-jumping compression join
    (label <- label[label]), doubling effective hop reach per round."""
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

    def take_min(b):
        import pyarrow as pa
        import pyarrow.compute as pc
        nbr = pc.fill_null(b["nbr_label"], b["label"])
        new = pc.min_element_wise(b["label"], nbr)
        changed = pc.cast(pc.not_equal(new, b["label"]), pa.int64())
        return pa.table({"node_id": b["node_id"], "label": new,
                         "changed": changed})

    converged = False
    rounds_used = 0
    for _round in range(max_rounds):
        rounds_used = _round + 1
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
        merged = merged.map_batches(take_min, batch_format="pyarrow") \
                       .materialize()
        n_changed = merged.sum("changed")
        labels = merged.drop_columns(["changed"])

        # pointer jumping: label <- label(label). Join the label table to
        # itself (left.label == right.node_id); monotone, and doubles the
        # hop distance covered per outer round.
        lab_as_parent = _rename(labels, {"node_id": "label",
                                         "label": "nbr_label"})
        jumped = labels.join(
            lab_as_parent, join_type="left_outer",
            num_partitions=num_partitions, on=("label",),
        )
        labels = jumped.map_batches(take_min, batch_format="pyarrow") \
                       .drop_columns(["changed"]).materialize()
        if not n_changed:
            converged = True
            break

    info = {"strategy": "hash_join", "rounds": rounds_used,
            "converged": converged}
    _publish_info(run_info, info)
    if not converged:
        # one more propagation pass to CHECK the fixed point: labels may
        # have converged exactly at the last allowed round
        cand = (
            sym.join(labels, join_type="inner",
                     num_partitions=num_partitions,
                     on=("dst",), right_on=("node_id",))
            .select_columns(["src", "label"])
            .groupby("src").min("label")
        )
        cand = _rename(cand, {"src": "node_id", "min(label)": "nbr_label"})
        merged = labels.join(cand, join_type="left_outer",
                             num_partitions=num_partitions, on=("node_id",))
        still = merged.map_batches(take_min, batch_format="pyarrow") \
                      .sum("changed")
        if still:
            raise RuntimeError(
                f"connected_components: hash-join strategy exhausted "
                f"max_rounds={max_rounds} with {still} labels still "
                f"changing — components would be silently split. Raise "
                f"max_rounds (hop reach doubles per round).")
        info["converged"] = True
        _publish_info(run_info, info)

    return _rename(labels, {"label": "cluster_id"})


def _collect_universe(edges):
    """Distinct node ids over BOTH endpoint columns of the (directed) edge
    table, sorted: per-block partial uniques in leaf tasks, hash-based
    merge in a TREE of tasks (arity 8) — the driver only ray.gets the
    single root result, never iterates blocks. All set ops are Arrow C
    kernels (``pc.unique`` / ``array_sort_indices``) over string arrays —
    the previous object-ndarray version paid a driver-serial ``np.sort``
    with per-element Python compares over the whole universe (tens of
    seconds at 10^6.5 nodes), plus object pickling at every tree edge.
    The final sort runs in the root TASK, off the driver; UTF-8 byte order
    == code-point order, so the result is the same lexicographic order.
    Returns a sorted ``pa.StringArray`` (possibly empty), zero-copy to the
    driver."""
    import pyarrow.compute as _pc
    import ray

    _EMPTY = pa.array([], pa.string())

    def _uniq(arrs):
        arrs = [a for a in arrs if len(a)]
        if not arrs:
            return _EMPTY
        u = _pc.unique(pa.chunked_array(arrs))
        return u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u

    @ray.remote(num_cpus=1)
    def _leaf(*blocks: pa.Table) -> pa.Array:
        parts = []
        for b in blocks:
            if not b.num_rows:
                continue
            for col in ("u", "v"):
                if col in b.column_names:
                    c = b[col]
                    parts.append(c.combine_chunks()
                                 if isinstance(c, pa.ChunkedArray) else c)
        return _uniq(parts)

    @ray.remote(num_cpus=1)
    def _merge(*parts) -> pa.Array:
        return _uniq(list(parts))

    @ray.remote(num_cpus=1)
    def _merge_sort(*parts) -> pa.Array:
        u = _uniq(list(parts))
        return u.take(_pc.array_sort_indices(u))

    block_refs = edges.to_arrow_refs()
    if not block_refs:
        return _EMPTY
    # one leaf task per ~CPU, each eating a chunk of blocks: per-task
    # scheduling overhead stays constant as the block count grows
    cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
    chunk = max(1, (len(block_refs) + cpus - 1) // cpus)
    refs = [_leaf.remote(*block_refs[i:i + chunk])
            for i in range(0, len(block_refs), chunk)]
    ARITY = 8
    while len(refs) > ARITY:
        refs = [_merge.remote(*refs[i:i + ARITY])
                for i in range(0, len(refs), ARITY)]
    return ray.get(_merge_sort.remote(*refs))


def _broadcast_components(edges, max_rounds: int, nodes=None,
                          run_info: dict = None):
    """Broadcast-label propagation (see connected_components docstring).

    Works in integer index space: the node universe is collected once
    (distributed per-block uniques, tree merge), the DIRECTED string edge
    list is converted to SYMMETRIC (src_idx, dst_idx) int64 blocks in ONE
    pass (both directions emitted as int rows, so no symmetric string
    table is ever built), then a single-pass TWO-LEVEL union-find resolves
    components: per-block local closure -> sparse star forests -> a tree
    of union-find merge tasks -> one final (node, root) forest scattered
    into the parent vector on the driver. Index rank preserves
    lexicographic node order, so min-index == min node_id — the same
    deterministic cluster_id as the hash-join strategy. Duplicate edges
    cost one int row each — no dedup shuffle needed upstream."""
    import os
    import time
    import numpy as np
    import pandas as pd
    import ray

    _dbg = os.environ.get("GRAFT_UF_DEBUG")
    _t0 = time.time()

    def _mark(tag):
        nonlocal _t0
        if _dbg:
            print(f"UF {tag}: {time.time() - _t0:.1f}s", flush=True)
        _t0 = time.time()

    if nodes is None:
        nodes = _collect_universe(edges)
    _mark("universe")
    if len(nodes) == 0:
        return ray.data.from_arrow(pa.table({
            "node_id": pa.array([], pa.string()),
            "cluster_id": pa.array([], pa.string())}))
    n = len(nodes)
    parent = np.arange(n, dtype=np.int64)

    # 2. one-pass string -> index conversion of the edge blocks; blocks
    # stay in the object store as (si, di) int64 pairs reachable by ref —
    # the driver never pulls them. The broadcast lookup is (sorted uint64
    # hash, rank) numpy arrays — ZERO-COPY per task, where a pd.Index of
    # object strings costs seconds of unpickling + hashtable build per
    # task (see _join_clusters_back). Exactness: duplicate node-hash would
    # make searchsorted ambiguous, so the driver checks for collisions
    # once and falls back to the (slow, exact) pd.Index path — a ~1e-8
    # event at the broadcast limit.
    from .normalize import _hash64
    if not isinstance(nodes, (pa.Array, pa.ChunkedArray)):
        nodes = pa.array(nodes, pa.string())     # tool/test convenience
    if isinstance(nodes, pa.ChunkedArray):
        nodes = nodes.combine_chunks()
    h = _hash64(nodes).to_numpy()
    order = np.argsort(h, kind="stable").astype(np.int64)
    h_sorted = np.ascontiguousarray(h[order])
    unique_hashes = n == 0 or (np.diff(h_sorted) != 0).all()
    def _canon_dedup(ui: np.ndarray, vi: np.ndarray) -> pa.Table:
        """Canonical (min,max) orientation + per-batch dedupe. Overlapping
        blocking keys emit the same pair ~3x; dropping the duplicates here
        (one 128-bit structured unique per batch, no shuffle) shrinks every
        downstream fold input by that factor. NO symmetrized copy: both
        ``_local_star`` and ``_min_fixpoint`` treat (si, di) as undirected
        (the universe covers both endpoint columns and the min-scatter
        propagates both directions every sweep), so emitting each edge once
        halves the fold input again."""
        lo = np.minimum(ui, vi)
        hi = np.maximum(ui, vi)
        pairs = np.empty(len(lo), dtype=[("a", "i8"), ("b", "i8")])
        pairs["a"] = lo
        pairs["b"] = hi
        pairs = np.unique(pairs)
        return pa.table({"si": pa.array(pairs["a"], pa.int64()),
                         "di": pa.array(pairs["b"], pa.int64())})

    if unique_hashes:
        index_ref = ray.put((h_sorted, order))

        def _to_idx(batch: pa.Table) -> pa.Table:
            hs, rank = ray.get(index_ref)
            bu = _hash64(batch["u"]).to_numpy()
            bv = _hash64(batch["v"]).to_numpy()
            return _canon_dedup(rank[np.searchsorted(hs, bu)],
                                rank[np.searchsorted(hs, bv)])
    else:   # astronomically rare: exact hashtable fallback
        index_ref = ray.put(pd.Index(nodes.to_pandas()))

        def _to_idx(batch: pa.Table) -> pa.Table:
            idx = ray.get(index_ref)
            ui = idx.get_indexer(batch["u"].to_numpy(zero_copy_only=False))
            vi = idx.get_indexer(batch["v"].to_numpy(zero_copy_only=False))
            return _canon_dedup(ui, vi)
    _mark("index_put")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    sym_idx = edges.select_columns(["u", "v"]) \
                   .map_batches(_to_idx, batch_format="pyarrow",
                                zero_copy_batch=True) \
                   .repartition(cpus).materialize()   # few fat int blocks:
    # fatter blocks close more edges locally, shrinking merge inputs
    block_refs = sym_idx.to_arrow_refs()
    _mark("to_idx+repartition")

    # 3. ONE distributed pass, two-level union-find (no rounds):
    #    a. per block, LOCAL closure over the block's own edges (min-label
    #       fixed point from the identity labeling in a COMPRESSED local id
    #       space), emitting a SPARSE star forest (touched node -> local
    #       min label). Output bytes track the block's edge count, not the
    #       universe — the dense-vector design this replaces returned
    #       O(universe) bytes per task, so adding tasks at higher CPU
    #       counts ADDED total work and made the phase anti-scale.
    #    b. a TREE of merge tasks (arity 8) union-finds the star forests
    #       pairwise-associatively: each merge runs the same vectorized
    #       min-propagation over the concatenated (node, label) pairs in
    #       its own compressed id space and re-emits a contracted forest.
    #    c. the driver receives ONE final (node, root) forest and scatters
    #       it into the identity parent vector. Exact: each block's star
    #       forest preserves its subgraph's connectivity, and union-find
    #       over a union of forests is the closure of the union.
    # per-component min closure: module-level _min_fixpoint (shared with
    # the tiny-edge local path)

    @ray.remote(num_cpus=1)
    def _local_star(block: pa.Table):
        si = block["si"].to_numpy()
        di = block["di"].to_numpy()
        if len(si) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        # repartition may split an edge's two directions across blocks:
        # the local universe must cover BOTH endpoint columns
        touched = np.unique(np.concatenate([si, di]))
        lsi = np.searchsorted(touched, si)
        ldi = np.searchsorted(touched, di)
        par = _min_fixpoint(np.arange(len(touched), dtype=np.int64),
                            lsi, ldi)
        return touched, touched[par]

    @ray.remote(num_cpus=1)
    def _star_merge(*parts):
        idxs = np.concatenate([p[0] for p in parts])
        lbls = np.concatenate([p[1] for p in parts])
        local = np.unique(np.concatenate([idxs, lbls]))
        a = np.searchsorted(local, idxs)
        b = np.searchsorted(local, lbls)
        par = _min_fixpoint(np.arange(len(local), dtype=np.int64), a, b)
        # contract: emit only non-root nodes (roots map to themselves)
        keep = par != np.arange(len(local))
        return local[keep], local[par[keep]]

    ARITY = 8
    partials = [_local_star.remote(ref) for ref in block_refs]
    while len(partials) > 1:
        partials = [_star_merge.remote(*partials[i:i + ARITY])
                    for i in range(0, len(partials), ARITY)]
    idxs, lbls = ray.get(partials[0])
    parent[idxs] = lbls
    # roots of merged stars are already component minima; nodes that were
    # only ever roots keep their identity label
    _mark(f"two_level_fold ({len(idxs)} mapped)")

    roots = nodes.take(pa.array(parent, pa.int64()))
    if isinstance(roots, pa.ChunkedArray):
        roots = roots.combine_chunks()

    info = {"strategy": "broadcast", "rounds": 1,
            "converged": True, "n_nodes": n}
    if unique_hashes:
        # the cluster join-back (pipelines/linkage._join_clusters_back)
        # needs exactly (sorted node-hash, verify-hash, root string) — we
        # already hold the hashes and sort order from the edge-conversion
        # index, so publish the ready-made broadcast index instead of
        # letting the consumer re-collect, re-hash and re-sort the whole
        # cluster table on the driver (~40 s at 10^6.5 nodes)
        from .normalize import HASH_SEED_HI
        h2 = _hash64(nodes, HASH_SEED_HI).to_numpy()
        order_pa = pa.array(order, pa.int64())
        roots_sorted = roots.take(order_pa)
        if isinstance(roots_sorted, pa.ChunkedArray):
            roots_sorted = roots_sorted.combine_chunks()
        info["joinback_index_ref"] = ray.put(
            (h_sorted, np.ascontiguousarray(h2[order]), roots_sorted))
    _publish_info(run_info, info)
    tbl = pa.table({"node_id": nodes, "cluster_id": roots})
    import ray.data as rd
    return rd.from_arrow(tbl)
