"""The flagship pipeline: transcripts -> entity clusters (SURVEY.md §3.4).

    read_parquet(transcripts)
     -> normalize (stateless, zero-copy Arrow)
     -> exact dedup on norm_text + extract-once + join back     [SHUFFLE 1]
     -> blocking keys (batch explode; filler rows emit nothing)
     -> groupby(block_key) pair generation, cap + window,
        ensemble scoring FUSED in the group fn -> edge table    [SHUFFLE 2]
     -> iterative min-label propagation to fixed point          [SHUFFLE 3..k]
     -> left-join cluster ids back to turns (singletons label themselves)

Every wide step is keyed (norm_text / block_key / node_id) and
each expensive phase is checkpointable via CheckpointManager. Nothing here
materializes the turn table on the driver OR in the object store: the one
turn-scale intermediate (the extracted table, consumed by two branches)
always goes to partitioned Parquet — the checkpoint dir when configured,
else a run-scoped spill dir — and streams back from disk. Object-store pins
are mention-scale only (pairs / edges / labels).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from .. import COMPONENT_FIELDS
from ..stages.normalize import normalize_stage
from ..stages.extract import dedup_extract_stage, extract_stage
from ..stages.blocking import blocking_stage
from ..stages.pairs import candidate_pairs_stage
from ..stages.unionfind import connected_components
from ..state.checkpoint import CheckpointManager, fingerprint


@dataclass
class LinkageConfig:
    # physical knobs; None = derive from the live cluster size at run time
    # (at multi-node scale: num_partitions ~ 2x total cores, concurrency ~
    # cores/4 so extraction actors, shuffle aggregators and map tasks all
    # get CPU without starving each other)
    extract_concurrency: Optional[int] = None
    extract_batch_size: int = 1024
    num_partitions: Optional[int] = None
    block_cap: int = 64          # all-pairs blocks up to C(cap,2) pairs
    block_window: int = 8        # sorted-neighborhood window beyond the cap
    score_threshold: float = 0.85
    max_uf_rounds: int = 16
    # cluster-table row limit below which the final join-back is a
    # broadcast map-side join instead of a hash shuffle (the broadcast is
    # two uint64 vectors + the cluster-id strings: ~40 B/row)
    join_broadcast_limit: int = 8_000_000
    dedup_exact: object = "local"     # "local" | "shuffle" | True | False
    checkpoint_dir: Optional[str] = None
    thresholds: Optional[dict] = None
    stages: Optional[dict] = None
    # optional labels parquet (area, district, division, postal_code):
    # builds the stage-6 gazetteer dim from data (reference `data_path`
    # surface) instead of the module fixture
    gazetteer_labels_path: Optional[str] = None

    def resolved(self) -> "LinkageConfig":
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        out = LinkageConfig(**asdict(self))
        if out.extract_concurrency is None:
            out.extract_concurrency = max(2, cpus // 2)
        if out.num_partitions is None:
            out.num_partitions = max(4, min(cpus, 32))
        return out


def _lookup_dual_hash(h_sorted, h2_sorted, nh, nh2, has_dup: bool):
    """Positions + hit mask of (nh, nh2) in an index lexsorted by (h, h2).

    searchsorted finds the LEFTMOST entry of an h run; when the index holds
    duplicate lo-hashes (64-bit collision between two node_ids) the scan
    walks each run until the verify hash matches — without it the second
    colliding node's rows would silently miss and be labeled singletons."""
    import numpy as np
    n_idx = len(h_sorted)
    pos_c = np.minimum(np.searchsorted(h_sorted, nh), n_idx - 1)
    hit = (h_sorted[pos_c] == nh) & (h2_sorted[pos_c] == nh2)
    if has_dup:
        scan = pos_c.copy()
        cand = (~hit) & (h_sorted[scan] == nh) & (scan + 1 < n_idx)
        while cand.any():   # bounded by the longest collision run
            scan = scan + cand.astype(scan.dtype)
            ok = cand & (h_sorted[scan] == nh)
            found = ok & (h2_sorted[scan] == nh2)
            pos_c = np.where(found, scan, pos_c)
            hit |= found
            cand = ok & ~found & (scan + 1 < n_idx)
    return pos_c, hit


def _join_clusters_back(extracted, clusters, cfg, broadcast_limit: int,
                        precomputed_ref=None, n_clusters=None):
    """Label every turn with its cluster_id; unlabeled turns (no edges) are
    singletons labeled with their own node_id. Broadcast map-side join when
    the cluster table is small, hash-shuffle join otherwise.

    The broadcast side is (sorted uint64 node-hash, aligned verify-hash,
    aligned Arrow cluster-id strings) — numpy/Arrow buffers deserialize
    ZERO-COPY from plasma in every task. A pd.Index of object strings here
    instead costs seconds of unpickling + hashtable build PER TASK, which
    measured ~300s over a 4.8M-turn consume. Lookups are
    np.searchsorted + both-hash verification (the 128-bit key carried since
    normalize), so a collision cannot silently mislabel a turn.

    ``precomputed_ref``: the broadcast union-find already builds exactly
    this index (sorted hash, verify hash, roots) as a byproduct of its
    edge conversion; when provided (with ``n_clusters``), the driver-serial
    collect + hash + sort of the cluster table here is skipped entirely."""
    import ray

    n_c = n_clusters if n_clusters is not None else clusters.count()
    if n_c <= broadcast_limit:
        import numpy as np
        from ..stages.normalize import _hash64, HASH_SEED_LO, HASH_SEED_HI

        has_dup = False
        if precomputed_ref is not None:
            # built by unionfind._broadcast_components, which only publishes
            # it after verifying the node universe has UNIQUE lo-hashes
            idx_ref = precomputed_ref
        elif n_c == 0:
            idx_ref = None
        else:
            tbl = pa.concat_tables(
                [b for b in clusters.iter_batches(batch_format="pyarrow")],
                promote_options="default")
            h = _hash64(tbl["node_id"], HASH_SEED_LO).to_numpy()
            h2 = _hash64(tbl["node_id"], HASH_SEED_HI).to_numpy()
            # lexsort (h, then h2): on a 64-bit lo-hash collision between
            # two node_ids, searchsorted alone finds only the leftmost run
            # entry — the duplicate-run scan in _attach needs the run
            # ordered by h2 to probe every colliding entry (mirrors the
            # collision handling in unionfind._broadcast_components).
            order = np.lexsort((h2, h))
            has_dup = bool(len(h) > 1
                           and (np.diff(h[order]) == 0).any())
            idx_ref = ray.put((
                np.ascontiguousarray(h[order]),
                np.ascontiguousarray(h2[order]),
                tbl["cluster_id"].combine_chunks().take(
                    pa.array(order, pa.int64())),
            ))

        def _attach(batch: pa.Table) -> pa.Table:
            node_col = batch["node_id"]
            if isinstance(node_col, pa.ChunkedArray):
                node_col = node_col.combine_chunks()
            if idx_ref is None:
                return batch.append_column("cluster_id", node_col)
            h_sorted, h2_sorted, roots = ray.get(idx_ref)
            nh = batch["node_h"].to_numpy()
            nh2 = batch["node_h2"].to_numpy()
            pos_c, hit = _lookup_dual_hash(h_sorted, h2_sorted, nh, nh2,
                                           has_dup)
            taken = roots.take(pa.array(pos_c, pa.int64()))
            lab = pc.if_else(pa.array(hit), taken, node_col)
            if isinstance(lab, pa.ChunkedArray):
                lab = lab.combine_chunks()
            return batch.append_column("cluster_id", lab)

        return extracted.map_batches(_attach, batch_format="pyarrow",
                                     zero_copy_batch=True)

    def _add_node_h(batch: pa.Table) -> pa.Table:
        from ..stages.normalize import _hash64, HASH_SEED_LO, HASH_SEED_HI
        return (batch
                .append_column("node_h",
                               _hash64(batch["node_id"], HASH_SEED_LO))
                .append_column("node_h2",
                               _hash64(batch["node_id"], HASH_SEED_HI)))

    clusters_h = clusters.map_batches(
        _add_node_h, batch_format="pyarrow", zero_copy_batch=True
    ).drop_columns(["node_id"])

    return extracted.join(
        clusters_h, join_type="left_outer",
        num_partitions=cfg.num_partitions, on=("node_h", "node_h2"),
    ).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("cluster_id"), "cluster_id",
            pc.fill_null(b["cluster_id"], b["node_id"])),
        batch_format="pyarrow",
    )


def _has_any_component(batch: pa.Table) -> pa.Table:
    mask = None
    for f in COMPONENT_FIELDS:
        m = pc.greater(pc.utf8_length(pc.fill_null(batch[f], "")), 0)
        mask = m if mask is None else pc.or_(mask, m)
    return batch.filter(mask)


def run_linkage(transcripts, cfg: LinkageConfig = LinkageConfig(),
                input_token: str = "inline"):
    """transcripts: ray.data.Dataset with the (conv_id, turn_idx, role, text,
    tool, ts) schema. Returns {"turns": Dataset with cluster_id per turn,
    "edges": Dataset, "metrics": dict}.
    """
    import time as _time

    from ..stages.normalize import hash_probe
    # pre-resolve cfg: stable across cluster sizes. hash_probe() invalidates
    # checkpoints whose persisted text_h/node_h came from a different
    # polars hash function (see normalize.hash_probe).
    cfg_fp = fingerprint(asdict(cfg), input_token, hash_probe())
    cfg = cfg.resolved()
    ckpt = CheckpointManager(cfg.checkpoint_dir)
    metrics: dict = {}
    _t0 = _time.perf_counter()

    def _phase_done(name: str, rows=None):
        nonlocal _t0
        now = _time.perf_counter()
        metrics[name] = {"wall_s": round(now - _t0, 3)}
        if rows is not None:
            metrics[name]["rows_out"] = int(rows)
        _t0 = now

    # ---- phase 1: normalize + extract.
    # dedup_exact="shuffle": global distinct on text_h + extract-once +
    #   join back (SHUFFLE 1) — pays when extraction cost x duplication
    #   factor exceeds a turn-scale shuffle+join (expensive kernels, heavy
    #   duplication).
    # dedup_exact="local" (default): extract per turn through an
    #   actor-local memo — with this kernel (~0.3 ms/string) the shuffle
    #   and join back cost more than re-extracting the misses.
    gaz_frozen = None
    if cfg.gazetteer_labels_path:
        import ray as _ray
        from ..functions.gazetteer_build import build_gazetteer
        from ..kernel.gazetteer import freeze_gazetteer
        gaz_frozen = freeze_gazetteer(build_gazetteer(
            _ray.data.read_parquet(cfg.gazetteer_labels_path)))

    def compute_extracted():
        ds = normalize_stage(transcripts)
        if cfg.dedup_exact == "shuffle" or cfg.dedup_exact is True:
            return dedup_extract_stage(
                ds, concurrency=cfg.extract_concurrency,
                batch_size=cfg.extract_batch_size,
                num_partitions=cfg.num_partitions,
                thresholds=cfg.thresholds, stages=cfg.stages,
                gazetteer_frozen=gaz_frozen)
        return extract_stage(
            ds, concurrency=cfg.extract_concurrency,
            batch_size=cfg.extract_batch_size,
            thresholds=cfg.thresholds, stages=cfg.stages,
            gazetteer_frozen=gaz_frozen)

    # The extraction table is consumed by TWO branches (pair generation and
    # the final cluster join-back); pin it ONCE so the lineage doesn't
    # execute twice — but never in the object store: this is the only
    # TURN-SCALE intermediate, so it goes to partitioned Parquet (the
    # explicit checkpoint_dir when given, else a run-scoped spill dir) and
    # both consumers stream it back from disk. The object store then only
    # ever pins mention-scale tables (blocked keys / pairs / edges /
    # labels), which is what makes the 10^12-turn design point feasible.
    if cfg.checkpoint_dir:
        extracted = ckpt.run("01_extracted", cfg_fp, compute_extracted)
        m = ckpt.manifest("01_extracted")
        _phase_done("extract", m.get("rows") if m else None)
    else:
        import atexit
        import shutil
        import tempfile
        spill_dir = tempfile.mkdtemp(prefix="abap_extract_spill_")
        # the spill is corpus-scale and consumed lazily by the returned
        # datasets, so it can't be removed here — reclaim it at interpreter
        # exit instead of leaking one dir per run_linkage call
        atexit.register(shutil.rmtree, spill_dir, ignore_errors=True)
        compute_extracted().write_parquet(spill_dir)
        import pyarrow.dataset as _pads
        n_extracted = _pads.dataset(spill_dir).count_rows()  # metadata only
        extracted = __import__("ray").data.read_parquet(spill_dir)
        _phase_done("extract", n_extracted)

    # ---- phase 2-3: blocking + candidate pairs + FUSED scoring -> edges
    # (SHUFFLE 2). The ensemble scorer runs inside the bucket group fn, so
    # only matched edges leave the shuffle — the wide candidate-pair table
    # never exists as a dataset. Each phase below is pinned (parquet
    # checkpoint or object-store materialize): beyond resumability, this
    # is a measured 6x wall-clock win — Ray 2.49's streaming executor
    # serializes chained sort-based AllToAll operators badly when planned
    # as one lazy topology. All pinned tables are mention-scale.
    # A pair generated by several blocking keys yields duplicate edges;
    # union-find is invariant to multi-edges, so no dedup shuffle here —
    # the groupby it would need (string (u,v) sort) measured more expensive
    # than carrying ~3x edges through the (streaming, map-only) UF rounds.
    _skew_stats: dict = {}

    def compute_edges():
        entity_rows = extracted.map_batches(
            _has_any_component, batch_format="pyarrow", zero_copy_batch=True)
        # coalesce to ~one fat block per partition slot before the bucket
        # groupby: the sort-based all-to-all moves B_in x B_out block
        # fragments, and 200 read-sized blocks make 40k tiny objects whose
        # scheduling latency dominates the shuffle (measured 23s -> 19s at
        # 4.8M turns / 32 cpus with 32 fat blocks)
        blocked = blocking_stage(entity_rows) \
            .repartition(cfg.num_partitions).materialize()
        return candidate_pairs_stage(
            blocked, cap=cfg.block_cap, window=cfg.block_window,
            score_threshold=cfg.score_threshold, stats=_skew_stats)

    # edge table is small (matched pairs only) and consumed iteratively by
    # union-find: pin it so rounds never re-run extraction/scoring
    edges = (ckpt.run("02_edges", cfg_fp, compute_edges)
             if cfg.checkpoint_dir else compute_edges().materialize())
    _phase_done("edges", edges.count())
    # skew observability: how many edges came from over-cap blocks (window
    # degradation) and how many Zipf-hot blocking keys were salted — at
    # 100-TB scale these are the first numbers to check when recall or a
    # straggler stage looks off (both 0 on an unskewed corpus)
    metrics["edges"]["oversized_edges"] = int(
        edges.sum("oversized") or 0) if "oversized" in edges.columns() else 0
    metrics["edges"]["salted_hot_keys"] = int(
        _skew_stats.get("salted_hot_keys", 0))
    metrics["edges"]["salt_shards"] = int(_skew_stats.get("salt_shards", 0))

    # ---- phase 4: transitive closure (SHUFFLE 3..k).
    # run info (strategy, rounds, joinback index ref) flows through a
    # PER-RUN dict — never the module global, which concurrent pipelines
    # in one driver would cross-wire (stays empty on checkpoint restore).
    _uf_info: dict = {}

    def compute_clusters():
        return connected_components(
            edges, num_partitions=cfg.num_partitions,
            max_rounds=cfg.max_uf_rounds, run_info=_uf_info)

    clusters = (ckpt.run("04_clusters", cfg_fp, compute_clusters)
                if cfg.checkpoint_dir else compute_clusters())
    _phase_done("unionfind", None)
    metrics["unionfind"].update(
        {k: v for k, v in _uf_info.items() if k != "joinback_index_ref"})

    # ---- phase 5: label every turn; nodes outside any edge are singletons.
    # The cluster table is mention-scale; when it fits a worker's heap the
    # join-back is a BROADCAST map-side join (ray.put the node->cluster
    # index once, vectorized get_indexer per batch, ZERO shuffle — the
    # turn table streams straight through). Above the limit it falls back
    # to the hash-shuffle join on the 128-bit node hash (16-byte key,
    # collision-safe at the 10^12-turn design point).
    turns = _join_clusters_back(
        extracted, clusters, cfg,
        broadcast_limit=cfg.join_broadcast_limit,
        precomputed_ref=_uf_info.get("joinback_index_ref"),
        n_clusters=_uf_info.get("n_nodes"))

    # the join-back is lazy (streams when the caller consumes `turns`), so
    # its wall time belongs to the consumer; record the plan boundary only
    metrics["join_back"] = {"lazy": True,
                            "num_partitions": cfg.num_partitions}
    return {"turns": turns, "edges": edges, "clusters": clusters,
            "metrics": metrics}
