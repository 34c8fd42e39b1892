"""Stage: candidate-pair generation (SHUFFLE 2: hash-bucketed block groupby).

Blocked rows are hashed ``block_key -> bucket`` (crc32 mod num_buckets) and
shuffled by *bucket*, not by raw key: a bucket holds thousands of blocking
groups, so the per-call overhead of group processing is amortized — one
sort + one numpy boundary scan + one output DataFrame per bucket, instead
of a pandas DataFrame per (mostly 2-5 row) group. Buckets also balance the
shuffle: Zipf-skewed keys spread uniformly across buckets.

Skew handling (the Dhaka problem — SURVEY.md §4.2): pair count is quadratic
per block, so a group-size *cap* bounds the worst case. Blocks with
``n <= cap`` emit all C(n,2) pairs; oversized blocks switch to two-level
generation — identical extractions star-connect to their group head
(O(n) pairs, union-find diameter 2), and one representative per distinct
extraction slides a sorted-neighborhood window over the other
representatives to catch fuzzy variants. Every pair emitted from an
oversized block carries ``oversized=1`` in the output, so skew is
observable downstream (``SELECT sum(oversized)`` on the pair table) —
no silent truncation.

A pair reached via several keys (ad/pc/sx/mh overlap heavily) is scored
once per key (vectorized, cheap) and deduped post-score on the 3-column
edge table — see ``linkage.run_linkage`` for the trade-off.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .. import COMPONENT_FIELDS

_L = ["l_" + f for f in COMPONENT_FIELDS]
_R = ["r_" + f for f in COMPONENT_FIELDS]
PAIR_COLUMNS = ["pair_key", "u", "v"] + _L + _R + ["oversized", "same_ext"]


def _group_pair_indices(n: int, offset: int, cap: int, window: int,
                        ext_key: np.ndarray):
    """Pair indices for one block of ``n`` sorted rows starting at
    ``offset``; ``ext_key`` are the rows' extraction-identity keys."""
    if n < 2:
        return None
    if n <= cap:
        li, ri = np.triu_indices(n, k=1)
        return li + offset, ri + offset, False
    uniq, inv = np.unique(ext_key, return_inverse=True)
    first_of = np.full(len(uniq), n, dtype=np.int64)
    np.minimum.at(first_of, inv, np.arange(n))
    star_l = first_of[inv]
    star_mask = star_l != np.arange(n)
    li_parts = [star_l[star_mask]]
    ri_parts = [np.arange(n)[star_mask]]
    reps = np.sort(first_of)
    wl, wr = [], []
    for a in range(len(reps) - 1):
        hi = min(a + 1 + window, len(reps))
        wl.extend([reps[a]] * (hi - a - 1))
        wr.extend(reps[a + 1:hi])
    li_parts.append(np.asarray(wl, dtype=np.int64))
    ri_parts.append(np.asarray(wr, dtype=np.int64))
    li = np.concatenate(li_parts)
    ri = np.concatenate(ri_parts)
    if len(li) == 0:
        return None
    return li + offset, ri + offset, True


def _ext_identity(cols) -> np.ndarray:
    """128-bit extraction-identity key per row as a structured
    ``(u8, u8)`` array: equality-comparable and ``np.unique``-groupable
    like the old concatenated string, at hash speed instead of 9 chained
    ``np.char.add`` passes. Two independent 64-bit row hashes make a
    silent identity collision (which would star-merge two different
    extractions at score 1.0) cryptographically negligible.
    ``cols`` is a polars DataFrame of the (null-filled) component fields."""
    out = np.empty(cols.height, dtype=[("a", "u8"), ("b", "u8")])
    out["a"] = cols.hash_rows(seed=3).to_numpy()
    out["b"] = cols.hash_rows(seed=71).to_numpy()
    return out


def _bucket_arrays(tbl: pa.Table):
    """One bucket group (``pa.Table``) -> (bk, node, comp, ext) numpy
    columns after Arrow-native dedupe + stable sort — polars kernels over
    the Arrow buffers, no pandas hop per bucket (VERDICT r2 #9).

    Sort order for the oversized-block neighborhood window: ROAD first —
    within an area block, road is the per-entity discriminator, so one
    entity's surface variants (whose house strings can differ wildly,
    e.g. "Kha-1985/A" vs "1985/A") stay adjacent and the window finds
    them."""
    import polars as pl
    df = (pl.from_arrow(tbl)
            .unique(subset=["block_key", "node_id"], keep="first",
                    maintain_order=True)
            .sort(["block_key", "road", "house_number", "node_id"],
                  nulls_last=True, maintain_order=True))
    bk = df["block_key"].to_numpy()
    node = df["node_id"].to_numpy()
    comps = df.select(COMPONENT_FIELDS).fill_null("")
    comp = {f: comps[f].to_numpy() for f in COMPONENT_FIELDS}
    ext = _ext_identity(comps)
    return bk, node, comp, ext


def _pairs_from_bucket(df: pd.DataFrame, cap: int, window: int,
                       with_pair_key: bool = True) -> pd.DataFrame:
    """Pandas adapter over :func:`_pairs_core` (unit tests / direct use —
    the dataset path goes through ``_bucket_arrays`` + ``_pairs_core``
    without touching pandas)."""
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out = _pairs_core(*_bucket_arrays(tbl), cap=cap, window=window,
                      with_pair_key=with_pair_key)
    if out is None:
        cols = PAIR_COLUMNS if with_pair_key else PAIR_COLUMNS[1:]
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(out)


def _pairs_core(bk, node, comp, ext, cap: int, window: int,
                with_pair_key: bool = True):
    """Sorted bucket columns -> dict of numpy pair columns (or ``None``
    when the bucket yields no pairs).

    ``with_pair_key=False`` (the fused-scoring path) skips building the
    ``pair_key`` string column — two ``np.char.add`` passes over every
    generated pair that the fused path never reads."""
    if len(bk) < 2:
        return None

    change = np.nonzero(bk[1:] != bk[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(bk)]])

    li_all, ri_all, ov_all = [], [], []
    for s, e in zip(starts, ends):
        res = _group_pair_indices(e - s, s, cap, window, ext[s:e])
        if res is not None:
            li_all.append(res[0])
            ri_all.append(res[1])
            ov_all.append(np.full(len(res[0]), int(res[2]), dtype=np.int32))
    if not li_all:
        return None
    li = np.concatenate(li_all)
    ri = np.concatenate(ri_all)
    ov = np.concatenate(ov_all)

    u = node[li]
    v = node[ri]
    # canonical orientation u < v so the same pair dedups across blocks
    swap = u > v
    u2 = np.where(swap, v, u)
    v2 = np.where(swap, u, v)
    out = {"u": u2, "v": v2}
    if with_pair_key:
        out = {"pair_key": np.char.add(np.char.add(u2.astype(str), "||"),
                                       v2.astype(str)), **out}
    for f in COMPONENT_FIELDS:
        lv = comp[f][li]
        rv = comp[f][ri]
        out["l_" + f] = np.where(swap, rv, lv)
        out["r_" + f] = np.where(swap, lv, rv)
    out["oversized"] = ov
    # identical-extraction pairs (all two-level star pairs and the
    # duplicate-heavy slice of all-pairs blocks) score 1.0 by construction
    # — the fused scorer skips them entirely
    out["same_ext"] = ext[li] == ext[ri]
    return out


def _pairs_from_group(df: pd.DataFrame, cap: int, window: int) -> pd.DataFrame:
    """Single-block variant (kept for unit tests / direct use)."""
    df = df.copy()
    if "block_key" not in df.columns:
        df["block_key"] = "_"
    return _pairs_from_bucket(df, cap, window)


_SALT_SAMPLE_MOD = 8    # deterministic 1/8 row sample for hot-key counting


def _hash_exchange(block_refs, P: int, fn, kwargs: dict,
                   key_col: str = "block_key"):
    """Two-stage hash co-location over raw Ray tasks: split every block
    into ``P`` partitions by ``hash(key_col) % P``, then one reduce task
    per partition concatenates its pieces and applies ``fn(table,
    **kwargs)``. Returns the list of P reduce ObjectRefs.

    This replaces ``groupby(bucket).map_groups`` for stages whose group fn
    subdivides by key internally and needs only co-location (NOT global
    sort order): the Dataset sort-based all-to-all spends most of its wall
    in scheduling/merge latency (B_in x B_out block fragments), measured
    20s vs ~6s for this exchange on the 860 MB / 4.8M-turn pairs shuffle at
    32 cpus. Partitioning assumptions: every row of one key lands in one
    partition (deterministic hash); a partition (~rows/P plus Zipf heads,
    bounded upstream by salting) must fit a worker's heap; P scales with
    cluster cores."""
    import ray

    @ray.remote(num_cpus=1)
    def _split(block: pa.Table, n_parts: int):
        import polars as pl_
        if n_parts == 1:       # num_returns=1 would ship the 1-tuple as
            return block       # ONE object; return the bare table instead
        h = pl_.from_arrow(block[key_col]).hash(seed=11) \
            .to_numpy().astype(np.uint64)
        part = (h % np.uint64(n_parts)).astype(np.int64)
        order = np.argsort(part, kind="stable")
        tbl = block.take(pa.array(order))
        bounds = np.searchsorted(part[order], np.arange(n_parts + 1))
        return tuple(
            tbl.slice(bounds[p], bounds[p + 1] - bounds[p])
            for p in range(n_parts))

    @ray.remote(num_cpus=1)
    def _reduce(fn, kwargs, *pieces):
        parts = [p for p in pieces if p.num_rows]
        if not parts:
            return fn(pieces[0], **kwargs)     # empty -> typed empty table
        return fn(pa.concat_tables(parts, promote_options="default"),
                  **kwargs)

    split_refs = [_split.options(num_returns=P).remote(ref, P)
                  for ref in block_refs]
    if P == 1:                                 # num_returns=1 returns bare
        split_refs = [[r] for r in split_refs]
    return [
        _reduce.remote(fn, kwargs,
                       *[split_refs[b][p] for b in range(len(split_refs))])
        for p in range(P)]


def _count_hot(tbl: pa.Table, thresh: int) -> pa.Table:
    """Reduce fn for the salt-decision exchange: (block_key, count) rows
    for this partition's keys with sampled count > thresh."""
    import polars as pl_
    out = (pl_.from_arrow(tbl.select(["block_key"]))
           .group_by("block_key").len()
           .filter(pl_.col("len") > thresh))
    return out.to_arrow()


def _salt_hot_blocks(ds, hot_block_rows: int, salt_target: int,
                     stats: dict = None):
    """Zipf-head defense: one blocking key whose block outgrows a single
    task (the Dhaka problem) would make the whole stage wait on one CPU.
    A cheap count pass finds keys with > ``hot_block_rows`` rows; their
    rows get a deterministic salt appended — ``hash(road) % S`` with
    ``S = ceil(rows / salt_target)`` — so the mega-block splits into
    bounded sub-blocks that spread across every bucket/task. Sharding by
    ROAD is connectivity-preserving: within an area block, road is the
    per-entity discriminator, so all of one entity's mention variants land
    in the same shard and same-entity pair recall is unchanged; only
    cross-entity pairs (unwanted) lose cross-shard candidates.

    The count pass runs on a DETERMINISTIC 1/8 row sample (node-hash
    modulus): a hot key by definition has thousands of rows, so its
    sampled count concentrates tightly (±2% at 20k rows) and the
    salting decision/shard count are insensitive to the residual error —
    while the count shuffle moves 8x fewer rows. Sampling by node hash
    (not per key) keeps every key's sample unbiased."""
    import polars as pl_
    import pyarrow.compute as pc_

    thresh = max(1, hot_block_rows // _SALT_SAMPLE_MOD)

    def _sample(batch: pa.Table) -> pa.Table:
        h = pl_.from_arrow(batch["node_id"]).hash(seed=13).to_arrow()
        keep = pc_.equal(
            pc_.bit_wise_and(pc_.cast(h, pa.uint64()),
                             pa.scalar(_SALT_SAMPLE_MOD - 1, pa.uint64())),
            pa.scalar(0, pa.uint64()))
        return batch.select(["block_key"]).filter(keep)

    import ray
    sample_refs = (ds.select_columns(["block_key", "node_id"])
                   .map_batches(_sample, batch_format="pyarrow",
                                zero_copy_batch=True)
                   .to_arrow_refs())
    hot = {}
    if sample_refs:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        count_refs = _hash_exchange(sample_refs, max(4, cpus // 2),
                                    _count_hot, {"thresh": thresh})
        for b in ray.get(count_refs):
            for k, n in zip(b["block_key"].to_pylist(),
                            b["len"].to_pylist()):
                est = n * _SALT_SAMPLE_MOD
                hot[k] = int(-(-est // salt_target))    # ceil
    if stats is not None:
        stats["salted_hot_keys"] = len(hot)
        stats["salt_shards"] = int(sum(hot.values()))
    if not hot:
        return ds
    import pandas as pd_
    hot_keys = sorted(hot)
    hot_index = pd_.Index(hot_keys)
    shards = np.asarray([hot[k] for k in hot_keys], dtype=np.uint64)

    def _salt(batch: pa.Table) -> pa.Table:
        keys = batch["block_key"].to_numpy(zero_copy_only=False)
        pos = hot_index.get_indexer(keys)
        m = pos >= 0
        if not m.any():
            return batch
        import polars as pl
        road_h = pl.from_arrow(batch["road"]).hash(seed=7) \
            .to_arrow().to_numpy(zero_copy_only=False).astype(np.uint64)
        s = shards[pos.clip(min=0)]
        salt = (road_h % np.maximum(s, 1)).astype(np.int64)
        new_keys = keys.copy()
        new_keys[m] = np.char.add(
            np.char.add(keys[m].astype(str), "#"),
            salt[m].astype(str))
        i = batch.schema.get_field_index("block_key")
        return batch.set_column(i, "block_key",
                                pa.array(new_keys, pa.string()))

    return ds.map_batches(_salt, batch_format="pyarrow",
                          zero_copy_batch=True)


def _pairs_table(out: dict, with_pair_key: bool) -> pa.Table:
    cols = PAIR_COLUMNS if with_pair_key else PAIR_COLUMNS[1:]
    if out is None:
        return pa.table({c: pa.array(
            [], pa.int32() if c == "oversized"
            else pa.bool_() if c == "same_ext" else pa.string())
            for c in cols})
    return pa.table({c: pa.array(
        out[c], pa.int32() if c == "oversized"
        else pa.bool_() if c == "same_ext" else pa.string())
        for c in cols})


_EDGE_EMPTY = pa.table({"u": pa.array([], pa.string()),
                        "v": pa.array([], pa.string()),
                        "score": pa.array([], pa.float64()),
                        "oversized": pa.array([], pa.int32())})


def _gen_pairs(tbl: pa.Table, cap: int, window: int) -> pa.Table:
    """One co-located partition (any number of whole block_key groups) ->
    wide candidate-pair table."""
    out = _pairs_core(*_bucket_arrays(tbl), cap=cap, window=window)
    return _pairs_table(out, with_pair_key=True)


def _gen_scored(tbl: pa.Table, cap: int, window: int,
                score_threshold: float) -> pa.Table:
    """One co-located partition -> slim matched-edge table (fused scoring:
    identical-extraction pairs score 1.0 by construction; only the fuzzy
    residual runs the ensemble)."""
    from .scoring import _score_batch
    out = _pairs_core(*_bucket_arrays(tbl), cap=cap, window=window,
                      with_pair_key=False)
    if out is None:
        return _EDGE_EMPTY
    same = out["same_ext"]
    u, v, ov = out["u"], out["v"], out["oversized"]
    us = [u[same]]
    vs = [v[same]]
    ss = [np.ones(int(same.sum()))]
    os_ = [ov[same]]
    if (~same).any():
        # the fuzzy ensemble is pandas/numpy-based; build the (much
        # smaller) non-identical pair slice as a frame only here
        rest = pd.DataFrame({k: a[~same] for k, a in out.items()
                             if k != "same_ext"})
        scored = _score_batch(rest, score_threshold)
        keep = scored["match"].to_numpy()
        us.append(rest["u"].to_numpy()[keep])
        vs.append(rest["v"].to_numpy()[keep])
        ss.append(scored["score"].to_numpy()[keep].astype(np.float64))
        os_.append(rest["oversized"].to_numpy()[keep])
    return pa.table({
        "u": pa.array(np.concatenate(us), pa.string()),
        "v": pa.array(np.concatenate(vs), pa.string()),
        "score": pa.array(np.concatenate(ss), pa.float64()),
        "oversized": pa.array(np.concatenate(os_), pa.int32())})


def candidate_pairs_stage(ds, cap: int = 64, window: int = 8,
                          num_partitions: int = None,
                          score_threshold: float = None,
                          hot_block_rows: int = 20_000,
                          salt_target: int = 8_000,
                          stats: dict = None):
    """blocked rows -> candidate-pair table (NOT deduped across keys).

    With ``score_threshold`` set, the ensemble scorer runs INSIDE the
    partition function and only matched edges (u, v, score, oversized)
    leave the task — the wide 18-column pair table never materializes,
    which at corpus scale removes a full mention-scale object-store pass
    between pair generation and scoring. Identical-extraction pairs skip
    scoring entirely (score 1.0 by construction). Blocks larger than
    ``hot_block_rows`` are salted into ~``salt_target``-row shards first
    (see :func:`_salt_hot_blocks`).

    The key-hash co-location is a MANUAL two-stage exchange over raw Ray
    tasks (split each block into P hash partitions -> one reduce task per
    partition concatenates its pieces and runs the partition fn), not
    ``groupby(bucket).map_groups``: the Dataset sort-based all-to-all
    measured 20s of mostly scheduling/merge latency for this 860 MB
    mention-scale shuffle at 4.8M turns / 32 cpus, vs ~6s for the direct
    exchange — and hash co-location (NOT global sort order) is all the
    partition fn needs, since it subdivides by ``block_key`` internally
    (``_pairs_core``'s boundary scan). Partitioning assumptions, which
    mirror the sort path's: every row of one block_key lands in one
    partition (hash deterministic); a partition (~rows/P plus Zipf heads,
    which salting bounds) must fit a worker's heap; P should scale with
    cluster cores (default 2x CPUs for straggler smoothing)."""
    import ray
    import ray.data as rd

    ds = _salt_hot_blocks(ds, hot_block_rows, salt_target, stats=stats)

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        num_partitions = 2 * cpus              # 2x for straggler smoothing
    P = int(num_partitions)

    gen_kwargs = {"cap": cap, "window": window}
    gen_fn = _gen_pairs if score_threshold is None else _gen_scored
    if score_threshold is not None:
        gen_kwargs["score_threshold"] = score_threshold

    block_refs = ds.to_arrow_refs()            # executes (or reuses) lineage
    if not block_refs:
        return rd.from_arrow(_EDGE_EMPTY if score_threshold is not None
                             else _pairs_table(None, with_pair_key=True))
    return rd.from_arrow_refs(
        _hash_exchange(block_refs, P, gen_fn, gen_kwargs))
