"""Deduplication operators over a document table (Ray-Data-first).

Five dedup families, each the scale-correct shape (hash-partition shuffles,
capped groups, no driver materialization of the big side):

- :func:`exact_dedup`           md5(text) hash-partition -> per-group first
- :func:`minhash_lsh_pairs`     shingle -> MinHash -> band -> bucket groupby
- :func:`ngram_jaccard_pairs`   LSH candidates verified with exact n-gram
                                Jaccard (texts joined back by id)
- :func:`simhash_pairs`         SimHash bit-bands -> Hamming<=k pairs
- :func:`embedding_cosine_pairs`  near-dup by cosine over list<float>

The reference only has the 1-vs-1 ``compare_addresses`` and an exact memo
cache (``/root/reference/src/core/utils/address_utils.py:131-206``,
``src/core/extractor.py:129-141``); corpus-scale dedup is new surface
required by the training-data-pipeline mandate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
from ray.data.aggregate import Count, Min

from .hashing import (band_keys, estimate_jaccard, exact_jaccard,
                      hamming64, md5_hex, minhash_signature,
                      simhash64, simhash_band_values, word_shingles)


# ---------------------------------------------------------------- exact ----

def add_text_hash(ds, text_col: str = "text", out_col: str = "text_hash"):
    """Append md5 hex of the text column (the dedup shuffle key).

    Hashing before the shuffle means the groupby moves a 32-byte key, not
    full document bodies — the thing that matters at 100 TB.
    """
    def _hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return batch.append_column(
            out_col, pa.array([md5_hex(t or "") for t in texts], pa.string()))
    return ds.map_batches(_hash, batch_format="pyarrow", zero_copy_batch=True)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """-> (text_hash, rep_id, n_dups): one row per distinct text, keeping the
    minimum id as the canonical representative.

    Partial aggregation runs inside the map side of the groupby, so the
    shuffle moves one row per distinct hash per block.
    """
    hashed = add_text_hash(ds, text_col).select_columns(["text_hash", id_col])
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="rep_id"),
        Count(id_col, alias_name="n_dups"),
    )


def _rename(ds, mapping: dict):
    """rename via an Arrow map_batches (Dataset.rename_columns breaks on
    pandas-backed blocks in Ray 2.49)."""
    def _f(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names])
    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def distinct_rows(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep only the representative row per distinct text (inner join of the
    winners table back to the input — the standard dedup materializer)."""
    winners = exact_dedup(ds, text_col, id_col).select_columns(["rep_id"])
    winners = _rename(winners, {"rep_id": id_col})
    return ds.join(winners, join_type="inner", num_partitions=16, on=(id_col,))


# ------------------------------------------------------------- MinHash ----

_SIG_COL = "_sig"


def _add_hash_bucket(key_col: str, num_buckets: int):
    """Shuffle by crc32(key) % num_buckets instead of raw key: a bucket
    holds thousands of groups, amortizing per-group call overhead and
    spreading Zipf-skewed keys uniformly."""
    import zlib

    def _f(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        b = [zlib.crc32(k.encode("utf-8")) % num_buckets for k in keys]
        return batch.append_column("bucket", pa.array(b, pa.int32()))
    return _f


def _minhash_bands_batch(batch: pa.Table, text_col, id_col, num_hashes,
                         bands, shingle_n) -> pa.Table:
    """Task: text -> MinHash signature -> one row per LSH band key.

    Stateless on purpose (the hash family is a module-level cache compiled
    on first use per worker process) so this runs as a plain task pool —
    no actor-pool CPU reservation to starve shuffle aggregators. Emits
    (band_key, id, signature); the signature rides along so bucket
    verification needs no join back to the texts.
    """
    texts = batch[text_col].to_pylist()
    ids = batch[id_col].to_pylist()
    out_key, out_id, out_sig = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(word_shingles(t or "", shingle_n), num_hashes)
        for k in band_keys(sig, bands):
            out_key.append(k)
            out_id.append(ids[i])
            out_sig.append(sig)
    return pa.table({
        "band_key": pa.array(out_key, pa.string()),
        id_col: pa.array(out_id),
        _SIG_COL: pa.array([s.tolist() for s in out_sig],
                           pa.list_(pa.uint64())),
    })


def _banded_bucket_pairs_fn(id_col: str, est_threshold: float, cap: int):
    """Process ALL band groups of one hash bucket in a single call — the
    per-group work is a vectorized (g x g) signature comparison, and the
    call overhead amortizes over thousands of (mostly tiny) buckets."""
    import pandas as pd

    def _pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        df = (df.drop_duplicates(["band_key", id_col])
                .sort_values(["band_key", id_col], kind="mergesort")
                .reset_index(drop=True))
        if len(df) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "est_jaccard": []})
        keys = df["band_key"].to_numpy()
        ids = df[id_col].to_numpy()
        sigs = np.vstack([np.asarray(s, dtype=np.uint64)
                          for s in df[_SIG_COL]])
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(df)]])
        a_out, b_out, est_out = [], [], []
        for s, e in zip(starts, ends):
            g = min(e - s, cap)   # capped: bounds the quadratic worst case
            if g < 2:
                continue
            gs = sigs[s:s + g]                       # (g, H) uint64
            est = (gs[:, None, :] == gs[None, :, :]).mean(axis=2)
            iu, ju = np.triu_indices(g, k=1)
            keepm = est[iu, ju] >= est_threshold
            a_out.append(ids[s + iu[keepm]])
            b_out.append(ids[s + ju[keepm]])
            est_out.append(np.round(est[iu, ju][keepm], 6))
        if not a_out:
            return pd.DataFrame({"a_id": [], "b_id": [], "est_jaccard": []})
        return pd.DataFrame({
            "a_id": np.concatenate(a_out),
            "b_id": np.concatenate(b_out),
            "est_jaccard": np.concatenate(est_out),
        })
    return _pairs


def minhash_lsh_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16,
                      est_threshold: float = 0.5, cap: int = 512):
    """Candidate near-dup pairs: shingle -> MinHash -> band -> groupby bucket
    -> in-bucket signature-estimated Jaccard -> cross-band pair dedup.

    bands=16 x rows=4 over 64 hashes: P[share band] = 1-(1-J^4)^16, ~0.97 at
    J=0.5. The final groupby on (a_id, b_id) dedups pairs found in several
    bands AND rebalances downstream scoring.
    """
    banded = ds.map_batches(
        _minhash_bands_batch,
        fn_kwargs=dict(text_col=text_col, id_col=id_col,
                       num_hashes=num_hashes, bands=bands, shingle_n=3),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=1024)
    bucketed = banded.map_batches(
        _add_hash_bucket("band_key", 64),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = bucketed.groupby("bucket").map_groups(
        _banded_bucket_pairs_fn(id_col, est_threshold, cap),
        batch_format="pandas")
    # cross-band dedup: keep max estimate per pair
    from ray.data.aggregate import Max
    return pairs.groupby(["a_id", "b_id"]).aggregate(
        Max("est_jaccard", alias_name="est_jaccard"))


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.8, shingle_n: int = 3,
                        est_threshold: float = 0.35, bands: int = 32,
                        num_partitions: int = 16):
    """Exact n-gram-Jaccard near-dups: LSH candidates -> join both texts back
    by id -> exact verification -> filter(threshold).

    Two hash joins ship only candidate-pair texts, never the full cross
    product. Default bands=32 x r=2 makes LSH recall effectively exact above
    the verify threshold (P[miss @ J=0.8] ~ 1e-14), so the output equals the
    all-pairs oracle.
    """
    cand = minhash_lsh_pairs(ds, text_col, id_col, bands=bands,
                             est_threshold=est_threshold)
    docs = ds.select_columns([id_col, text_col])
    left = _rename(docs, {id_col: "a_id", text_col: "_a_text"})
    right = _rename(docs, {id_col: "b_id", text_col: "_b_text"})
    j = cand.join(left, join_type="inner", num_partitions=num_partitions,
                  on=("a_id",))
    j = j.join(right, join_type="inner", num_partitions=num_partitions,
               on=("b_id",))

    def _verify(batch: pa.Table) -> pa.Table:
        a = batch["_a_text"].to_pylist()
        b = batch["_b_text"].to_pylist()
        # int/int division: bit-identical to the SQL oracle, no rounding
        jac = [exact_jaccard(x or "", y or "", shingle_n)
               for x, y in zip(a, b)]
        out = batch.select(["a_id", "b_id"]).append_column(
            "jaccard", pa.array(jac, pa.float64()))
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    return j.map_batches(_verify, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------- SimHash ----

def simhash_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, bands: int = 4, cap: int = 1024):
    """Near-dup pairs with Hamming(simhash64) <= max_hamming.

    Band blocking is lossless for max_hamming < bands (pigeonhole): any such
    pair collides on at least one exact 16-bit band, so the groupby only
    ever compares candidates, never the cross product.
    """
    def _fp(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        out_key, out_id, out_fp = [], [], []
        for i, t in enumerate(texts):
            fp = simhash64(t or "")
            for bidx, val in simhash_band_values(fp, bands):
                out_key.append("sh:%d:%04x" % (bidx, val))
                out_id.append(ids[i])
                out_fp.append(fp)
        return pa.table({
            "band_key": pa.array(out_key, pa.string()),
            id_col: pa.array(out_id),
            "_fp": pa.array(out_fp, pa.uint64()),
        })

    import pandas as pd

    def _pairs(df: "pd.DataFrame") -> "pd.DataFrame":
        df = (df.drop_duplicates(["band_key", id_col])
                .sort_values(["band_key", id_col], kind="mergesort")
                .reset_index(drop=True))
        if len(df) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "hamming": []})
        keys = df["band_key"].to_numpy()
        ids = df[id_col].to_numpy()
        fps = df["_fp"].to_numpy().astype(np.uint64)
        change = np.nonzero(keys[1:] != keys[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(df)]])
        a_out, b_out, h_out = [], [], []
        for s, e in zip(starts, ends):
            g = min(e - s, cap)
            if g < 2:
                continue
            gf = fps[s:s + g]
            iu, ju = np.triu_indices(g, k=1)
            x = gf[iu] ^ gf[ju]
            # vectorized popcount over uint64 via byte view
            ham = np.unpackbits(
                x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
            keep = ham <= max_hamming
            a_out.append(ids[s + iu[keep]])
            b_out.append(ids[s + ju[keep]])
            h_out.append(ham[keep].astype(np.int64))
        if not a_out:
            return pd.DataFrame({"a_id": [], "b_id": [], "hamming": []})
        return pd.DataFrame({"a_id": np.concatenate(a_out),
                             "b_id": np.concatenate(b_out),
                             "hamming": np.concatenate(h_out)})

    banded = ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)
    bucketed = banded.map_batches(
        _add_hash_bucket("band_key", 64),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = bucketed.groupby("bucket").map_groups(_pairs,
                                                  batch_format="pandas")
    return pairs.groupby(["a_id", "b_id"]).aggregate(
        Min("hamming", alias_name="hamming"))


# ---------------------------------------------------- embedding cosine ----

def _cosine_pairs_batch(batch: pa.Table, matrix_ref, ids_ref,
                        tau: float) -> pa.Table:
    """Task: batch of vectors x the broadcast full matrix (``ray.put`` once
    on the driver; ``ray.get`` here is a zero-copy plasma read, never a
    re-ship). Emits (a_id, b_id) with a_id < b_id and cosine >= tau.

    This is the correctness/baseline path (one side fits worker memory,
    documented assumption); the scale path for huge N is sign-LSH bucketing
    (see ``similarity.knn_lsh``) feeding the same verifier.
    """
    mat = ray.get(matrix_ref) if isinstance(matrix_ref, ray.ObjectRef) else matrix_ref
    ids = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = (mat / norms).astype(np.float64)
    ids = np.asarray(ids)

    vecs = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in batch["embedding"].to_pylist()])
    bids = np.asarray(batch["vec_id"].to_pylist())
    vnorms = np.linalg.norm(vecs, axis=1, keepdims=True)
    vnorms[vnorms == 0] = 1.0
    sims = (vecs / vnorms) @ mat.T              # (batch, N) float64
    a_out, b_out = [], []
    for r in range(sims.shape[0]):
        mask = (sims[r] >= tau) & (ids > bids[r])
        for other in ids[mask]:
            a_out.append(int(bids[r]))
            b_out.append(int(other))
    return pa.table({"a_id": pa.array(a_out, pa.int64()),
                     "b_id": pa.array(b_out, pa.int64())})


def embedding_cosine_pairs(ds, tau: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           batch_size: int = 512):
    """Near-dup pairs by embedding cosine >= tau (a_id < b_id)."""
    tbl = ds.select_columns([id_col, vec_col])
    # small-side broadcast: one driver-side materialize of (id, vec) only
    full = tbl.to_pandas()
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in full[vec_col]])
    matrix_ref = ray.put(mat)
    ids_ref = ray.put(full[id_col].to_numpy())
    return tbl.map_batches(
        _cosine_pairs_batch,
        fn_kwargs=dict(matrix_ref=matrix_ref, ids_ref=ids_ref, tau=tau),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
