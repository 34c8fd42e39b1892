"""Deterministic hash primitives shared by the dedup/similarity operators.

No Ray imports — this module is pure numpy/stdlib so the same code is both
the distributed UDF body and the single-process test oracle. Every hash is
stable across processes and machines (no ``hash()``, no seeds from the
clock), which the resume/byte-identity guarantees depend on.

MinHash uses the standard universal-hash family ``(a*h + b) mod 2^64`` over
crc32 shingle hashes; SimHash is the classic Charikar bit-vote over
md5-low64 token hashes (== DuckDB ``md5_number_lower``, which is what
makes its pair join SQL-oracled); winnowing grams are an FNV64 Horner
rolling hash over UTF-8 bytes so the batch kernel vectorizes over the
Arrow values buffer. Everything is numpy inside the per-document loop
(the per-batch loop over documents is unavoidable for variable-length
token lists; all per-shingle work is numpy).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np

_U64 = np.uint64


def md5_hex(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def stable_u64(data: bytes) -> int:
    """64-bit stable hash (blake2b/8); used for band-key compaction."""
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def md5_low64(data: bytes) -> int:
    """Low 8 bytes of md5, little-endian.

    Chosen as the simhash token-hash basis because it is exactly DuckDB's
    ``md5_number_lower`` — which makes the whole simhash fingerprint (and
    therefore the Hamming pair join) SQL-expressible for the oracle gate.
    """
    return int.from_bytes(hashlib.md5(data).digest()[8:], "little")


def word_shingles(text: str, n: int = 3) -> list:
    """Word n-gram shingles of a lowercased, whitespace-split document."""
    toks = text.lower().split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def shingle_hash_array(shingles) -> np.ndarray:
    """crc32 of each shingle -> uint64 array (deterministic)."""
    return np.array([zlib.crc32(s.encode("utf-8")) for s in shingles],
                    dtype=_U64)


def _minhash_params(num_hashes: int):
    # fixed-seed params so every process derives the identical family
    rng = np.random.RandomState(0x5EED)
    a = rng.randint(1, 2**62, size=num_hashes).astype(_U64) | _U64(1)  # odd
    b = rng.randint(0, 2**62, size=num_hashes).astype(_U64)
    return a, b


_MH_CACHE: dict = {}


def minhash_signature(shingles, num_hashes: int = 64) -> np.ndarray:
    """MinHash signature (uint64[num_hashes]) of a shingle set."""
    if num_hashes not in _MH_CACHE:
        _MH_CACHE[num_hashes] = _minhash_params(num_hashes)
    a, b = _MH_CACHE[num_hashes]
    h = shingle_hash_array(shingles)
    if h.size == 0:
        return np.full(num_hashes, np.iinfo(np.uint64).max, dtype=_U64)
    with np.errstate(over="ignore"):
        # (a*h + b) mod 2^64 via uint64 wraparound — universal enough for LSH
        m = a[:, None] * h[None, :] + b[:, None]
    return m.min(axis=1)


_MIX_P = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F),
          np.uint64(0x165667B19E3779F9), np.uint64(0x27D4EB2F165667C5))


def _mix_consts(n: int) -> tuple:
    """Per-position odd multipliers for n-gram hash combination. The first
    four are the fixed public constants (hash stability for the default
    n <= 4); wider shingles extend deterministically via mix64 of the
    position — ``word_shingles`` accepted any n, so this path must too."""
    if n <= len(_MIX_P):
        return _MIX_P[:n]
    extra = tuple(
        np.uint64(int(mix64(np.uint64(j))) | 1)
        for j in range(len(_MIX_P), n))
    return _MIX_P + extra


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized over uint64 (public constant-set
    mixer; avalanche-quality keys from structured inputs)."""
    x = np.asarray(x, np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def token_ngram_hashes(th: np.ndarray, offsets: np.ndarray, n: int = 3):
    """Word-n-gram shingle hashes from PRE-HASHED tokens — no shingle
    strings are ever built (the vectorized twin of ``word_shingles`` +
    ``shingle_hash_array``).

    ``th`` is the flat uint64 token-hash array of a batch, ``offsets`` the
    per-document [start, end) bounds into it. A document's shingle hash at
    position p is ``mix64(sum_j th[p+j] * P_j)``; documents with
    0 < m < n tokens yield ONE hash over their m tokens (mirroring
    ``word_shingles``'s single joined shingle), empty documents yield none.
    Distinct-hash counts equal distinct-shingle-string counts up to 2^-64
    collisions (tokens cannot contain the join separator, so the
    triple -> string map is injective).

    Returns (values, out_offsets): flat uint64 hashes + per-doc bounds.
    """
    offsets = np.asarray(offsets, np.int64)
    th = np.asarray(th, np.uint64)
    lens = np.diff(offsets)
    out_lens = np.where(lens == 0, 0, np.maximum(lens - (n - 1), 1))
    out_offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(out_lens, out=out_offs[1:])
    total = int(out_offs[-1])
    if total == 0:
        return np.empty(0, np.uint64), out_offs
    T = len(th)
    P = _mix_consts(n)
    with np.errstate(over="ignore"):
        v_full = th[:max(T - (n - 1), 0)] * P[0]
        for j in range(1, n):
            v_full = v_full + th[j:T - (n - 1) + j] * P[j]
    # ragged gather: output position k of doc d reads v_full[start_d + r]
    intra = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1],
                                                         out_lens)
    src = np.repeat(offsets[:-1], out_lens) + intra
    if len(v_full):
        vals = v_full[np.minimum(src, len(v_full) - 1)]
    else:
        # every doc in the batch is shorter than n: the short-doc loop
        # below overwrites every output slot (clamped gather would index
        # an empty array)
        vals = np.zeros(total, _U64)
    # overwrite the (rare) short docs: one combined hash over m < n tokens
    short = np.flatnonzero((lens > 0) & (lens < n))
    for d in short:
        with np.errstate(over="ignore"):
            acc = np.uint64(0)
            for j in range(int(lens[d])):
                acc = acc + th[offsets[d] + j] * P[j]
        vals[out_offs[d]] = acc
    return mix64(vals), out_offs


def minhash_params(num_hashes: int):
    """Public accessor for the fixed-seed universal-hash family (a, b)."""
    if num_hashes not in _MH_CACHE:
        _MH_CACHE[num_hashes] = _minhash_params(num_hashes)
    return _MH_CACHE[num_hashes]


def band_keys(sig: np.ndarray, bands: int, prefix: str = "mh") -> list:
    """Split a signature into ``bands`` row-groups -> one key per band."""
    r = len(sig) // bands
    return [
        "%s:%d:%016x" % (prefix, bidx,
                         stable_u64(sig[bidx * r:(bidx + 1) * r].tobytes()))
        for bidx in range(bands)
    ]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def exact_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    sa, sb = set(word_shingles(text_a, n)), set(word_shingles(text_b, n))
    if not sa and not sb:
        return 1.0
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def simhash64(text: str) -> int:
    """Charikar SimHash over word-unigram md5-low64 token hashes.

    Token hash = :func:`md5_low64` (== DuckDB ``md5_number_lower``), so the
    fingerprint — and the Hamming<=k pair set — has an exact SQL twin.
    """
    toks = text.lower().split()
    if not toks:
        return 0
    h = np.array([md5_low64(t.encode("utf-8")) for t in toks], dtype=_U64)
    bits = ((h[:, None] >> np.arange(64, dtype=_U64)[None, :])
            & _U64(1)).astype(np.int64)
    votes = bits.sum(axis=0) * 2 - len(toks)          # (+1/-1 per token)
    fp = np.uint64(0)
    for i in np.nonzero(votes > 0)[0]:
        fp |= _U64(1) << _U64(int(i))
    return int(fp)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_values(fp: int, bands: int = 4) -> list:
    """Split a 64-bit fingerprint into ``bands`` equal bit-bands.

    Pigeonhole: two fingerprints at Hamming distance < ``bands`` share at
    least one exact band value — the standard near-dup blocking recipe.
    """
    w = 64 // bands
    mask = (1 << w) - 1
    return [(i, (fp >> (i * w)) & mask) for i in range(bands)]


# Winnowing gram hash: Horner rolling hash over UTF-8 bytes with the FNV64
# prime. Byte-based (not char-based) so the batch kernel can run straight
# over the Arrow string values buffer — zero-copy, no per-position Python.
_WINNOW_B = _U64(1099511628211)
_MASK64 = (1 << 64) - 1


def _winnow_fold(grams: np.ndarray, window: int) -> int:
    """Grams (uint64) -> per-window minima -> dedup -> 64-bit fold."""
    if len(grams) <= window:
        picks = grams.min(keepdims=True)
    else:
        sw = np.lib.stride_tricks.sliding_window_view(grams, window)
        mins = sw.min(axis=1)
        # dedupe consecutive repeats (same selected gram)
        keep = np.concatenate([[True], mins[1:] != mins[:-1]])
        picks = mins[keep]
    return stable_u64(np.ascontiguousarray(picks, dtype=_U64).tobytes())


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> int:
    """Winnowing document fingerprint (Schleimer et al. 2003, public):
    rolling byte k-gram hashes -> per-window minima -> blake2b of the
    selected minima sequence. Deterministic; robust to local edits.

    Scalar twin of :func:`winnow_fingerprints_batch` (pytest asserts
    element-wise equality); kept in plain numpy so tests and the bridge
    can fingerprint one document without Arrow plumbing."""
    s = " ".join(text.lower().split())
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    if len(b) < k:
        return stable_u64(b.tobytes())
    ng = len(b) - k + 1
    grams = np.zeros(ng, dtype=_U64)
    with np.errstate(over="ignore"):
        for j in range(k):          # Horner: h = h*B + byte + 1
            grams = grams * _WINNOW_B + b[j:ng + j].astype(_U64) + _U64(1)
    return _winnow_fold(grams, window)


def winnow_fingerprints_batch(texts, k: int = 8,
                              window: int = 16) -> np.ndarray:
    """Vectorized winnowing over an Arrow string array -> uint64[n].

    The gram hashes for the WHOLE batch are k wraparound multiply-adds
    over the concatenated normalized UTF-8 bytes (the Arrow values buffer
    read as one uint8 array) — no per-position Python; windows that would
    cross a document boundary are simply never selected because each doc
    reads only its own gram slice. Per-doc work after that is a handful
    of numpy ops on that doc's grams (the round-3 version ran a Python
    crc32 call per CHARACTER — measured 3 MB/s/core; this measures
    15 MB/s/core on the same corpus, now limited by the uint64 Horner
    multiply's memory traffic rather than the interpreter).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) \
        else texts
    toks = pc.utf8_split_whitespace(
        pc.utf8_lower(pc.fill_null(arr, "")))
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    # drop the "" fragments split_whitespace emits (leading blanks/empty
    # docs) so the re-join equals the scalar " ".join(split()) exactly
    flat = toks.flatten()
    offs = toks.offsets.to_numpy().astype(np.int64)
    offs = offs - offs[0]
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not keep.all():
        csum = np.zeros(len(keep) + 1, np.int64)
        np.cumsum(keep, out=csum[1:])
        offs = csum[offs]
        flat = flat.filter(pa.array(keep))
    joined = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offs, pa.int32()), flat), " ")
    s = joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) \
        else joined
    s = pc.cast(s, pa.large_string())          # int64 offsets, one dtype
    boffs = np.frombuffer(s.buffers()[1], dtype=np.int64)[
        s.offset:s.offset + len(s) + 1]
    data = np.frombuffer(s.buffers()[2] or b"", dtype=np.uint8)
    n = len(s)
    out = np.zeros(n, dtype=_U64)
    m = len(data)
    ng = m - k + 1
    mins = None
    if ng > 0:
        # one upcast of the byte buffer (+1 folded in), then in-place
        # Horner with no per-term temporaries: h = h*B + (byte + 1),
        # identical to the scalar twin
        d64 = data.astype(_U64)
        d64 += _U64(1)
        grams = d64[0:ng].copy()
        with np.errstate(over="ignore"):
            for j in range(1, k):
                grams *= _WINNOW_B
                grams += d64[j:ng + j]
        if ng >= window:
            # ONE global sliding-min pass + ONE global consecutive-dedupe
            # mask; cross-doc windows are computed but never selected
            # (each doc below reads only window starts fully inside its
            # own gram range, and forces its first min kept when the
            # global mask compared it against the neighbour doc's min).
            # Sliding min is van Herk/Gil-Werman: block prefix/suffix
            # minima -> 3 linear passes instead of O(window) per element
            nb = -(-ng // window) * window
            padded = np.full(nb, np.iinfo(np.uint64).max, _U64)
            padded[:ng] = grams
            blocks = padded.reshape(-1, window)
            left = np.minimum.accumulate(blocks, axis=1).ravel()
            right = np.minimum.accumulate(
                blocks[:, ::-1], axis=1)[:, ::-1].ravel()
            nm = ng - window + 1
            mins = np.minimum(right[:nm], left[window - 1:
                                               window - 1 + nm])
            keepg = np.empty(len(mins), np.bool_)
            keepg[0] = True
            np.not_equal(mins[1:], mins[:-1], out=keepg[1:])
    for d in range(n):
        lo, hi = int(boffs[d]), int(boffs[d + 1])
        if hi - lo < k:
            out[d] = stable_u64(data[lo:hi].tobytes())
            continue
        nl = hi - k + 1 - lo                   # this doc's gram count
        if nl <= window:
            picks = grams[lo:lo + nl].min(keepdims=True)
        else:
            e = lo + nl - window + 1
            picks = mins[lo:e][keepg[lo:e]]
            if lo > 0 and mins[lo] == mins[lo - 1]:
                picks = np.concatenate([mins[lo:lo + 1], picks])
        out[d] = stable_u64(np.ascontiguousarray(
            picks, dtype=_U64).tobytes())
    return out
