"""Property-based tests (hypothesis) for the pure-Python kernel.

These pin down the invariants the distributed pipeline leans on: the
normalizer is idempotent and its Arrow twin is element-wise identical, the
extraction kernel is deterministic and schema-stable on arbitrary input,
the similarity ensemble is symmetric and bounded, and the codecs roundtrip.
No Ray — everything here runs in-process.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS
from ai_bangladesh_address_parser_ray.kernel.compare import (
    jaro_winkler, levenshtein, score_pair, token_jaccard,
)
from ai_bangladesh_address_parser_ray.kernel.extract import extract
from ai_bangladesh_address_parser_ray.kernel.normalizer import (
    normalize, normalize_array,
)
from ai_bangladesh_address_parser_ray.kernel.phonetic import (
    minhash_band_keys, soundex,
)

# address-ish alphabet: Latin, digits, Bangla letters + numerals, and the
# punctuation the normalizer rewrites
_TEXT = st.text(
    alphabet=st.sampled_from(
        list("abcdefghijklmnopqrstuvwxyz"
             "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ,-/#:.'\"()+&")
        + list("০১২৩৪৫৬৭৮৯")
        + list("বাড়িরোডগুলশানঢাকামিরপুর")),
    max_size=120)


class TestNormalizerProperties:
    @given(_TEXT)
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, t):
        once = normalize(t)
        assert normalize(once) == once

    @given(st.lists(_TEXT, max_size=20))
    @settings(max_examples=50, deadline=None)
    def test_vectorized_twin_elementwise(self, ts):
        import pyarrow as pa
        got = normalize_array(pa.array(ts, pa.string())).to_pylist()
        assert got == [normalize(t) for t in ts]

    @given(_TEXT)
    @settings(max_examples=200, deadline=None)
    def test_no_bangla_digits_survive(self, t):
        assert not set(normalize(t)) & set("০১২৩৪৫৬৭৮৯")


class TestExtractProperties:
    @given(_TEXT)
    @settings(max_examples=150, deadline=None)
    def test_deterministic_and_schema_stable(self, t):
        a = extract(t)
        b = extract(t)
        assert a == b
        assert set(a["components"]) == set(COMPONENT_FIELDS)
        assert all(isinstance(v, str) for v in a["components"].values())
        assert 0.0 <= a["overall_confidence"] <= 1.0

    @given(_TEXT)
    @settings(max_examples=150, deadline=None)
    def test_postal_always_4_digit_or_empty(self, t):
        p = extract(t)["components"]["postal_code"]
        assert p == "" or (len(p) == 4 and p.isdigit())


class TestCompareProperties:
    @given(_TEXT, _TEXT)
    @settings(max_examples=200, deadline=None)
    def test_similarity_symmetric_bounded(self, a, b):
        for fn in (jaro_winkler, token_jaccard):
            s_ab, s_ba = fn(a, b), fn(b, a)
            assert abs(s_ab - s_ba) < 1e-12
            assert 0.0 <= s_ab <= 1.0
        assert levenshtein(a, b) == levenshtein(b, a)

    @given(_TEXT)
    @settings(max_examples=100, deadline=None)
    def test_self_similarity_is_one(self, a):
        if a:
            assert jaro_winkler(a, a) == 1.0
            assert levenshtein(a, a) == 0

    @given(_TEXT, _TEXT)
    @settings(max_examples=100, deadline=None)
    def test_score_pair_symmetric(self, a, b):
        ca = extract(normalize(a))["components"]
        cb = extract(normalize(b))["components"]
        ab, ba = score_pair(ca, cb), score_pair(cb, ca)
        assert abs(ab["score"] - ba["score"]) < 1e-12
        assert ab["match"] == ba["match"]


class TestPhoneticProperties:
    @given(st.text(alphabet=st.characters(codec="ascii"), max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_soundex_shape(self, t):
        s = soundex(t)
        assert len(s) == 4
        assert s == "0000" or (s[0].isalpha() and s[1:].isdigit())

    @given(_TEXT)
    @settings(max_examples=100, deadline=None)
    def test_minhash_bands_deterministic(self, t):
        assert minhash_band_keys(t) == minhash_band_keys(t)


class TestUnionFindProperties:
    """``_min_fixpoint`` is the closure kernel under every union-find
    strategy (local, per-block star, tree merge); pin it against a
    from-scratch BFS reference on adversarial random graphs."""

    @given(st.integers(1, 40),
           st.lists(st.tuples(st.integers(0, 39), st.integers(0, 39)),
                    max_size=120))
    @settings(max_examples=200, deadline=None)
    def test_min_fixpoint_equals_bfs_closure(self, n, raw_edges):
        from ai_bangladesh_address_parser_ray.stages.unionfind import (
            _min_fixpoint,
        )
        edges = [(u % n, v % n) for u, v in raw_edges]
        a = np.array([e[0] for e in edges], dtype=np.int64)
        b = np.array([e[1] for e in edges], dtype=np.int64)
        par = _min_fixpoint(np.arange(n, dtype=np.int64), a, b)
        # reference: BFS each component, label = component min
        adj = {i: set() for i in range(n)}
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        want = np.arange(n, dtype=np.int64)
        seen = set()
        for s in range(n):
            if s in seen:
                continue
            comp, frontier = {s}, [s]
            while frontier:
                x = frontier.pop()
                for y in adj[x]:
                    if y not in comp:
                        comp.add(y)
                        frontier.append(y)
            m = min(comp)
            for x in comp:
                want[x] = m
            seen |= comp
        np.testing.assert_array_equal(par, want)

    @given(st.integers(2, 30),
           st.lists(st.tuples(st.integers(0, 29), st.integers(0, 29)),
                    min_size=1, max_size=80))
    @settings(max_examples=100, deadline=None)
    def test_split_merge_equals_whole(self, n, raw_edges):
        """Two-level decomposition invariant: closing two arbitrary halves
        of the edge list locally, then closing the union of their star
        forests, equals closing the whole list (what ``_local_star`` +
        ``_star_merge`` rely on)."""
        from ai_bangladesh_address_parser_ray.stages.unionfind import (
            _min_fixpoint,
        )
        edges = [(u % n, v % n) for u, v in raw_edges]
        cut = len(edges) // 2

        def close(es):
            if not es:
                return np.arange(n, dtype=np.int64)
            a = np.array([e[0] for e in es], dtype=np.int64)
            b = np.array([e[1] for e in es], dtype=np.int64)
            return _min_fixpoint(np.arange(n, dtype=np.int64), a, b)

        p1, p2 = close(edges[:cut]), close(edges[cut:])
        # star forests as (node -> label) edges, merged and re-closed
        star = [(i, int(p[i])) for p in (p1, p2) for i in range(n)
                if p[i] != i]
        np.testing.assert_array_equal(close(star), close(edges))


class TestPairsCoreProperties:
    """Candidate-pair generation invariants the linkage graph leans on."""

    def _block_df(self, n_rows, rng):
        import pandas as pd
        areas = ["gulshan", "banani", "mirpur"]
        rows = []
        for i in range(n_rows):
            rows.append({
                "block_key": "ad:x",
                "node_id": f"n{i:04d}",
                **{f: "" for f in COMPONENT_FIELDS},
                "area": rng.choice(areas),
                "road": f"road {rng.randint(1, 4)}",
                "house_number": str(rng.randint(1, 3)),
            })
        return pd.DataFrame(rows)

    @given(st.integers(2, 12), st.integers(0, 2**31 - 1))
    @settings(max_examples=60, deadline=None)
    def test_below_cap_is_complete_and_canonical(self, n_rows, seed):
        from ai_bangladesh_address_parser_ray.stages.pairs import (
            _pairs_from_bucket,
        )
        rng = np.random.RandomState(seed)
        df = self._block_df(n_rows, rng)
        out = _pairs_from_bucket(df, cap=64, window=8)
        got = {(u, v) for u, v in zip(out["u"], out["v"])}
        want = {(f"n{i:04d}", f"n{j:04d}")
                for i in range(n_rows) for j in range(i + 1, n_rows)}
        assert got == want                       # complete: all C(n,2)
        assert all(u < v for u, v in got)        # canonical orientation
        assert len(out) == len(got)              # no duplicate pairs

    @given(st.integers(12, 40), st.integers(0, 2**31 - 1))
    @settings(max_examples=40, deadline=None)
    def test_oversized_block_keeps_same_extraction_connected(
            self, n_rows, seed):
        """Above the cap, two-level generation must still connect every
        identical-extraction group (the recall guarantee the star pairs
        provide); pairs carry oversized=1."""
        from ai_bangladesh_address_parser_ray.stages.pairs import (
            _pairs_from_bucket,
        )
        from ai_bangladesh_address_parser_ray.stages.unionfind import (
            _min_fixpoint,
        )
        rng = np.random.RandomState(seed)
        df = self._block_df(n_rows, rng)
        out = _pairs_from_bucket(df, cap=4, window=2)
        assert (out["oversized"] == 1).all()
        nodes = sorted(df["node_id"])
        pos = {x: i for i, x in enumerate(nodes)}
        a = np.array([pos[u] for u in out["u"]], dtype=np.int64)
        b = np.array([pos[v] for v in out["v"]], dtype=np.int64)
        par = _min_fixpoint(np.arange(len(nodes), dtype=np.int64), a, b)
        ext = df.sort_values("node_id")[
            ["area", "road", "house_number"]].agg("|".join, axis=1).to_numpy()
        for g in set(ext):
            comps = {par[i] for i in np.flatnonzero(ext == g)}
            assert len(comps) == 1, f"extraction group {g} split"


class TestShingleHashProperties:
    """The round-4 carried-shingle rewrite: Jaccard over precomputed
    uint64 shingle-hash sets must equal the string-shingle Jaccard
    (``exact_jaccard``) on the same tokenization."""

    _WORDS = st.lists(
        st.text(alphabet=st.sampled_from("abcdefgh123"), min_size=1,
                max_size=6),
        max_size=25)

    @given(_WORDS, _WORDS)
    @settings(max_examples=150, deadline=None)
    def test_hash_set_jaccard_equals_string_jaccard(self, wa, wb):
        import pyarrow as pa
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            _pair_jaccards, _token_hashes_batch,
        )
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            exact_jaccard, token_ngram_hashes,
        )
        ta, tb = " ".join(wa), " ".join(wb)
        th, toffs = _token_hashes_batch(
            pa.chunked_array([pa.array([ta, tb], pa.string())]))
        sh, soffs = token_ngram_hashes(th, toffs, 3)
        sa = np.unique(sh[soffs[0]:soffs[1]])
        sb = np.unique(sh[soffs[1]:soffs[2]])
        got = _pair_jaccards([sa], [sb])[0]
        assert abs(got - exact_jaccard(ta, tb, 3)) < 1e-12

    @given(_WORDS)
    @settings(max_examples=100, deadline=None)
    def test_distinct_hash_count_equals_distinct_shingles(self, wa):
        import pyarrow as pa
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            _token_hashes_batch,
        )
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            token_ngram_hashes, word_shingles,
        )
        ta = " ".join(wa)
        th, toffs = _token_hashes_batch(
            pa.chunked_array([pa.array([ta], pa.string())]))
        sh, soffs = token_ngram_hashes(th, toffs, 3)
        assert len(np.unique(sh[soffs[0]:soffs[1]])) == \
            len(set(word_shingles(ta, 3)))


class TestCodecProperties:
    @given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
    @settings(max_examples=100, deadline=None)
    def test_netpbm_roundtrip(self, w, h, seed):
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            decode_netpbm, encode_netpbm, nn_resize,
        )
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        np.testing.assert_array_equal(decode_netpbm(encode_netpbm(img)), img)
        out = nn_resize(img, 7, 5)
        assert out.shape == (5, 7)
        # resize output only contains source pixels
        assert set(np.unique(out)) <= set(np.unique(img))


class TestRoundingProperties:
    """functions/rounding.py is the oracle-hash load-bearing wall: the
    floor round must evaluate bit-identically in numpy, pyarrow, scalar
    Python and DuckDB SQL for ANY double, including exact dyadic ties
    (77/128) where library round() implementations disagree."""

    @given(st.lists(st.one_of(
        st.floats(min_value=-2.0, max_value=2.0,
                  allow_nan=False, allow_infinity=False),
        # integer quotients — the ratio shape every oracle emits
        st.tuples(st.integers(0, 10_000), st.integers(1, 10_000))
        .map(lambda p: p[0] / p[1]),
        # dyadic rationals: exact ties at the 6th decimal
        st.tuples(st.integers(0, 1 << 12), st.integers(0, 12))
        .map(lambda p: p[0] / (1 << p[1])),
    ), min_size=1, max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_four_implementations_bit_identical(self, xs):
        import duckdb
        import numpy as np
        import pyarrow as pa

        from ai_bangladesh_address_parser_ray.functions.rounding import (
            round6_arrow, round6_np, round6_scalar, sql_round6)
        arr = np.asarray(xs, np.float64)
        a = round6_np(arr)
        b = round6_arrow(pa.array(arr)).to_numpy()
        c = np.asarray([round6_scalar(float(v)) for v in xs])
        con = duckdb.connect()
        con.register("t", pa.table({"x": arr}))
        d = con.sql("SELECT " + sql_round6("x")
                    + " AS r FROM t").fetchnumpy()["r"]
        assert np.array_equal(a, b)
        assert np.array_equal(a, c)
        assert np.array_equal(a, d)
        # idempotent: rounding a rounded value is a fixed point
        assert np.array_equal(a, round6_np(a))
        # within half an ulp-of-6dp of the input
        assert np.all(np.abs(a - arr) <= 5.0000001e-7)
