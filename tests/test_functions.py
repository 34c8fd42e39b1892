"""Tests for the training-data operator family (functions/*).

Oracles are single-process pandas/numpy reimplementations over the driver
testdata at sf0.001 (small, deterministic)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_df():
    return pd.read_parquet(f"{SF}/embeddings.parquet")


def _docs_ds():
    import ray.data
    return ray.data.read_parquet(f"{SF}/documents.parquet")


def _emb_ds():
    import ray.data
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


# ----------------------------------------------------------- hashing ----

class TestHashing:
    def test_minhash_estimates_jaccard(self):
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            estimate_jaccard, minhash_signature)
        a = [f"tok{i}" for i in range(100)]
        b = [f"tok{i}" for i in range(50, 150)]   # true J = 50/150 = 1/3
        sa = minhash_signature(a, 256)
        sb = minhash_signature(b, 256)
        est = estimate_jaccard(sa, sb)
        assert abs(est - 1 / 3) < 0.12

    def test_minhash_deterministic_across_calls(self):
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            minhash_signature)
        s1 = minhash_signature(["a", "b", "c"])
        s2 = minhash_signature(["c", "b", "a"])   # set semantics: order-free
        assert (s1 == s2).all()

    def test_simhash_similar_texts_close(self):
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            hamming64, simhash64)
        t = "the quick brown fox jumps over the lazy dog " * 5
        t2 = t.replace("lazy", "sleepy", 1)
        t3 = "completely different words entirely unrelated content here"
        assert hamming64(simhash64(t), simhash64(t2)) < \
            hamming64(simhash64(t), simhash64(t3))

    def test_md5_low64_matches_duckdb_md5_number_lower(self):
        # the simhash token-hash contract: md5_low64 IS DuckDB's
        # md5_number_lower, which is what makes the simhash_dup_pairs
        # oracle SQL an exact twin of the Ray fingerprint
        import duckdb
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            md5_low64)
        con = duckdb.connect()
        for t in ["hello", "দহকা", "", "mixed ১২৩ text", "x" * 100]:
            want = con.execute(
                "SELECT md5_number_lower(?)::UBIGINT", [t]).fetchone()[0]
            assert md5_low64(t.encode("utf-8")) == want

    def test_winnow_batch_matches_scalar(self):
        import numpy as np
        import pyarrow as pa
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            winnow_fingerprint, winnow_fingerprints_batch)
        texts = ["alpha beta gamma delta " * 20, "", "   ", "ab",
                 "দহকা শহর  এলাকা   যায়", None, "x" * 7, "x" * 8,
                 " leading blank", "a b", "w " * 12,
                 "the quick brown fox jumps over the lazy dog"]
        arr = pa.array(texts, pa.string())
        got = winnow_fingerprints_batch(arr)
        exp = np.array([winnow_fingerprint(t or "") for t in texts],
                       np.uint64)
        assert (got == exp).all()
        # chunked and sliced inputs take the same zero-copy path
        ch = pa.chunked_array([arr.slice(0, 5), arr.slice(5)])
        assert (winnow_fingerprints_batch(ch) == exp).all()
        assert (winnow_fingerprints_batch(arr.slice(2, 6)) == exp[2:8]).all()

    def test_winnow_stable_under_local_edit(self):
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            winnow_fingerprint)
        t = "alpha beta gamma delta " * 20
        assert winnow_fingerprint(t) == winnow_fingerprint(t)
        # winnowing's guarantee (Schleimer et al. §3): a change is only
        # certain to surface if it spans >= window + k - 1 bytes (some
        # window then lies fully inside the new region); shorter appends
        # on periodic text can legitimately leave the picks unchanged
        edit = "omega zed epsilon theta iota kappa lambda"
        assert winnow_fingerprint(t) != winnow_fingerprint(t + edit)

    def test_simhash_band_pigeonhole(self):
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            simhash_band_values)
        a, b = 0b1010, 0b1011   # hamming 1 < 4 bands
        ba = dict(simhash_band_values(a, 4))
        bb = dict(simhash_band_values(b, 4))
        assert any(ba[i] == bb[i] for i in range(4))


# ------------------------------------------------------------- dedup ----

class TestDedup:
    def test_exact_dedup_matches_pandas(self, ray_session, docs_df):
        import hashlib
        from ai_bangladesh_address_parser_ray.functions.dedup import exact_dedup
        got = exact_dedup(_docs_ds()).to_pandas()
        exp = (docs_df.assign(
            text_hash=docs_df.text.map(
                lambda t: hashlib.md5(t.encode()).hexdigest()))
            .groupby("text_hash")
            .agg(rep_id=("doc_id", "min"), n_dups=("doc_id", "size"))
            .reset_index())
        got = got.sort_values("text_hash").reset_index(drop=True)
        exp = exp.sort_values("text_hash").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["text_hash", "rep_id", "n_dups"]],
            exp[["text_hash", "rep_id", "n_dups"]],
            check_dtype=False)

    def test_ngram_jaccard_matches_bruteforce(self, ray_session, docs_df):
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            ngram_jaccard_pairs)
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            exact_jaccard)
        import ray.data
        sub = docs_df.head(150)
        ds = ray.data.from_pandas(sub)
        got = ngram_jaccard_pairs(ds, threshold=0.8, num_partitions=4)
        got = got.to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True)
        exp_rows = []
        recs = sub[["doc_id", "text"]].values
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                jac = exact_jaccard(recs[i][1], recs[j][1])
                if jac >= 0.8:
                    a, b = sorted((int(recs[i][0]), int(recs[j][0])))
                    exp_rows.append((a, b, jac))
        exp = pd.DataFrame(exp_rows, columns=["a_id", "b_id", "jaccard"]) \
            .sort_values(["a_id", "b_id"]).reset_index(drop=True)
        assert len(exp) > 0, "fixture should contain near-dup docs"
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_near_dup_clusters_transitive_chain(self, ray_session):
        """A~B and B~C but A!~C must still land in ONE cluster with the
        min doc_id canonical; untouched docs are keep=1 singletons."""
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            near_dup_clusters)
        import ray.data
        base = "alpha bravo charlie delta echo foxtrot golf hotel " \
               "india juliet kilo lima mike november oscar papa"
        toks = base.split()
        a = " ".join(toks)
        b = " ".join(toks[:-1] + ["quebec"])        # ~A: high overlap
        c = " ".join(["zulu"] + toks[1:-1] + ["quebec"])  # ~B, farther from A
        docs = pd.DataFrame({
            "doc_id": [7, 3, 11, 42],
            "text": [a, b, c, "completely different short text"],
        })
        out = near_dup_clusters(ray.data.from_pandas(docs), threshold=0.7,
                                num_partitions=2).to_pandas()
        out = out.set_index("doc_id")
        # transitive component {3, 7, 11} labeled by numeric min = 3
        assert set(out.loc[[3, 7, 11], "cluster_id"]) == {3}
        assert out.loc[3, "keep"] == 1
        assert out.loc[7, "keep"] == 0 and out.loc[11, "keep"] == 0
        # singleton keeps itself
        assert out.loc[42, "cluster_id"] == 42 and out.loc[42, "keep"] == 1
        # exactly one keep per cluster, every doc present
        assert len(out) == 4
        assert out.groupby("cluster_id")["keep"].sum().eq(1).all()

    def test_near_dup_clusters_all_distinct_corpus(self, ray_session):
        """Regression: ZERO near-dup edges (the common all-distinct case)
        crashed the broadcast-label path on concat of zero batches; every
        doc must come back as its own keep=1 singleton."""
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            near_dup_clusters)
        import ray.data
        docs = pd.DataFrame({
            "doc_id": [5, 9, 2],
            "text": ["alpha bravo charlie delta echo",
                     "one two three four five six",
                     "red green blue yellow purple"],
        })
        out = near_dup_clusters(ray.data.from_pandas(docs), threshold=0.7,
                                num_partitions=2).to_pandas()
        out = out.set_index("doc_id")
        assert len(out) == 3
        assert (out["keep"] == 1).all()
        assert (out["cluster_id"] == out.index).all()

    def test_ngram_and_clusters_on_empty_corpus(self, ray_session):
        """Regression: a fully-filtered (0-row) corpus yielded zero
        batches into the broadcast set-attach concat."""
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            near_dup_clusters, ngram_jaccard_pairs)
        import ray.data
        empty = ray.data.from_pandas(
            pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype="object")}))
        assert ngram_jaccard_pairs(empty, num_partitions=2).count() == 0
        assert near_dup_clusters(empty, num_partitions=2).count() == 0

    def test_wide_shingles_supported(self, ray_session, docs_df):
        """shingle_n wider than the fixed mixer-constant set (n > 4) must
        work — word_shingles accepted any n, so the vectorized path must
        too (the extended constants derive deterministically)."""
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            ngram_jaccard_pairs)
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            exact_jaccard)
        import ray.data
        sub = docs_df.head(80)
        got = ngram_jaccard_pairs(ray.data.from_pandas(sub), threshold=0.6,
                                  shingle_n=6, num_partitions=2).to_pandas()
        recs = sub[["doc_id", "text"]].values
        exp = set()
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                if exact_jaccard(recs[i][1], recs[j][1], 6) >= 0.6:
                    exp.add(tuple(sorted((int(recs[i][0]),
                                          int(recs[j][0])))))
        assert {(a, b) for a, b in zip(got["a_id"], got["b_id"])} == exp

    def test_distinct_rows_sparse_after_heavy_filter(self, ray_session):
        """Regression: a heavily-filtered corpus (most blocks empty, few
        survivors) must still dedup — the old winners-join formulation
        crashed on Ray 2.49's schema-less empty aggregate partitions."""
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            distinct_rows)
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data
        df = pd.DataFrame({"doc_id": range(4900),
                           "text": [f"t{i % 20}" for i in range(4900)]})
        ds = ray.data.from_pandas(df).repartition(40)
        ds = ds.map_batches(
            lambda b: b.filter(pc.less(b["doc_id"], 23)),
            batch_format="pyarrow")
        out = distinct_rows(ds).to_pandas().sort_values("doc_id")
        # 23 survivors over 20 distinct texts -> 20 min-id representatives
        assert out["doc_id"].tolist() == list(range(20))
        assert set(out.columns) == {"doc_id", "text"}

    def test_contamination_pairs_planted(self, ray_session):
        """A train doc sharing a 3-gram with a bench doc is flagged with the
        exact distinct-shingle count; clean docs are absent; min_shared
        raises the bar."""
        from ai_bangladesh_address_parser_ray.functions.decontaminate import (
            contamination_pairs)
        import ray.data
        bench = pd.DataFrame({
            "doc_id": [100, 200],
            "text": ["the quick brown fox jumps", "pack my box with jugs"],
        })
        train = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["saw the quick brown fox run",   # shares 2 shingles w/100
                     "something else pack my box",    # shares 1 shingle w/200
                     "completely unrelated clean words here"],
        })
        out = contamination_pairs(ray.data.from_pandas(train),
                                  ray.data.from_pandas(bench)).to_pandas()
        out = out.sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
        assert out.values.tolist() == [[1, 100, 2], [2, 200, 1]]
        strict = contamination_pairs(ray.data.from_pandas(train),
                                     ray.data.from_pandas(bench),
                                     min_shared=2).to_pandas()
        assert strict.values.tolist() == [[1, 100, 2]]

    def test_bench_side_size_guard(self, ray_session, monkeypatch):
        """An oversized bench side must raise with the measured row count
        (VERDICT r4 #7), not silently build a corpus-sized driver dict."""
        import ray.data

        from ai_bangladesh_address_parser_ray.functions import decontaminate
        monkeypatch.setattr(decontaminate, "MAX_BENCH_ROWS", 10)
        big_bench = pd.DataFrame({
            "doc_id": range(25),
            "text": ["alpha beta gamma delta"] * 25})
        train = pd.DataFrame({"doc_id": [1], "text": ["alpha beta gamma"]})
        with pytest.raises(ValueError, match="25 rows"):
            decontaminate.contamination_pairs(
                ray.data.from_pandas(train),
                ray.data.from_pandas(big_bench)).to_pandas()

    def test_training_corpus_pipeline_planted(self, ray_session):
        """Each hygiene stage drops exactly its target: the low-quality doc,
        the contaminated doc, and the higher-id exact duplicate."""
        from ai_bangladesh_address_parser_ray.pipelines.corpus import (
            materialize_training_corpus)
        import ray.data
        good = ("the cat and the dog walked to the park in the morning "
                "and it was a fine day for everyone involved, truly.") * 2
        bench = pd.DataFrame({"doc_id": [900],
                              "text": ["unique benchmark marker phrase"],
                              "lang": ["en"]})
        train = pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [good,
                     good,                                # exact dup of 1
                     good + " unique benchmark marker phrase",  # contaminated
                     "!!! ??? ;;; ,,,"],                  # low quality
            "lang": ["en"] * 4,
        })
        out = materialize_training_corpus(
            ray.data.from_pandas(train), ray.data.from_pandas(bench),
            quality_tau=0.5).to_pandas()
        assert out["doc_id"].tolist() == [1]
        assert set(out.columns) == {"doc_id", "lang", "n_tokens", "quality"}
        assert (out["quality"] >= 0.5).all()

    def test_minhash_pairs_cover_near_dups(self, ray_session, docs_df):
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            minhash_lsh_pairs)
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            exact_jaccard)
        got = minhash_lsh_pairs(_docs_ds(), est_threshold=0.5).to_pandas()
        got_pairs = set(zip(got.a_id, got.b_id))
        texts = dict(zip(docs_df.doc_id, docs_df.text))
        # every very-high-jaccard pair must be found
        strong = [(a, b) for (a, b) in got_pairs
                  if exact_jaccard(texts[a], texts[b]) >= 0.9]
        assert len(strong) > 0

    def test_minhash_over_cap_duplicates_lossless(self, ray_session):
        """A duplicate cluster LARGER than the band-group cap must still
        yield full all-pairs recall: identical signatures collapse to one
        group before the cap applies, so mass duplication never truncates
        (the old code silently dropped rows past position `cap`)."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            minhash_lsh_pairs)
        n = 40
        docs = pd.DataFrame({
            "doc_id": range(n),
            # 30 exact copies (> cap=8) + 10 distinct fillers
            "text": (["the quick brown fox jumps over the lazy dog"] * 30
                     + [f"totally unrelated filler text number {i} "
                        f"with words {i * 7} and {i * 13}"
                        for i in range(10)]),
        })
        got = minhash_lsh_pairs(ray.data.from_pandas(docs),
                                est_threshold=0.5, cap=8).to_pandas()
        dup_pairs = {(a, b) for a, b in zip(got.a_id, got.b_id)
                     if a < 30 and b < 30}
        assert len(dup_pairs) == 30 * 29 // 2     # full all-pairs recall
        # identical docs come from collapsed groups, not over-cap windows
        assert (got.loc[(got.a_id < 30) & (got.b_id < 30),
                        "oversized"] == 0).all()

    def test_minhash_over_cap_distinct_flagged(self, ray_session):
        """More DISTINCT signatures than the cap in one band -> pairs are
        still emitted (windowed) and every one is flagged oversized=1 —
        truncation is observable, never silent."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            minhash_lsh_pairs)
        # near-identical long docs: each differs by one trailing token, so
        # signatures are distinct but est-jaccard stays >= 0.5
        base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliet kilo lima mike november oscar papa quebec romeo "
                "sierra tango uniform victor whiskey xray yankee zulu ")
        docs = pd.DataFrame({
            "doc_id": range(12),
            "text": [base * 3 + f"tail{i}" for i in range(12)],
        })
        got = minhash_lsh_pairs(ray.data.from_pandas(docs),
                                est_threshold=0.5, cap=4,
                                window=4).to_pandas()
        assert len(got) > 0
        assert (got.oversized == 1).any()

    def test_simhash_over_cap_duplicates_lossless(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            simhash_pairs)
        n = 30
        docs = pd.DataFrame({
            "doc_id": range(n),
            "text": (["identical document body for simhash cap test"] * 20
                     + [f"some other completely different text {i} "
                        f"{i * 31} {i * 17}" for i in range(10)]),
        })
        got = simhash_pairs(ray.data.from_pandas(docs), max_hamming=3,
                            cap=6).to_pandas()
        dup = got[(got.a_id < 20) & (got.b_id < 20)]
        assert len(dup) == 20 * 19 // 2
        assert (dup.hamming == 0).all()

    def test_simhash_pairs_sane(self, ray_session, docs_df):
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            simhash_pairs)
        from ai_bangladesh_address_parser_ray.functions.hashing import (
            hamming64, simhash64)
        got = simhash_pairs(_docs_ds(), max_hamming=3).to_pandas()
        texts = dict(zip(docs_df.doc_id, docs_df.text))
        for r in got.itertuples():
            assert hamming64(simhash64(texts[r.a_id]),
                             simhash64(texts[r.b_id])) == r.hamming
            assert r.hamming <= 3

    def test_embedding_cosine_pairs_match_numpy(self, ray_session, emb_df):
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            embedding_cosine_pairs)
        got = embedding_cosine_pairs(_emb_ds(), tau=0.4).to_pandas()
        got_pairs = set(zip(got.a_id, got.b_id))
        M = np.asarray([np.asarray(v, np.float64) for v in emb_df.embedding])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        ids = emb_df.vec_id.to_numpy()
        exp = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if S[i, j] >= 0.4:
                    exp.add((int(min(ids[i], ids[j])),
                             int(max(ids[i], ids[j]))))
        assert got_pairs == exp and len(exp) > 0


# -------------------------------------------------------- similarity ----

class TestSimilarity:
    def _brute(self, emb_df, nq=5, k=5):
        M = np.asarray([np.asarray(v, np.float64) for v in emb_df.embedding])
        ids = emb_df.vec_id.to_numpy()
        order = np.argsort(ids)
        M, ids = M[order], ids[order]
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        out = {}
        for qi in range(nq):
            sims = Mn[qi] @ Mn.T
            cand = [(float(sims[j]), int(ids[j]))
                    for j in range(len(ids)) if ids[j] != ids[qi]]
            cand.sort(key=lambda t: (-t[0], t[1]))
            out[int(ids[qi])] = cand[:k]
        return out

    def test_lang_id_vectorized_matches_scalar(self, ray_session, docs_df):
        """The Arrow-kernel batch path must equal lang_id_one row-for-row
        (incl. edge cases: empty text, bangla/CJK overrides, no-hit)."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            lang_id, lang_id_one)
        extra = pd.DataFrame({
            "doc_id": [90001, 90002, 90003, 90004],
            "text": ["", "আমি বাংলায় গান গাই", "的的 的 中文 文本 的",
                     "zxqv prkl mnop"],
        })
        df = pd.concat([docs_df[["doc_id", "text"]], extra],
                       ignore_index=True)
        got = lang_id(ray.data.from_pandas(df)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp = df.sort_values("doc_id").reset_index(drop=True)
        for g, t in zip(got.itertuples(), exp["text"]):
            lang, score = lang_id_one(t or "")
            assert g.lang_pred == lang, t
            assert abs(g.lang_score - score) < 1e-9, t

    def test_embedding_pairs_lsh_path_matches_brute(self, ray_session):
        """The scale-gated sign-LSH strategy must find the same near-dup
        pairs as the broadcast brute-force on a seeded clustered corpus
        (high-tau near-dups collide in >=1 of 16 bands w.p. ~1-1e-8)."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            embedding_cosine_pairs)
        rng = np.random.RandomState(7)
        dim, n_clusters, per = 32, 12, 4
        base = rng.standard_normal((n_clusters, dim))
        vecs, ids = [], []
        for c in range(n_clusters):
            for j in range(per):
                v = base[c] + 0.02 * rng.standard_normal(dim)
                vecs.append(v / np.linalg.norm(v))
                ids.append(c * per + j)
        # plus unrelated noise vectors
        for j in range(60):
            v = rng.standard_normal(dim)
            vecs.append(v / np.linalg.norm(v))
            ids.append(1000 + j)
        df = pd.DataFrame({"vec_id": ids,
                           "embedding": [list(v) for v in vecs]})
        ds = ray.data.from_pandas(df)
        tau = 0.95
        brute = embedding_cosine_pairs(ds, tau=tau).to_pandas()
        lsh = embedding_cosine_pairs(ds, tau=tau,
                                     broadcast_limit=0).to_pandas()
        bp = set(zip(brute.a_id, brute.b_id))
        lp = set(zip(lsh.a_id, lsh.b_id))
        assert bp, "fixture must contain near-dup pairs"
        assert lp == bp

    def test_knn_brute_matches_numpy(self, ray_session, emb_df):
        from ai_bangladesh_address_parser_ray.functions.similarity import (
            knn_brute)
        sub = emb_df.sort_values("vec_id")
        mat = np.asarray([np.asarray(v, np.float64)
                          for v in sub.embedding.head(5)])
        ids = sub.vec_id.head(5).tolist()
        got = knn_brute(_emb_ds(), mat, ids, k=5).to_pandas()
        exp = self._brute(emb_df, nq=5, k=5)
        for qid, ranked in exp.items():
            g = got[got.query_id == qid].sort_values("rank")
            assert g.neighbor_id.tolist() == [nid for _, nid in ranked]
            np.testing.assert_allclose(
                g.score.to_numpy(), [round(s, 6) for s, _ in ranked],
                atol=1e-6)

    def test_knn_lsh_recall(self, ray_session, emb_df):
        from ai_bangladesh_address_parser_ray.functions.similarity import (
            knn_lsh)
        sub = emb_df.sort_values("vec_id")
        mat = np.asarray([np.asarray(v, np.float64)
                          for v in sub.embedding.head(5)])
        ids = sub.vec_id.head(5).tolist()
        got = knn_lsh(_emb_ds(), mat, ids, k=5, n_planes=4).to_pandas()
        exp = self._brute(emb_df, nq=5, k=5)
        hits = total = 0
        for qid, ranked in exp.items():
            want = {nid for _, nid in ranked}
            have = set(got[got.query_id == qid].neighbor_id)
            hits += len(want & have)
            total += len(want)
        # approximate by design: assert a sanity floor well above chance
        # (the fixture's nearest neighbors sit near cos~0.4, so sign-LSH
        # recall is modest but must beat random bucketing)
        assert hits / total >= 0.25

    def test_knn_ivf_recall(self, ray_session, emb_df):
        from ai_bangladesh_address_parser_ray.functions.similarity import (
            knn_ivf)
        sub = emb_df.sort_values("vec_id")
        mat = np.asarray([np.asarray(v, np.float64)
                          for v in sub.embedding.head(5)])
        ids = sub.vec_id.head(5).tolist()
        # few lists + wide probe on the small fixture => near-exact recall
        got = knn_ivf(_emb_ds(), mat, ids, k=5, n_lists=4, nprobe=3).to_pandas()
        exp = self._brute(emb_df, nq=5, k=5)
        hits = total = 0
        for qid, ranked in exp.items():
            want = {nid for _, nid in ranked}
            have = set(got[got.query_id == qid].neighbor_id)
            hits += len(want & have)
            total += len(want)
        assert hits / total >= 0.6
        # every returned score must be the true cosine (IVF prunes
        # candidates, never alters scoring)
        brute_all = {(q, n): s for q, rr in exp.items() for s, n in rr}
        for r in got.itertuples():
            if (r.query_id, r.neighbor_id) in brute_all:
                assert abs(r.score - round(brute_all[(r.query_id,
                                                      r.neighbor_id)], 6)) < 1e-6

    def test_knn_ivf_empty_corpus(self, ray_session, emb_df):
        """Regression: an empty corpus yielded zero train batches into the
        centroid-sample concat."""
        from ai_bangladesh_address_parser_ray.functions.similarity import (
            knn_ivf)
        import ray.data
        empty = ray.data.from_pandas(pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"),
             "embedding": pd.Series([], dtype="object")}))
        mat = np.asarray([np.asarray(v, np.float64)
                          for v in emb_df.embedding.head(2)])
        out = knn_ivf(empty, mat, emb_df.vec_id.head(2).tolist(), k=3)
        assert out.num_rows == 0


# ------------------------------------------------------ text analysis ----

class TestTextAnalysis:
    def test_token_counts_match_python(self, ray_session, docs_df):
        import re
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            BPE_RE, token_counts)
        got = token_counts(_docs_ds()).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp_tok = docs_df.sort_values("doc_id").text \
            .map(lambda t: len(t.split())).to_numpy()
        exp_bpe = docs_df.sort_values("doc_id").text \
            .map(lambda t: len(re.findall(BPE_RE, t))).to_numpy()
        assert (got.n_tokens.to_numpy() == exp_tok).all()
        assert (got.n_bpe_tokens.to_numpy() == exp_bpe).all()

    def test_quality_scores_bounded(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            quality_scores)
        got = quality_scores(_docs_ds()).to_pandas()
        assert ((got.quality >= 0) & (got.quality <= 1)).all()
        assert ((got.punct_ratio >= 0) & (got.punct_ratio <= 1)).all()

    def test_lang_id_scripts(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            lang_id_one)
        assert lang_id_one("ঢাকা মিরপুর রোড নম্বর")[0] == "bn"
        assert lang_id_one("的 是 不 了 人 我 在 有 他")[0] == "zh"
        assert lang_id_one("the cat is on the mat and it is fine")[0] == "en"
        assert lang_id_one("el perro y la casa de los que se fueron")[0] == "es"
        assert lang_id_one("")[0] == "und"

    def test_fingerprints_deterministic(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            fingerprints)
        a = fingerprints(_docs_ds()).to_pandas().sort_values("doc_id")
        b = fingerprints(_docs_ds()).to_pandas().sort_values("doc_id")
        assert (a.fingerprint.to_numpy() == b.fingerprint.to_numpy()).all()

    # planted corpus: boilerplate, PII, and tokenizer edge cases the
    # driver documents never contain — the real evidence for the two ops
    _PLANT = [
        (0, "spam spam spam spam spam"),                    # one-word doc
        (1, "the cat sat on the mat the cat sat again"),
        (2, ""),                                            # empty
        (3, "   "),                                         # blanks only
        (4, "one"),                                         # no bigram
        (5, "buy now buy now buy now limited offer"),
        (6, None),                                          # null text
        (7, "contact me at alice.smith+x@example.co.uk or "
            "bob@test.org today"),
        (8, "see https://example.com/a?b=c#d and http://x.io now"),
        (9, "call +880 1712-345678 or 01812 345 678 now"),
        (10, "no pii here just words"),
        (11, "mixed: visit https://a.b/c email a@b.cc ring 0123456789"),
    ]

    def _plant_ds(self):
        import pyarrow as pa
        import ray.data
        ids = [i for i, _ in self._PLANT]
        txt = [t for _, t in self._PLANT]
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(txt, pa.string())}))

    def _duckdb_twin(self, sql_key):
        """Run the oracle SQL for ``sql_key`` over the planted corpus."""
        import duckdb
        import sys
        sys.path.insert(0, "/root/repo")
        import __ray_entry__ as E
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", self._PLANT)
        return con.execute(E.oracle_sql()[sql_key]).df() \
            .sort_values("doc_id").reset_index(drop=True)

    def test_repetition_stats_planted_vs_duckdb(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            repetition_stats)
        got = repetition_stats(self._plant_ds()).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp = self._duckdb_twin("repetition_docs")
        for c in ["n_tokens", "unique_ratio", "top_word_frac",
                  "top_bigram_frac"]:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
        row = got.set_index("doc_id")
        assert row.loc[0, "top_word_frac"] == 1.0       # pure boilerplate
        assert row.loc[0, "unique_ratio"] == 0.2
        # "buy now" x3 of 7 bigrams (output is 6dp-rounded, so compare
        # against the rounded quotient, not raw 3/7)
        assert row.loc[5, "top_bigram_frac"] >= 3 / 7 - 1e-6
        assert row.loc[2, "n_tokens"] == 0 and row.loc[3, "n_tokens"] == 0
        assert row.loc[4, "top_bigram_frac"] == 0.0     # no bigram window

    def test_pii_redact_planted_vs_duckdb(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            pii_redact)
        got = pii_redact(self._plant_ds()).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        exp = self._duckdb_twin("pii_redact_docs")
        for c in ["clean_text", "n_urls", "n_emails", "n_phones"]:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
        row = got.set_index("doc_id")
        assert row.loc[7, "n_emails"] == 2
        assert "@" not in row.loc[7, "clean_text"]
        assert row.loc[8, "n_urls"] == 2
        assert "http" not in row.loc[8, "clean_text"]
        assert row.loc[9, "n_phones"] == 2
        assert row.loc[11, "n_urls"] == 1
        assert row.loc[11, "n_emails"] == 1
        assert row.loc[11, "n_phones"] == 1
        assert row.loc[10, "clean_text"] == "no pii here just words"


# -------------------------------------------------------------- stats ----

class TestStats:
    def test_doc_stats_by_lang(self, ray_session, docs_df):
        from ai_bangladesh_address_parser_ray.functions.stats import (
            doc_stats_by_lang)
        got = doc_stats_by_lang(_docs_ds()).to_pandas()
        exp = (docs_df.groupby("lang")["n_chars"]
               .agg(n_docs="size", avg_chars="mean", min_chars="min",
                    max_chars="max").reset_index().sort_values("lang")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_top_k_deterministic_tiebreak(self, ray_session, docs_df):
        from ai_bangladesh_address_parser_ray.functions.stats import (
            top_k_by_count)
        got = top_k_by_count(_docs_ds().select_columns(["source"]),
                             "source", k=10).to_pandas()
        exp = (docs_df.groupby("source").size().rename("n").reset_index()
               .sort_values(["n", "source"], ascending=[False, True])
               .head(10).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[["source", "n"]], exp[["source", "n"]], check_dtype=False)


# --------------------------------------------------------- multimodal ----

class TestMultimodal:
    def test_decode_fake_schema(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            attach_fake_media, decode_stage)
        media = attach_fake_media(_docs_ds())
        out = decode_stage(media, fake=True).to_pandas()
        assert {"media_id", "width", "height", "mean_luma"} <= set(out.columns)
        assert "payload" not in out.columns
        assert len(out) == 500

    def test_decode_real_raises_for_compressed_magics(self):
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            DecodeImage)
        with pytest.raises(NotImplementedError):
            DecodeImage(fake=False)._decode(b"\xff\xd8jpeg...")

    def test_netpbm_roundtrip(self):
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            decode_netpbm, encode_netpbm, nn_resize)
        img = (np.arange(40 * 30, dtype=np.uint64) % 256) \
            .astype(np.uint8).reshape(30, 40)
        np.testing.assert_array_equal(decode_netpbm(encode_netpbm(img)), img)
        rgb = np.dstack([img, img // 2, img // 3])
        np.testing.assert_array_equal(decode_netpbm(encode_netpbm(rgb)), rgb)
        # comment-tolerant header
        hdr = b"P5\n# a comment\n40 30\n255\n" + img.tobytes()
        np.testing.assert_array_equal(decode_netpbm(hdr), img)
        small = nn_resize(img, 8, 8)
        assert small.shape == (8, 8)
        assert small.dtype == np.uint8

    def test_decode_real_pixels(self, ray_session):
        """fake=False over real PGM payloads: width/height/mean_luma are
        the true pixel stats, not hash stand-ins."""
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            attach_fake_media, decode_netpbm, decode_stage)
        media = attach_fake_media(_docs_ds(), real_images=True)
        payloads = {r["media_id"]: r["payload"]
                    for b in media.iter_batches(batch_format="pyarrow")
                    for r in b.to_pylist()}
        out = decode_stage(attach_fake_media(_docs_ds(), real_images=True),
                           fake=False).to_pandas()
        assert len(out) == 500
        for r in out.sample(20, random_state=0).itertuples():
            img = decode_netpbm(payloads[r.media_id])
            assert (r.width, r.height) == (img.shape[1], img.shape[0])
            assert abs(r.mean_luma - img.mean() / 255.0) < 1e-5

    def test_resize_then_decode_composes(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            attach_fake_media, decode_stage, resize_stage)
        media = attach_fake_media(_docs_ds(), real_images=True)
        # two chained actor pools on the 4-cpu test cluster: keep
        # concurrency at 1+1 so upstream map tasks still get CPUs
        out = decode_stage(resize_stage(media, out_w=16, out_h=12,
                                        concurrency=1),
                           fake=False, concurrency=1).to_pandas()
        assert (out.width == 16).all() and (out.height == 12).all()
        assert out.mean_luma.between(0, 1).all()

    def test_frame_sample_explodes(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.multimodal import (
            attach_fake_media, frame_sample_stage)
        media = attach_fake_media(_docs_ds())
        out = frame_sample_stage(media, n_frames=4).to_pandas()
        assert len(out) == 500 * 4
        assert out.groupby("media_id").frame_idx.nunique().eq(4).all()


class TestEmbeddingLshOvercap:
    """VERDICT r2 #2: the sign-LSH scale path must never silently truncate
    an over-cap bucket — identical vectors collapse first (full recall),
    distinct over-cap reps degrade to a window with oversized=1."""

    def _mk_ds(self, n_distinct, dup_per, dim=16, seed=3):
        import ray.data
        rng = np.random.RandomState(seed)
        base = np.abs(rng.standard_normal(dim)) + 0.5   # one orthant ->
        vecs, ids = [], []                              # one LSH bucket
        for i in range(n_distinct):
            v = base + 0.001 * i                        # distinct, cos ~1
            v = v / np.linalg.norm(v)
            for j in range(dup_per):
                vecs.append(v)                          # exact duplicates
                ids.append(i * dup_per + j)
        df = pd.DataFrame({"vec_id": ids,
                           "embedding": [list(v) for v in vecs]})
        return ray.data.from_pandas(df)

    def test_overcap_bucket_flags_and_keeps_duplicates(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            _embedding_pairs_lsh,
        )
        ds = self._mk_ds(n_distinct=12, dup_per=3)
        tbl = ds.select_columns(["vec_id", "embedding"])
        # cap=4 << 12 distinct reps -> every bucket is over-cap
        got = _embedding_pairs_lsh(tbl, tau=0.9999, id_col="vec_id",
                                   vec_col="embedding", bands=4, rows=4,
                                   cap=4, window=2).to_pandas()
        assert "oversized" in got.columns
        assert (got.oversized == 1).all()
        # exact duplicates collapsed BEFORE the cap: all C(3,2) pairs per
        # distinct vector survive even though the bucket is over-cap
        pairs = set(zip(got.a_id, got.b_id))
        for i in range(12):
            members = [i * 3, i * 3 + 1, i * 3 + 2]
            for x in range(3):
                for y in range(x + 1, 3):
                    assert (members[x], members[y]) in pairs, (i, x, y)

    def test_undercap_bucket_is_exact_and_unflagged(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.dedup import (
            _embedding_pairs_lsh,
        )
        ds = self._mk_ds(n_distinct=6, dup_per=2)
        tbl = ds.select_columns(["vec_id", "embedding"])
        got = _embedding_pairs_lsh(tbl, tau=0.99, id_col="vec_id",
                                   vec_col="embedding", bands=4, rows=4,
                                   cap=512).to_pandas()
        assert (got.oversized == 0).all()
        # near-identical fixture: all-pairs expected
        n = 12
        assert len(set(zip(got.a_id, got.b_id))) == n * (n - 1) // 2
