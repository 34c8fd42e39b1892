"""Window/top-k/quantile/sample/sketch operators (functions/windows.py)
vs DuckDB oracles and analytic ground truth."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from pandas.testing import assert_frame_equal

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["events", "documents", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def _cmp(got, sql):
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    assert_frame_equal(_norm(got), _norm(_con().execute(sql).fetch_df()),
                       check_dtype=False)


class TestPerKeyWindow:
    def test_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            per_key_window)
        ev = ray.data.read_parquet(
            f"{SF}/events.parquet",
            columns=["event_id", "ts", "user_id", "value"])
        _cmp(per_key_window(ev), """
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum_cents,
  CAST(row_number() OVER w AS BIGINT) AS row_rank
FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""")

    def test_single_row_and_ties(self, ray_session):
        """One-event user -> null gap, rank 1; equal ts breaks on
        event_id so the segmented cumsum is deterministic."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            per_key_window)
        t = pa.table({
            "event_id": pa.array([3, 1, 2, 9], pa.int64()),
            "ts": pa.array([100, 100, 100, 50], pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "value": [1.0, 2.0, 3.0, 4.0],
        })
        out = per_key_window(ray.data.from_arrow(t), n_buckets=4) \
            .to_pandas().sort_values(["user_id", "row_rank"]) \
            .reset_index(drop=True)
        assert list(out["event_id"]) == [1, 2, 3, 9]
        assert list(out["row_rank"]) == [1, 2, 3, 1]
        assert list(out["run_sum_cents"]) == [200, 500, 600, 400]
        assert pd.isna(out["gap_us"][0]) and pd.isna(out["gap_us"][3])
        assert list(out["gap_us"][1:3]) == [0, 0]

    def test_hot_key_guard_raises(self, ray_session):
        """A key with more rows than hot_key_limit must RAISE with the key
        named — never silently degrade (VERDICT r3 #5: mirror the pairs
        stage's skew observability). Normal keys under the limit pass."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            per_key_window)
        n = 50
        t = pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(range(n), pa.timestamp("us")),
            "user_id": pa.array([7] * n, pa.int64()),
            "value": [1.0] * n,
        })
        with pytest.raises(Exception, match="hot_key_limit"):
            per_key_window(ray.data.from_arrow(t), n_buckets=4,
                           hot_key_limit=10).to_pandas()
        # under the limit: same data passes untouched
        out = per_key_window(ray.data.from_arrow(t), n_buckets=4,
                             hot_key_limit=n).to_pandas()
        assert len(out) == n


class TestGroupedTopk:
    def test_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_topk)
        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet",
            columns=["doc_id", "lang", "n_chars"])
        _cmp(grouped_topk(docs, "lang", "n_chars", "doc_id", k=5), """
SELECT lang, n_chars, doc_id, rank FROM (
  SELECT lang, n_chars, doc_id,
    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
    AS rank FROM documents) WHERE rank <= 5""")

    def test_group_smaller_than_k(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_topk)
        t = pa.table({"g": ["a", "a", "b"],
                      "v": pa.array([1, 5, 2], pa.int64()),
                      "id": pa.array([10, 11, 12], pa.int64())})
        out = _norm(grouped_topk(ray.data.from_arrow(t), "g", "v", "id",
                                 k=10).to_pandas())
        assert len(out) == 3
        assert set(zip(out["g"], out["rank"])) == {("a", 1), ("a", 2),
                                                   ("b", 1)}

    def test_local_prune_never_drops(self, ray_session):
        """A group spread across many blocks must still produce the
        global top-k (the per-batch cut keeps k per key per batch)."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_topk)
        rng = np.random.default_rng(7)
        v = rng.permutation(1000).astype(np.int64)
        t = pa.table({"g": ["x"] * 1000, "v": v,
                      "id": pa.array(np.arange(1000), pa.int64())})
        ds = ray.data.from_arrow(t).repartition(20)
        out = grouped_topk(ds, "g", "v", "id", k=3).to_pandas() \
            .sort_values("rank")
        assert list(out["v"]) == [999, 998, 997]


class TestGroupedQuantiles:
    def test_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_quantiles)
        ev = ray.data.read_parquet(f"{SF}/events.parquet",
                                   columns=["event_type", "value"])
        _cmp(grouped_quantiles(ev), """
WITH c AS (SELECT event_type,
           CAST(round(value*100) AS BIGINT) AS cents FROM events),
tot AS (SELECT event_type, COUNT(*) AS n FROM c GROUP BY 1),
h AS (SELECT event_type, cents, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
r AS (SELECT event_type, cents,
      SUM(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS cum FROM h)
SELECT t.event_type, t.n,
 (SELECT MIN(cents) FROM r WHERE r.event_type = t.event_type
  AND cum >= ceil(0.25*t.n)) AS p25_cents,
 (SELECT MIN(cents) FROM r WHERE r.event_type = t.event_type
  AND cum >= ceil(0.5*t.n)) AS p50_cents,
 (SELECT MIN(cents) FROM r WHERE r.event_type = t.event_type
  AND cum >= ceil(0.9*t.n)) AS p90_cents
FROM tot t""")

    def test_known_distribution(self, ray_session):
        """cents 1..100 once each: inverse-CDF quantiles are exactly
        ceil(q*100)."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_quantiles)
        t = pa.table({"event_type": ["u"] * 100,
                      "value": (np.arange(1, 101) / 100.0)})
        out = grouped_quantiles(
            ray.data.from_arrow(t).repartition(7)).to_pandas()
        assert out.iloc[0]["p25_cents"] == 25
        assert out.iloc[0]["p50_cents"] == 50
        assert out.iloc[0]["p90_cents"] == 90
        assert out.iloc[0]["n"] == 100


class TestSampleMd5:
    def test_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            sample_topk_md5)
        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet",
            columns=["doc_id", "lang", "source"])
        got = sample_topk_md5(docs, "doc_id", 50, ["lang", "source"])
        _cmp(got.to_pandas(), """
SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS h
FROM documents ORDER BY h, doc_id LIMIT 50""")

    def test_partition_invariant(self, ray_session):
        """The sample is a pure function of the data, not the layout."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            sample_topk_md5)
        t = pa.table({"doc_id": pa.array(np.arange(500), pa.int64()),
                      "x": pa.array(np.arange(500), pa.int64())})
        a = sample_topk_md5(ray.data.from_arrow(t), "doc_id", 20,
                            ["x"]).to_pandas()
        b = sample_topk_md5(ray.data.from_arrow(t).repartition(13),
                            "doc_id", 20, ["x"]).to_pandas()
        assert_frame_equal(_norm(a), _norm(b))


class TestHll:
    def test_error_bound_at_scale(self, ray_session):
        """p=12 -> ~1.6% standard error; assert < 5% at 100k distinct."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            hll_distinct)
        rng = np.random.default_rng(3)
        vals = rng.integers(0, 100_000, size=300_000)
        t = pa.table({"g": ["big"] * len(vals),
                      "v": pa.array(vals, pa.int64())})
        exact = len(np.unique(vals))
        out = hll_distinct(ray.data.from_arrow(t).repartition(16),
                           "g", "v").to_pandas()
        est = int(out.iloc[0]["approx_distinct"])
        assert abs(est - exact) / exact < 0.05, (est, exact)

    def test_small_range_linear_counting(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            hll_distinct)
        t = pa.table({"g": ["s"] * 40, "v": pa.array(
            list(range(10)) * 4, pa.int64())})
        out = hll_distinct(ray.data.from_arrow(t), "g", "v").to_pandas()
        assert int(out.iloc[0]["approx_distinct"]) == 10

    def test_merge_is_partition_invariant(self, ray_session):
        """Register max-merge is associative/commutative: estimate must
        not depend on block layout."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            hll_distinct)
        vals = np.arange(5000, dtype=np.int64)
        t = pa.table({"g": ["g"] * 5000, "v": vals})
        a = hll_distinct(ray.data.from_arrow(t), "g", "v").to_pandas()
        b = hll_distinct(ray.data.from_arrow(t).repartition(31),
                         "g", "v").to_pandas()
        assert int(a.iloc[0]["approx_distinct"]) == \
            int(b.iloc[0]["approx_distinct"])

    def test_registers_match_reference_formula(self):
        """Kernel unit check, no Ray: a hash with j leading zero bits in
        its suffix must set register[bucket] to j+1."""
        from ai_bangladesh_address_parser_ray.functions.windows import (
            _hll_registers)
        p = 12
        # bucket 5, suffix with exactly 3 leading zeros after the top
        # p bits: bits 51..0 of (hash << p)
        bucket = np.uint64(5) << np.uint64(64 - p)
        suffix = np.uint64(1) << np.uint64(64 - p - 1 - 3)
        regs = _hll_registers(np.array([bucket | suffix], np.uint64), p)
        assert regs[5] == 4
        assert np.count_nonzero(regs) == 1


class TestRollupPivot:
    def test_rollup_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.stats import (
            rollup_counts)
        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["lang", "source"])
        _cmp(rollup_counts(docs, ["lang", "source"]).to_pandas(),
             "SELECT lang, source, COUNT(*) AS n FROM documents "
             "GROUP BY ROLLUP(lang, source)")

    def test_rollup_levels_sum(self, ray_session):
        """Each rollup level must total the grand total."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.stats import (
            rollup_counts)
        t = pa.table({"a": ["x", "x", "y"], "b": ["1", "2", "1"]})
        out = rollup_counts(ray.data.from_arrow(t), ["a", "b"]).to_pandas()
        grand = out[out["a"].isna() & out["b"].isna()]["n"].iloc[0]
        lvl1 = out[out["a"].notna() & out["b"].isna()]["n"].sum()
        lvl2 = out[out["b"].notna()]["n"].sum()
        assert grand == lvl1 == lvl2 == 3

    def test_rollup_empty_input(self, ray_session):
        """Regression: an empty input yielded zero aggregate batches into
        the finest-level concat; SQL ROLLUP still emits the grand-total
        row with count 0."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.stats import (
            rollup_counts)
        t = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string())})
        out = rollup_counts(ray.data.from_arrow(t), ["a", "b"]).to_pandas()
        assert len(out) == 1
        assert out["a"].isna().all() and out["b"].isna().all()
        assert out["n"].iloc[0] == 0

    def test_pivot_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.stats import (
            pivot_counts)
        langs = ["de", "en", "es", "fr", "zh"]
        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["lang", "source"])
        sql = ("SELECT source, " + ", ".join(
            f"CAST(SUM(CASE WHEN lang='{l}' THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_{l}" for l in langs)
            + ", COUNT(*) AS n_total FROM documents GROUP BY source")
        _cmp(pivot_counts(docs, "source", "lang", langs).to_pandas(), sql)

    def test_pivot_unlisted_value_counts_in_total(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.stats import (
            pivot_counts)
        t = pa.table({"r": ["s", "s", "s"], "c": ["en", "en", "xx"]})
        out = pivot_counts(ray.data.from_arrow(t), "r", "c",
                           ["en"]).to_pandas()
        assert out.iloc[0]["n_en"] == 2 and out.iloc[0]["n_total"] == 3


class TestWindowsProperty:
    """Randomized window/top-k/quantile properties vs DuckDB (hypothesis).
    Tiny examples, low max_examples — the structure explored is dup
    timestamps, single-row users, negative values, and skewed groups."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _rows = st.lists(
        st.tuples(st.integers(0, 3),              # user_id
                  st.integers(0, 5),              # ts seconds
                  st.floats(-5, 5, allow_nan=False, width=16)),
        min_size=1, max_size=25)

    @given(rows=_rows)
    @settings(max_examples=10, deadline=None)
    def test_per_key_window_matches_duckdb(self, ray_session, rows):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            per_key_window)
        tbl = pa.table({
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows],
                           pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        })
        got = _norm(per_key_window(ray.data.from_arrow(tbl),
                                   n_buckets=4).to_pandas())
        con = duckdb.connect()
        con.register("t", tbl.to_pandas())
        want = _norm(con.execute("""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
  CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_sum_cents,
  CAST(row_number() OVER w AS BIGINT) AS row_rank
FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""").fetch_df())
        assert_frame_equal(got, want, check_dtype=False)

    @given(rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 9)),
        min_size=1, max_size=25), k=st.integers(1, 4))
    @settings(max_examples=10, deadline=None)
    def test_grouped_topk_matches_duckdb(self, ray_session, rows, k):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_topk)
        tbl = pa.table({"g": [r[0] for r in rows],
                        "v": pa.array([r[1] for r in rows], pa.int64()),
                        "id": pa.array(range(len(rows)), pa.int64())})
        got = _norm(grouped_topk(ray.data.from_arrow(tbl), "g", "v", "id",
                                 k=k).to_pandas())
        con = duckdb.connect()
        con.register("t", tbl.to_pandas())
        want = _norm(con.execute(f"""
SELECT g, v, id, rank FROM (
  SELECT g, v, id,
    row_number() OVER (PARTITION BY g ORDER BY v DESC, id) AS rank
  FROM t) WHERE rank <= {k}""").fetch_df())
        assert_frame_equal(got, want, check_dtype=False)

    @given(rows=st.lists(
        st.tuples(st.sampled_from(["p", "q"]),
                  st.floats(-3, 3, allow_nan=False, width=16)),
        min_size=1, max_size=30))
    @settings(max_examples=10, deadline=None)
    def test_grouped_quantiles_inverse_cdf(self, ray_session, rows):
        """Quantiles equal the pure-numpy inverse-CDF on the same cents."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_quantiles)
        tbl = pa.table({"event_type": [r[0] for r in rows],
                        "value": pa.array([r[1] for r in rows],
                                          pa.float64())})
        got = grouped_quantiles(ray.data.from_arrow(tbl)) \
            .to_pandas().set_index("event_type")
        vals = {}
        for g, v in rows:
            c = int(np.floor(np.abs(v) * 100 + 0.5)) * (1 if v >= 0 else -1)
            vals.setdefault(g, []).append(c)
        for g, cs in vals.items():
            cs = np.sort(np.array(cs))
            n = len(cs)
            for q, col in [(0.25, "p25_cents"), (0.5, "p50_cents"),
                           (0.9, "p90_cents")]:
                want = cs[int(np.ceil(q * n)) - 1]
                assert got.loc[g, col] == want, (g, col, cs)
            assert got.loc[g, "n"] == n


class TestStratifiedCorrMode:
    def test_stratified_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            stratified_sample_md5)
        docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                     columns=["doc_id", "lang"])
        _cmp(stratified_sample_md5(docs, "lang", "doc_id", 10), """
SELECT lang, h, doc_id, rank FROM (
  SELECT lang, md5(CAST(doc_id AS VARCHAR)) AS h, doc_id,
    row_number() OVER (PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
  FROM documents) WHERE rank <= 10""")

    def test_corr_bit_identical(self, ray_session):
        """Exact integer moments -> the double equals DuckDB's HUGEINT
        computation bit for bit (after the shared engine-independent
        6dp floor round on both sides), under any partitioning."""
        from ai_bangladesh_address_parser_ray.functions.rounding import (
            sql_round6)
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_corr)
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_discount"])
        got = grouped_corr(li.repartition(9), "l_returnflag", "l_quantity",
                           "l_discount", y_cents=True, alias="corr_qd") \
            .to_pandas().sort_values("l_returnflag").reset_index(drop=True)
        want = _con().execute("""
WITH m AS (SELECT l_returnflag, COUNT(*)::HUGEINT AS n,
  SUM(CAST(l_quantity AS HUGEINT)) AS sx,
  SUM(CAST(round(l_discount*100) AS HUGEINT)) AS sy,
  SUM(CAST(l_quantity AS HUGEINT)*CAST(round(l_discount*100) AS HUGEINT))
    AS sxy,
  SUM(CAST(l_quantity AS HUGEINT)*CAST(l_quantity AS HUGEINT)) AS sxx,
  SUM(CAST(round(l_discount*100) AS HUGEINT)
    *CAST(round(l_discount*100) AS HUGEINT)) AS syy
 FROM lineitem GROUP BY 1)
SELECT l_returnflag, """ + sql_round6(
            "CAST(n*sxy - sx*sy AS DOUBLE) / sqrt(CAST(n*sxx - sx*sx "
            "AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))") + """
  AS corr_qd FROM m ORDER BY l_returnflag""").fetch_df()
        assert (got["corr_qd"].values == want["corr_qd"].values).all()

    def test_corr_degenerate_group(self, ray_session):
        """Constant x in a group -> zero variance -> null, not a crash."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_corr)
        t = pa.table({"g": ["c", "c", "v", "v", "v"],
                      "x": pa.array([5, 5, 1, 2, 3], pa.int64()),
                      "y": pa.array([1, 2, 1, 2, 3], pa.int64())})
        out = grouped_corr(ray.data.from_arrow(t), "g", "x", "y") \
            .to_pandas().set_index("g")
        assert pd.isna(out.loc["c", "corr"])
        assert abs(out.loc["v", "corr"] - 1.0) < 1e-12

    def test_mode_vs_duckdb_with_ties(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_mode)
        ev = ray.data.read_parquet(f"{SF}/events.parquet",
                                   columns=["user_id", "event_type"])
        _cmp(grouped_mode(ev, "user_id", "event_type"), """
SELECT user_id, mode, n FROM (
  SELECT user_id, event_type AS mode, COUNT(*) AS n,
    row_number() OVER (PARTITION BY user_id
      ORDER BY COUNT(*) DESC, event_type) AS rk
  FROM events GROUP BY user_id, event_type) WHERE rk = 1""")

    def test_mode_tie_breaks_to_smallest(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.windows import (
            grouped_mode)
        t = pa.table({"g": ["u"] * 4, "v": ["b", "a", "b", "a"]})
        out = grouped_mode(ray.data.from_arrow(t).repartition(3),
                           "g", "v").to_pandas()
        assert out.iloc[0]["mode"] == "a" and out.iloc[0]["n"] == 2


class TestTopTerms:
    def test_vs_duckdb(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            top_terms_per_group)
        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet",
            columns=["doc_id", "text", "lang"]).repartition(5)
        _cmp(top_terms_per_group(docs, k=10), r"""
SELECT lang, term, tf, df, rank FROM (
  SELECT lang, tok AS term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df,
    row_number() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, tok)
      AS rank
  FROM (SELECT doc_id, lang,
        unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS tok
        FROM documents) GROUP BY lang, tok) WHERE rank <= 10""")

    def test_df_counts_docs_not_occurrences(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.text_analysis import (
            top_terms_per_group)
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "lang": ["en", "en"],
                      "text": ["cat cat cat", "cat dog"]})
        out = top_terms_per_group(ray.data.from_arrow(t), k=5) \
            .to_pandas().set_index("term")
        assert out.loc["cat", "tf"] == 4 and out.loc["cat", "df"] == 2
        assert out.loc["dog", "tf"] == 1 and out.loc["dog", "df"] == 1
        assert out.loc["cat", "rank"] == 1
