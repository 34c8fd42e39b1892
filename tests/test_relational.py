"""Relational/stream operators (functions/relational.py) vs DuckDB oracles.

Each test runs the Ray pipeline and the equivalent SQL over the same
sf0.001 driver tables and asserts exact frame equality (int64 cents /
epoch-us outputs, so no float tolerance is needed anywhere)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pandas.testing import assert_frame_equal

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["events", "orders", "customer", "lineitem", "supplier",
              "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (df[cols].sort_values(cols, kind="mergesort")
            .reset_index(drop=True))


def _cmp(ds, sql):
    got = _norm(ds.to_pandas())
    want = _norm(_con().execute(sql).fetch_df())
    assert_frame_equal(got, want, check_dtype=False)


class TestBroadcastJoin:
    def test_left_join_with_misses(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            broadcast_join)
        right = pa.table({"k": pa.array([2, 5, 9], pa.int64()),
                          "name": ["b", "e", "i"]})
        ds = ray.data.from_arrow(pa.table(
            {"k": pa.array([1, 2, 5, 9, 9, 42], pa.int64())}))
        out = _norm(broadcast_join(ds, right, "k", "k").to_pandas())
        assert list(out["name"]) == [None, "b", "e", "i", "i", None]

    def test_orders_customer_names(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            broadcast_join)
        customer = pq.read_table(f"{SF}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
        orders = ray.data.read_parquet(
            f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        _cmp(broadcast_join(orders, customer, "o_custkey", "c_custkey"),
             "SELECT o.o_orderkey, o.o_custkey, c.c_name FROM orders o "
             "LEFT JOIN customer c ON o.o_custkey = c.c_custkey")


class TestRevenueTopk:
    def test_matches_sql(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            revenue_topk)
        customer = pq.read_table(f"{SF}/customer.parquet",
                                 columns=["c_custkey", "c_name"])
        orders = ray.data.read_parquet(
            f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"])
        _cmp(revenue_topk(orders, customer, k=10),
             "SELECT o.o_custkey, CAST(SUM(CAST(round(o.o_totalprice * 100)"
             " AS BIGINT)) AS BIGINT) AS revenue_cents, COUNT(*) AS "
             "n_orders, c.c_name FROM orders o JOIN customer c ON "
             "o.o_custkey = c.c_custkey GROUP BY o.o_custkey, c.c_name "
             "ORDER BY revenue_cents DESC, o.o_custkey LIMIT 10")


class TestSessionize:
    def test_matches_sql(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            sessionize)
        ev = ray.data.read_parquet(f"{SF}/events.parquet",
                                   columns=["user_id", "ts"])
        _cmp(sessionize(ev, gap_s=1800), """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id, ts_us, CAST(SUM(new_s) OVER
      (PARTITION BY user_id ORDER BY ts_us) AS BIGINT) AS session_id FROM e)
SELECT user_id, session_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
  COUNT(*) AS n_events, MAX(ts_us) - MIN(ts_us) AS duration_us
FROM s GROUP BY user_id, session_id""")

    def test_gap_boundary_and_singletons(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            sessionize)
        us = 1_000_000
        tbl = pa.table({
            "user_id": pa.array([7, 7, 7, 7, 3], pa.int64()),
            # gaps: exactly 1800s (same session), 1801s (new session)
            "ts": pa.array([0, 1800 * us, 1800 * us + 1801 * us,
                            1800 * us + 1801 * us + 5, 99 * us],
                           pa.timestamp("us")),
        })
        out = sessionize(ray.data.from_arrow(tbl), gap_s=1800) \
            .to_pandas().sort_values(["user_id", "session_id"]) \
            .reset_index(drop=True)
        assert out[out.user_id == 7].n_events.tolist() == [2, 2]
        assert out[out.user_id == 3].n_events.tolist() == [1]
        assert out[out.user_id == 7].session_id.tolist() == [1, 2]

    def test_hot_key_guard_raises(self, ray_session):
        """One user exceeding hot_key_limit rows must RAISE with the key
        named (VERDICT r3 #5); the same data passes under a higher limit."""
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            sessionize)
        n = 40
        tbl = pa.table({
            "user_id": pa.array([7] * n + [3], pa.int64()),
            "ts": pa.array(list(range(n)) + [5], pa.timestamp("us")),
        })
        with pytest.raises(Exception, match="hot_key_limit"):
            sessionize(ray.data.from_arrow(tbl), gap_s=1800,
                       hot_key_limit=8).to_pandas()
        out = sessionize(ray.data.from_arrow(tbl), gap_s=1800,
                         hot_key_limit=n).to_pandas()
        assert set(out.user_id) == {3, 7}


class TestAsofJoin:
    def test_matches_duckdb_asof(self, ray_session):
        import __ray_entry__ as E
        _cmp(E.queries()["asof_signup_attribution"](SF),
             E.oracle_sql()["asof_signup_attribution"])

    def test_no_prior_right_row_is_null(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            asof_join)
        left = ray.data.from_arrow(pa.table({
            "u": pa.array([1, 1, 2], pa.int64()),
            "t": pa.array([5, 50, 10], pa.int64()),
            "lid": pa.array([100, 101, 102], pa.int64())}))
        right = ray.data.from_arrow(pa.table({
            "u": pa.array([1, 1, 3], pa.int64()),
            "t": pa.array([10, 50, 1], pa.int64()),
            "rid": pa.array([900, 901, 903], pa.int64())}))
        out = asof_join(left, right, by="u", on_us="t",
                        right_payload=["rid"]).to_pandas() \
            .sort_values("lid").reset_index(drop=True)
        # lid=100: t=5 before any right for u=1 -> null
        # lid=101: t=50 matches rid=901 (equal timestamps join)
        # lid=102: u=2 has no right rows -> null (u=3 must not leak)
        assert np.isnan(out.rid[0]) and np.isnan(out.rid[2])
        assert out.rid[1] == 901


class TestRangeAndWindow:
    def test_value_bands_matches_sql(self, ray_session):
        import __ray_entry__ as E
        _cmp(E.queries()["events_value_bands"](SF),
             E.oracle_sql()["events_value_bands"])

    def test_hourly_matches_sql(self, ray_session):
        import __ray_entry__ as E
        _cmp(E.queries()["events_hourly"](SF),
             E.oracle_sql()["events_hourly"])

    def test_out_of_band_rows_drop(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            range_join_agg)
        ds = ray.data.from_arrow(pa.table(
            {"value": pa.array([-1.0, 0.0, 99.99, 100.0, 999.99, 1000.0])}))
        out = range_join_agg(ds, [0.0, 100.0, 250.0, 1000.0],
                             ["low", "mid", "high"]).to_pandas()
        assert out.set_index("band").n.to_dict() == {
            "low": 2, "mid": 1, "high": 1}


class TestHashJoin:
    def test_inner_join_matches_sql(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            hash_join)
        li = ray.data.read_parquet(f"{SF}/lineitem.parquet",
                                   columns=["l_orderkey", "l_quantity"])
        o = ray.data.read_parquet(f"{SF}/orders.parquet",
                                  columns=["o_orderkey", "o_orderstatus"])
        got = hash_join(li, o, on="l_orderkey", right_on="o_orderkey",
                        num_partitions=4) \
            .select_columns(["l_orderkey", "l_quantity", "o_orderstatus"])
        _cmp(got,
             "SELECT l.l_orderkey, l.l_quantity, o.o_orderstatus "
             "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey")


class TestTpchShapes:
    def test_unshipped_revenue_topk(self, ray_session):
        import __ray_entry__ as E
        _cmp(E.queries()["unshipped_revenue_topk"](SF),
             E.oracle_sql()["unshipped_revenue_topk"])

    def test_regional_nation_volume(self, ray_session):
        import __ray_entry__ as E
        _cmp(E.queries()["regional_nation_volume"](SF),
             E.oracle_sql()["regional_nation_volume"])

    def test_unshipped_hash_join_path_identical(self, ray_session):
        """Both physical strategies (broadcast-gated vs big x big hash
        join) must produce the identical top-k."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            unshipped_revenue_topk,
        )
        cutoff = int(np.datetime64("1998-06-01", "us").astype(np.int64))

        def run(limit):
            li = ray.data.read_parquet(
                f"{SF}/lineitem.parquet",
                columns=["l_orderkey", "l_extendedprice", "l_discount",
                         "l_shipdate"])
            od = ray.data.read_parquet(
                f"{SF}/orders.parquet",
                columns=["o_orderkey", "o_custkey", "o_orderdate",
                         "o_orderpriority"])
            cu = pq.read_table(f"{SF}/customer.parquet",
                               columns=["c_custkey", "c_mktsegment"])
            return unshipped_revenue_topk(
                li, od, cu, segment="BUILDING", cutoff_us=cutoff, k=10,
                broadcast_limit=limit).to_pandas()

        bcast = run(2_000_000)
        hashj = run(0)                       # force the hash-join path
        assert_frame_equal(_norm(bcast), _norm(hashj), check_dtype=False)

    def test_unshipped_no_surviving_orders(self, ray_session):
        """Regression: a segment x date filter that kills EVERY order left
        the broadcast path concatenating zero batches."""
        import numpy as np
        import pyarrow.parquet as pq
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            unshipped_revenue_topk,
        )
        li = ray.data.read_parquet(
            f"{SF}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount",
                     "l_shipdate"])
        od = ray.data.read_parquet(
            f"{SF}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate",
                     "o_orderpriority"])
        cu = pq.read_table(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
        # cutoff before every order date -> zero survivors
        cutoff = int(np.datetime64("1970-01-02", "us").astype(np.int64))
        out = unshipped_revenue_topk(li, od, cu, segment="BUILDING",
                                     cutoff_us=cutoff, k=10).to_pandas()
        assert len(out) == 0


class TestSlidingWindow:
    def test_matches_sql(self, ray_session):
        import __ray_entry__ as E
        _cmp(E.queries()["events_sliding"](SF),
             E.oracle_sql()["events_sliding"])

    def test_each_event_in_width_over_slide_windows(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            sliding_window_agg)
        us = 1_000_000
        # one event at t=3600s: windows starting at 0 and 3600 (w=7200,s=3600)
        tbl = pa.table({
            "ts": pa.array([3600 * us], pa.timestamp("us")),
            "event_type": ["x"],
            "value": [1.0]})
        out = sliding_window_agg(ray.data.from_arrow(tbl),
                                 width_s=7200, slide_s=3600).to_pandas()
        assert sorted(out.window_us // us) == [0, 3600]
        assert out.n.tolist() == [1, 1]


class TestLangIdOracle:
    def test_matches_sql(self, ray_session):
        import __ray_entry__ as E
        got = _norm(E.queries()["lang_id_docs"](SF).to_pandas())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        want = _norm(con.execute(E.oracle_sql()["lang_id_docs"]).fetch_df())
        # exact float equality on scores: both sides are the same raw
        # int/int IEEE division
        assert_frame_equal(got, want, check_dtype=False, check_exact=True)


class TestSemiAntiDistinct:
    def _sides(self, ray_session):
        import ray.data
        left = pa.table({"k": [1, 2, 3, 4], "name": ["a", "b", "c", "d"]})
        right = pa.table({"rk": [2, 2, 4, 9]})
        return (ray.data.from_arrow(left), ray.data.from_arrow(right))

    def test_semi_join_no_duplication(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.relational import (
            semi_join,
        )
        l, r = self._sides(ray_session)
        out = semi_join(l, r, on="k", right_on="rk").to_pandas()
        # k=2 matches TWO right rows but appears ONCE; right cols dropped
        assert sorted(out["k"]) == [2, 4]
        assert list(out.columns) == ["k", "name"]

    def test_anti_join_complement(self, ray_session):
        from ai_bangladesh_address_parser_ray.functions.relational import (
            anti_join, semi_join,
        )
        l, r = self._sides(ray_session)
        semi = semi_join(l, r, on="k", right_on="rk").to_pandas()
        anti = anti_join(l, r, on="k", right_on="rk").to_pandas()
        assert sorted(anti["k"]) == [1, 3]
        assert sorted(list(semi["k"]) + list(anti["k"])) == [1, 2, 3, 4]

    def test_distinct_count_collapses_duplicates(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            distinct_count,
        )
        tbl = pa.table({
            "g": ["x"] * 5 + ["y"] * 3,
            "u": [1, 1, 1, 2, 2, 7, 7, 7],
        })
        out = distinct_count(ray.data.from_arrow(tbl), "g", "u").to_pandas()
        assert out.set_index("g")["n_distinct"].to_dict() == {"x": 2, "y": 1}

    def test_new_queries_match_sql(self, ray_session):
        import __ray_entry__ as E
        con = duckdb.connect()
        for t in ("customer", "orders", "events"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{SF}/{t}.parquet')")
        for q in ("customers_no_urgent_orders", "urgent_customers",
                  "events_distinct_users"):
            got = _norm(E.queries()[q](SF).to_pandas())
            want = _norm(con.execute(E.oracle_sql()[q]).fetch_df())
            assert_frame_equal(got, want, check_dtype=False), q

    def test_empty_right_side_degrades_correctly(self, ray_session):
        """A right side that filters to ZERO rows must give the correct
        set answer, not a lost-schema Acero abort (null-key sentinel)."""
        import pyarrow.compute as pc
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            anti_join, semi_join,
        )
        left = ray.data.from_arrow(
            pa.table({"k": [1, 2, 3], "name": ["a", "b", "c"]}))
        right = ray.data.from_arrow(
            pa.table({"rk": [5] * 10})).map_batches(
            lambda t: t.filter(pc.greater(t["rk"], 99)),
            batch_format="pyarrow")
        anti = anti_join(left, right, on="k", right_on="rk").to_pandas()
        semi = semi_join(left, right, on="k", right_on="rk").to_pandas()
        assert sorted(anti["name"]) == ["a", "b", "c"]
        # (an all-empty RESULT loses column names through to_pandas — a
        # Ray empty-dataset artifact, distinct from the crash this guards)
        assert len(semi) == 0

    def test_null_left_keys_never_match(self, ray_session):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            anti_join, semi_join,
        )
        left = ray.data.from_arrow(pa.table({
            "k": pa.array([1, 2, None], pa.int64()),
            "name": ["a", "b", "n"]}))
        right = ray.data.from_arrow(pa.table({"rk": pa.array([2],
                                                             pa.int64())}))
        anti = anti_join(left, right, on="k", right_on="rk").to_pandas()
        semi = semi_join(left, right, on="k", right_on="rk").to_pandas()
        assert sorted(anti["name"]) == ["a", "n"]   # null key: no match
        assert sorted(semi["name"]) == ["b"]


class TestSetOpsProperty:
    """Randomized set-op properties vs DuckDB (hypothesis). Ray sessions
    are expensive per example, so each example stays tiny and max_examples
    low — the deterministic structure (dup keys, nulls, empty sides) is
    what the strategy explores."""

    from hypothesis import given, settings
    from hypothesis import strategies as st

    _keys = st.lists(st.one_of(st.integers(0, 8), st.none()),
                     min_size=0, max_size=12)

    @given(left=_keys, right=_keys)
    @settings(max_examples=12, deadline=None)
    def test_semi_anti_match_duckdb(self, ray_session, left, right):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            anti_join, semi_join,
        )
        if not left:
            return                       # empty LEFT: nothing to assert on
        lt = pa.table({"k": pa.array(left, pa.int64()),
                       "i": pa.array(range(len(left)), pa.int64())})
        rt = pa.table({"rk": pa.array(right, pa.int64())})
        lds = ray.data.from_arrow(lt)
        rds = ray.data.from_arrow(rt)
        semi = semi_join(lds, rds, on="k", right_on="rk").to_pandas()
        anti = anti_join(lds, rds, on="k", right_on="rk").to_pandas()
        con = duckdb.connect()
        con.register("l", lt.to_pandas())
        con.register("r", rt.to_pandas())
        want_semi = con.execute(
            "SELECT i FROM l WHERE EXISTS "
            "(SELECT 1 FROM r WHERE r.rk = l.k)").fetch_df()
        want_anti = con.execute(
            "SELECT i FROM l WHERE NOT EXISTS "
            "(SELECT 1 FROM r WHERE r.rk = l.k)").fetch_df()
        got_semi = sorted(semi["i"]) if len(semi) else []
        got_anti = sorted(anti["i"]) if len(anti) else []
        assert got_semi == sorted(want_semi["i"])
        assert got_anti == sorted(want_anti["i"])
        # partition property: every left row lands in exactly one side
        assert sorted(got_semi + got_anti) == sorted(range(len(left)))

    @given(rows=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.integers(0, 5)),
        min_size=1, max_size=30))
    @settings(max_examples=10, deadline=None)
    def test_distinct_count_matches_duckdb(self, ray_session, rows):
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.relational import (
            distinct_count,
        )
        tbl = pa.table({"g": [r[0] for r in rows],
                        "u": pa.array([r[1] for r in rows], pa.int64())})
        got = distinct_count(ray.data.from_arrow(tbl), "g", "u") \
            .to_pandas().set_index("g")["n_distinct"].to_dict()
        con = duckdb.connect()
        con.register("t", tbl.to_pandas())
        want = dict(con.execute(
            "SELECT g, COUNT(DISTINCT u) FROM t GROUP BY g").fetchall())
        assert got == want
