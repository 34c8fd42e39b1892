"""Direct unit tests for the Arrow-native bucket group fns (VERDICT r2 #9).

These exercise the per-bucket callables OUTSIDE Ray (no session needed):
the contract is pa.Table in -> pa.Table out with a schema that is stable
between empty and non-empty buckets, and the pandas adapter
(`_pairs_from_bucket`) staying elementwise-equal to the Arrow path.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS
from ai_bangladesh_address_parser_ray.functions.dedup import (
    _SIG_COL, _banded_bucket_pairs_fn, _lists_to_2d, _pair_schema)
from ai_bangladesh_address_parser_ray.stages.pairs import (
    _bucket_arrays, _count_hot, _pairs_core, _pairs_from_bucket, PAIR_COLUMNS)


def _mention_table(rows):
    """rows: list of (block_key, node_id, road, house)"""
    data = {
        "block_key": [r[0] for r in rows],
        "node_id": [r[1] for r in rows],
    }
    for f in COMPONENT_FIELDS:
        data[f] = [""] * len(rows)
    data["road"] = [r[2] for r in rows]
    data["house_number"] = [r[3] for r in rows]
    return pa.table(data)


class TestPairsArrowPath:
    def test_core_matches_pandas_adapter(self):
        tbl = _mention_table([
            ("ad:x", "c1:0", "Road 5", "12"),
            ("ad:x", "c2:0", "Road 5", "12"),
            ("ad:x", "c3:0", "Road 7", "9"),
            ("ad:y", "c4:0", "", ""),
        ])
        out = _pairs_core(*_bucket_arrays(tbl), cap=64, window=8)
        df = _pairs_from_bucket(tbl.to_pandas(), cap=64, window=8)
        assert out is not None
        assert sorted(out.keys()) == sorted(df.columns)
        got = set(zip(out["u"], out["v"]))
        want = set(zip(df["u"], df["v"]))
        assert got == want and len(got) == 3       # C(3,2) within ad:x
        assert list(df["pair_key"]) == list(out["pair_key"])

    def test_duplicate_node_rows_collapse(self):
        tbl = _mention_table([
            ("ad:x", "c1:0", "Road 5", "12"),
            ("ad:x", "c1:0", "Road 5", "12"),    # duplicate (key, node)
            ("ad:x", "c2:0", "Road 5", "12"),
        ])
        out = _pairs_core(*_bucket_arrays(tbl), cap=64, window=8)
        assert len(out["u"]) == 1                 # one pair, not three

    def test_empty_and_single_row_return_none(self):
        assert _pairs_core(
            *_bucket_arrays(_mention_table([])), cap=8, window=2) is None
        assert _pairs_core(
            *_bucket_arrays(_mention_table([("ad:x", "c1:0", "", "")])),
            cap=8, window=2) is None

    def test_same_ext_flags_identical_extractions(self):
        tbl = _mention_table([
            ("ad:x", "c1:0", "Road 5", "12"),
            ("ad:x", "c2:0", "Road 5", "12"),     # same components
            ("ad:x", "c3:0", "Road 9", "77"),     # different
        ])
        out = _pairs_core(*_bucket_arrays(tbl), cap=64, window=8)
        by_pair = dict(zip(zip(out["u"], out["v"]), out["same_ext"]))
        assert by_pair[("c1:0", "c2:0")]
        assert not by_pair[("c1:0", "c3:0")]


class TestDedupArrowPath:
    def _band_table(self, n_rows, n_sigs=4, ids=None, key="b0"):
        ids = ids if ids is not None else list(range(n_rows))
        sig = list(np.arange(n_sigs, dtype=np.uint64))
        return pa.table({
            "band_key": pa.array([key] * n_rows),
            "doc_id": pa.array(ids, pa.int64()),
            _SIG_COL: pa.array([sig] * n_rows, pa.list_(pa.uint64())),
        })

    def test_identical_sigs_pair_fully(self):
        fn = _banded_bucket_pairs_fn("doc_id", est_threshold=0.5, cap=512,
                                     window=16, expand="all")
        out = fn(self._band_table(3))
        assert isinstance(out, pa.Table)
        assert out.num_rows == 3                   # C(3,2)
        assert out["est_jaccard"].to_pylist() == [1.0, 1.0, 1.0]
        assert out["oversized"].to_pylist() == [0, 0, 0]

    def test_empty_bucket_schema_stable(self):
        fn = _banded_bucket_pairs_fn("doc_id", est_threshold=0.5, cap=512,
                                     window=16, expand="all")
        nonempty = fn(self._band_table(3))
        empty = fn(self._band_table(1))
        assert empty.num_rows == 0
        assert empty.schema.equals(nonempty.schema)

    def test_pair_schema_mirrors_id_type(self):
        t_int = self._band_table(2)
        t_str = pa.table({
            "band_key": pa.array(["b0", "b0"]),
            "doc_id": pa.array(["a", "b"], pa.string()),
            _SIG_COL: pa.array([[np.uint64(1)]] * 2, pa.list_(pa.uint64())),
        })
        s_int = _pair_schema(t_int, "doc_id", {"x": pa.float64()})
        s_str = _pair_schema(t_str, "doc_id", {"x": pa.float64()})
        assert s_int.schema.field("a_id").type == pa.int64()
        assert s_str.schema.field("a_id").type == pa.string()

    def test_lists_to_2d_zero_copy_shape(self):
        arr = pa.array([[1, 2, 3], [4, 5, 6]], pa.list_(pa.uint64()))
        m = _lists_to_2d(arr, np.uint64)
        assert m.shape == (2, 3) and m.dtype == np.uint64
        assert m[1, 2] == 6
        # sliced (non-zero offset) chunked input still correct
        chunked = pa.chunked_array([arr]).slice(1, 1)
        m2 = _lists_to_2d(chunked, np.uint64)
        assert m2.shape == (1, 3) and m2[0, 0] == 4

    def test_ragged_lists_fall_back(self):
        arr = pa.array([[1, 2], [3]], pa.list_(pa.uint64()))
        m = _lists_to_2d(arr, np.uint64)
        assert len(m) == 2                          # object fallback path


# Reduce fn for the exchange tests: the library's own salt-count fn with
# thresh=0 returns (block_key, len) for every key in the partition. Using a
# library-module fn (not one defined here) keeps it importable on Ray
# workers, which do not have tests/ on their path.


class TestHashExchange:
    """Unit contract of the manual two-stage exchange that replaced the
    Dataset sort shuffle in the pairs/salt stages (stages/pairs.py)."""

    def _blocks(self, n_keys=97, rows_per_key=13, n_blocks=7):
        rng = np.random.default_rng(7)
        keys = np.repeat([f"k{i:03d}" for i in range(n_keys)], rows_per_key)
        vals = np.arange(len(keys))
        order = rng.permutation(len(keys))
        keys, vals = keys[order], vals[order]
        cuts = np.linspace(0, len(keys), n_blocks + 1).astype(int)
        return [pa.table({"block_key": keys[a:b], "v": vals[a:b]})
                for a, b in zip(cuts[:-1], cuts[1:])]

    def test_counts_match_global_groupby_and_colocate(self, ray_session):
        import ray
        from ai_bangladesh_address_parser_ray.stages.pairs import (
            _hash_exchange)
        blocks = self._blocks()
        refs = [ray.put(b) for b in blocks]
        for P in (1, 3, 8):
            parts = [p for p in ray.get(_hash_exchange(refs, P, _count_hot, {"thresh": 0}))
                     if p.num_rows]
            # co-location: a key's rows land in exactly ONE partition
            per_part_keys = [set(p["block_key"].to_pylist()) for p in parts]
            for i in range(len(per_part_keys)):
                for j in range(i + 1, len(per_part_keys)):
                    assert not (per_part_keys[i] & per_part_keys[j])
            got = pa.concat_tables(parts).to_pandas() \
                .sort_values("block_key").reset_index(drop=True)
            want = pa.concat_tables(blocks).to_pandas() \
                .groupby("block_key").size().rename("len").reset_index()
            pd.testing.assert_frame_equal(
                got, want.astype({"len": got["len"].dtype}))

    def test_empty_partitions_keep_schema(self, ray_session):
        import ray
        from ai_bangladesh_address_parser_ray.stages.pairs import (
            _hash_exchange)
        # 2 keys into 16 partitions -> >=14 partitions see zero rows and
        # must still return a typed (possibly empty) table
        blocks = [pa.table({"block_key": ["a", "b"], "v": [1, 2]})]
        refs = [ray.put(b) for b in blocks]
        parts = ray.get(_hash_exchange(refs, 16, _count_hot, {"thresh": 0}))
        assert len(parts) == 16
        for p in parts:
            assert p.schema.names == ["block_key", "len"]
        total = sum(p["len"].to_pylist() and sum(p["len"].to_pylist()) or 0
                    for p in parts)
        assert total == 2


class TestPairsStagePartitionInvariance:
    """candidate_pairs_stage through the REAL manual exchange: the pair /
    edge set must not depend on the partition count (co-location is the
    only thing the exchange provides; P is a pure parallelism knob)."""

    def _blocked_ds(self, ray_session):
        import ray.data
        rng = np.random.default_rng(23)
        rows = []
        for b in range(30):                      # 30 blocks, 2-20 rows
            for j in range(2 + int(rng.integers(0, 19))):
                rows.append((f"bk{b:02d}", f"n{b:02d}_{j:02d}",
                             f"road {b % 7}",
                             str((b * 13 + j * (j % 3)) % 40)))
        return ray.data.from_arrow(_mention_table(rows))

    def _pair_set(self, ds):
        out = set()
        for b in ds.iter_batches(batch_format="pyarrow"):
            for u, v in zip(b["u"].to_pylist(), b["v"].to_pylist()):
                out.add((min(u, v), max(u, v)))
        return out

    def test_plain_and_scored_invariant_under_p(self, ray_session):
        from ai_bangladesh_address_parser_ray.stages.pairs import (
            candidate_pairs_stage)
        ds = self._blocked_ds(ray_session)
        plain = [self._pair_set(candidate_pairs_stage(ds, num_partitions=p))
                 for p in (1, 3, 8)]
        assert plain[0] and plain[0] == plain[1] == plain[2]
        scored = [self._pair_set(candidate_pairs_stage(
            ds, num_partitions=p, score_threshold=0.85))
            for p in (1, 3, 8)]
        assert scored[0] == scored[1] == scored[2]
        assert scored[0] <= plain[0]     # edges are a scored subset
