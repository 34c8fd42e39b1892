"""Gazetteer built from labeled data (SURVEY A2/S7): mode district /
division, frequency-ordered postal codes, deterministic ties — reference
``/root/reference/src/core/stages/gazetteer.py:58-128`` semantics — plus
dim injection through the extraction kernel and LinkageConfig."""

import os

import pandas as pd
import pytest

from ai_bangladesh_address_parser_ray.kernel.extract import ExtractionKernel
from ai_bangladesh_address_parser_ray.kernel.gazetteer import (
    Gazetteer, build_from_labels, freeze_gazetteer, thaw_gazetteer)

LABELS = [
    # dominant district wins; postal ordered by frequency then code
    {"area": "Testville", "district": "Dhaka", "division": "Dhaka",
     "postal_code": "1401"},
    {"area": "testville", "district": "Dhaka", "division": "Dhaka",
     "postal_code": "1402"},
    {"area": "Testville", "district": "Dhaka", "division": "Dhaka",
     "postal_code": "1402"},
    {"area": "Testville", "district": "Gazipur", "division": "Dhaka",
     "postal_code": "1402"},
    {"area": "Othertown", "district": "Khulna", "division": "Khulna",
     "postal_code": "9100"},
]


class TestBuildFromLabels:
    def test_mode_district_and_postal_frequency(self):
        gaz = build_from_labels(LABELS)
        rec = gaz.lookup_area("Testville")
        assert rec["district"] == "Dhaka"          # 3 votes vs 1
        assert rec["postal_codes"] == ["1402", "1401"]   # 3 vs 1
        assert gaz.district_division("dhaka") == "Dhaka"
        assert gaz.lookup_area("Othertown")["district"] == "Khulna"

    def test_case_insensitive_area_key(self):
        gaz = build_from_labels(LABELS)
        assert gaz.lookup_area("TESTVILLE") is not None

    def test_tie_breaks_deterministic(self):
        rows = [
            {"area": "X", "district": "B", "division": "D",
             "postal_code": "2000"},
            {"area": "X", "district": "A", "division": "D",
             "postal_code": "3000"},
        ]
        gaz = build_from_labels(rows)
        rec = gaz.lookup_area("X")
        assert rec["district"] == "A"              # tie -> lexicographic
        assert rec["postal_codes"] == ["2000", "3000"]

    def test_weighted_rows(self):
        rows = [{"area": "Y", "district": "B", "division": "D",
                 "postal_code": "2000", "n": 5},
                {"area": "Y", "district": "A", "division": "D",
                 "postal_code": "3000", "n": 2}]
        gaz = build_from_labels(rows)
        assert gaz.lookup_area("Y")["district"] == "B"

    def test_freeze_thaw_roundtrip(self):
        gaz = build_from_labels(LABELS)
        gaz2 = thaw_gazetteer(freeze_gazetteer(gaz))
        assert gaz2.areas == gaz.areas
        assert gaz2.district_to_division == gaz.district_to_division


class TestDistributedBuild:
    def test_build_gazetteer_from_dataset(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data
        from ai_bangladesh_address_parser_ray.functions.gazetteer_build \
            import build_gazetteer

        path = str(tmp_path / "labels.parquet")
        pq.write_table(pa.Table.from_pylist(LABELS * 7), path)
        gaz = build_gazetteer(ray.data.read_parquet(path))
        exp = build_from_labels(LABELS)   # counts scale x7: same modes
        assert gaz.lookup_area("Testville") == exp.lookup_area("Testville")
        assert gaz.district_to_division == exp.district_to_division

    def test_kernel_uses_injected_dim(self):
        gaz = build_from_labels(LABELS)
        k = ExtractionKernel(gazetteer=gaz, stages={"geo": False})
        out = k.extract("House 4, Road 1, Testville")
        c = out["components"]
        assert c["area"].lower() == "testville"
        assert c["district"] == "Dhaka"
        assert c["postal_code"] == "1402"          # most-frequent predicted

    def test_linkage_config_labels_path(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data
        from ai_bangladesh_address_parser_ray.pipelines.linkage import (
            LinkageConfig, run_linkage)

        labels_path = str(tmp_path / "labels2.parquet")
        pq.write_table(pa.Table.from_pylist(LABELS), labels_path)
        tr = pa.table({
            "conv_id": ["c0"] * 2,
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": ["user", "user"],
            "text": ["Deliver to House 4, Road 1, Testville",
                     "the weather is nice today"],
            "tool": ["", ""],
            "ts": pa.array([0, 1], pa.timestamp("us")),
        })
        tr_path = str(tmp_path / "tr.parquet")
        pq.write_table(tr, tr_path)
        cfg = LinkageConfig(num_partitions=2, extract_concurrency=2,
                            gazetteer_labels_path=labels_path)
        out = run_linkage(ray.data.read_parquet(tr_path), cfg)
        df = out["turns"].to_pandas().sort_values("turn_idx")
        assert df.iloc[0]["area"].lower() == "testville"
        assert df.iloc[0]["district"] == "Dhaka"
