"""User CLI (`python -m ai_bangladesh_address_parser_ray`) — reference S3
``--demo/--batch/--address`` routing
(``src/core/production_address_extractor.py:1260-1285``)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from ai_bangladesh_address_parser_ray.__main__ import main


class TestKernelCommands:
    def test_address_json(self, capsys):
        rc = main(["--address", "House 12, Road 5, Dhanmondi, Dhaka 1209"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out)
        assert res["components"]["house_number"] == "12"
        assert res["components"]["area"] == "Dhanmondi"
        assert res["overall_confidence"] > 0.5

    def test_demo_runs(self, capsys):
        assert main(["--demo"]) == 0
        assert "Dhanmondi" in capsys.readouterr().out

    def test_profile_fast_vs_accurate(self, capsys):
        """Reference control_stages.py profiles: `fast` disables the
        gazetteer/geo enrichment (no inferred postal for a bare area),
        `accurate` keeps it."""
        main(["--address", "Banani, Dhaka", "--profile", "fast"])
        fast = json.loads(capsys.readouterr().out)
        assert fast["components"]["postal_code"] == ""
        main(["--address", "Banani, Dhaka", "--profile", "accurate"])
        acc = json.loads(capsys.readouterr().out)
        assert acc["components"]["postal_code"] == "1213"

    def test_profile_unknown_rejected(self):
        from ai_bangladesh_address_parser_ray.kernel.extract import (
            stages_for_profile)
        import pytest
        with pytest.raises(ValueError):
            stages_for_profile("turbo")


class TestBatchCommand:
    def test_batch_parquet_roundtrip(self, ray_session, tmp_path):
        inp = tmp_path / "in.parquet"
        pq.write_table(pa.table({
            "row_id": pa.array([1, 2, 3], pa.int64()),
            "addr": ["House 12, Road 5, Dhanmondi, Dhaka 1209",
                     "Holding 7, Agrabad, Chittagong",
                     "no address here at all"],
        }), inp)
        out_dir = tmp_path / "out"
        rc = main(["--batch", str(inp), str(out_dir),
                   "--text-col", "addr"])
        assert rc == 0
        got = pq.read_table(out_dir).to_pandas() \
            .sort_values("row_id").reset_index(drop=True)
        assert len(got) == 3
        assert got.loc[0, "house_number"] == "12"
        assert got.loc[0, "area"] == "Dhanmondi"
        assert got.loc[1, "district"] == "Chattogram"
        # --batch is the bulk surface: error rows are captured, clean rows
        # carry an empty error marker (reference bulk_extract contract)
        assert (got["error"] == "").all()
        # borrowed pytest session must survive the command
        import ray
        assert ray.is_initialized()

    def test_batch_limit(self, ray_session, tmp_path):
        inp = tmp_path / "in.parquet"
        pq.write_table(pa.table({
            "text": [f"House {i}, Dhanmondi, Dhaka" for i in range(10)],
        }), inp)
        out_dir = tmp_path / "out_lim"
        assert main(["--batch", str(inp), str(out_dir), "--limit", "4"]) == 0
        assert pq.read_table(out_dir).num_rows == 4


class TestReviewBands:
    """tools/review_bands.py — the reference's cmd_split confidence-band
    ladder (house_number_processor.py:1248-1324) re-expressed as a
    partitioned-parquet Ray pass; band assignment is pure and unit-tested
    here, the CLI plumbing is exercised manually (see tool docstring)."""

    def test_band_ladder_boundaries(self):
        import importlib
        rb = importlib.import_module("tools.review_bands")
        assert rb._band_of("", 0.99) == "no_component"
        assert rb._band_of("12", -1.0) == "no_component"
        assert rb._band_of("12", 1.0) == "1.excellent_95_100"
        assert rb._band_of("12", 0.95) == "1.excellent_95_100"
        assert rb._band_of("12", 0.9499) == "2.very_high_90_95"
        assert rb._band_of("12", 0.85) == "3.high_85_90"
        assert rb._band_of("12", 0.64) == "8.low_below_65"
        assert rb._band_of("12", 0.0) == "8.low_below_65"

    def test_band_batch_planted(self):
        import importlib
        rb = importlib.import_module("tools.review_bands")
        t = pa.table({"text": [
            "House 12, Road 5, Dhanmondi, Dhaka 1209",  # house extracted
            "no address at all here",                   # no component
        ]})
        out = rb._band_batch(t, component="house_number", text_col="text")
        d = out.to_pydict()
        assert d["value"][0] == "12"
        assert d["band"][0] != "no_component"
        assert d["confidence"][0] >= 0.65
        assert d["value"][1] == "" and d["band"][1] == "no_component"

    def test_split_partitions_and_histogram(self, ray_session, tmp_path):
        """split writes one parquet partition per band (the reference's
        per-band review directories) and the histogram sums to the input;
        reading a partition back re-materializes its band value."""
        import importlib

        import ray.data
        rb = importlib.import_module("tools.review_bands")
        inp = tmp_path / "in.parquet"
        pq.write_table(pa.table({
            "row_id": pa.array(range(4), pa.int64()),
            "text": ["House 12, Road 5, Dhanmondi, Dhaka 1209",
                     "House 12, Road 5, Dhanmondi, Dhaka 1209",
                     "Holding 7, Agrabad, Chittagong",
                     "nothing here"],
        }), inp)
        out_dir = tmp_path / "bands"
        ds = ray.data.read_parquet(str(inp))
        banded = rb._banded(ds, "house_number", "text")
        banded.write_parquet(str(out_dir), partition_cols=["band"])
        hist = rb._histogram(ray.data.read_parquet(str(out_dir)))
        assert sum(hist.values()) == 4
        assert hist.get("no_component") == 1
        parts = sorted(p.name for p in out_dir.iterdir())
        assert any(p.startswith("band=") for p in parts)
        # every non-empty band partition reads back with its band value
        for p in parts:
            got = pq.read_table(str(out_dir / p)).to_pydict()
            assert len(got["value"]) >= 1
