"""Tests for validate/format/statistics stages vs the kernel oracle."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def extracted(ray_session, synth_small):
    import ray.data
    from ai_bangladesh_address_parser_ray.stages.extract import (
        dedup_extract_stage)
    from ai_bangladesh_address_parser_ray.stages.normalize import (
        normalize_stage)
    ds = ray.data.read_parquet(f"{synth_small}/transcripts")
    return dedup_extract_stage(normalize_stage(ds), concurrency=2,
                               num_partitions=2).materialize()


class TestValidate:
    def test_matches_kernel_oracle(self, extracted):
        from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS
        from ai_bangladesh_address_parser_ray.kernel.validate_format import (
            validate_address)
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            validate_stage)
        got = validate_stage(extracted).to_pandas()
        for r in got.sample(200, random_state=0).itertuples():
            comp = {f: getattr(r, f) for f in COMPONENT_FIELDS}
            exp = validate_address(comp)
            assert r.is_valid == exp["is_valid"], comp
            assert abs(r.completeness - exp["completeness"]) < 1e-9
            assert abs(r.v_score - exp["score"]) < 1e-9, comp


class TestFormat:
    def test_round_trip_canonical(self, extracted):
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            format_stage)
        got = format_stage(extracted, style="full").to_pandas()
        with_addr = got[got.district != ""]
        assert len(with_addr) > 0
        # full style contains the district token for every extracted row
        assert with_addr.apply(
            lambda r: r.district in r.formatted, axis=1).all()

    def test_styles_differ(self, extracted):
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            format_stage)
        full = format_stage(extracted, style="full").to_pandas()
        mini = format_stage(extracted, style="minimal").to_pandas()
        joined = full.merge(mini, on=["conv_id", "turn_idx"],
                            suffixes=("_f", "_m"))
        mask = joined.house_number_f != ""
        assert (joined[mask].formatted_f.str.len()
                >= joined[mask].formatted_m.str.len()).all()


class TestStatistics:
    def test_district_distribution(self, extracted):
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            district_distribution)
        got = district_distribution(extracted).to_pandas()
        exp = (extracted.to_pandas().query("district != ''")
               .groupby("district").size().rename("n").reset_index()
               .sort_values(["n", "district"], ascending=[False, True])
               .head(10).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_corpus_statistics(self, extracted):
        from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            corpus_statistics)
        got = corpus_statistics(extracted).to_pandas()
        assert got.n_rows[0] == extracted.count()
        assert 0 < got.mean_completeness[0] < 1
        # per-component missing counts match a hand computation (A1 parity,
        # reference address_utils.py:262-324 missing_components)
        df = extracted.to_pandas()
        for f in COMPONENT_FIELDS:
            exp = int((df[f].fillna("") == "").sum())
            assert int(got["missing_" + f][0]) == exp, f

    def test_component_distributions_match_per_field(self, extracted):
        """The one-pass combined query must equal the three per-field
        queries row-for-row (same counts, same tie order)."""
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            area_distribution, component_distributions,
            district_distribution, division_distribution)
        got = component_distributions(extracted).to_pandas()
        for field, fn, k in [("district", district_distribution, 10),
                             ("area", area_distribution, 20),
                             ("division", division_distribution, 8)]:
            sub = (got[got.component == field]
                   .sort_values("rank").reset_index(drop=True))
            exp = fn(extracted, k=k).to_pandas()
            assert sub["value"].tolist() == exp[field].tolist(), field
            assert sub["n"].tolist() == exp["n"].tolist(), field
            assert sub["rank"].tolist() == list(range(1, len(exp) + 1))

    def test_component_distributions_planted(self, ray_session):
        """Exact expected output on a hand-planted component table
        (ADVICE r4: a local twin for the query now past the driver's
        50-query recording cap): counts, desc-count/asc-value tie order,
        per-component k cut, and empty-value exclusion."""
        import pyarrow as pa
        import ray.data

        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            component_distributions)
        t = pa.table({
            "district": ["dhaka"] * 3 + ["khulna"] * 2 + ["bogra"] * 2
            + [""] * 2 + [None],
            "area": ["mirpur"] * 4 + ["banani"] * 2 + [""] * 4,
            "division": ["dhaka"] * 5 + ["rajshahi"] * 5,
        })
        got = (component_distributions(
            ray.data.from_arrow(t).repartition(3), ks={"district": 2,
                                                       "area": 5,
                                                       "division": 1})
            .to_pandas().sort_values(["component", "rank"])
            .reset_index(drop=True))
        exp = pd.DataFrame([
            # k=5 keeps both areas; counts exclude ""/None rows
            {"component": "area", "value": "mirpur", "n": 4, "rank": 1},
            {"component": "area", "value": "banani", "n": 2, "rank": 2},
            # k=2 cuts khulna-vs-bogra tie by value ascending: bogra wins
            {"component": "district", "value": "dhaka", "n": 3, "rank": 1},
            {"component": "district", "value": "bogra", "n": 2, "rank": 2},
            # k=1 cuts the 5-5 division tie by value ascending
            {"component": "division", "value": "dhaka", "n": 5, "rank": 1},
        ])
        pd.testing.assert_frame_equal(got[exp.columns], exp,
                                      check_dtype=False)

    def test_area_division_distributions(self, extracted):
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            area_distribution, division_distribution)
        df = extracted.to_pandas()
        got_a = area_distribution(extracted, k=20).to_pandas()
        exp_a = (df.query("area != ''").groupby("area").size()
                 .rename("n").reset_index()
                 .sort_values(["n", "area"], ascending=[False, True])
                 .head(20).reset_index(drop=True))
        pd.testing.assert_frame_equal(got_a, exp_a, check_dtype=False)
        got_d = division_distribution(extracted, k=8).to_pandas()
        assert len(got_d) <= 8
        assert (got_d.n.diff().dropna() <= 0).all()

    def test_detailed_extraction_columns(self, ray_session, synth_small):
        """Opt-in debug metadata columns; default path schema unchanged."""
        import json
        import ray.data
        from ai_bangladesh_address_parser_ray.stages.extract import (
            extract_stage)
        from ai_bangladesh_address_parser_ray.stages.normalize import (
            normalize_stage)
        ds = ray.data.read_parquet(f"{synth_small}/transcripts").limit(64)
        norm = normalize_stage(ds)
        plain_cols = set(extract_stage(norm).schema().names)
        det = extract_stage(norm, detailed=True)
        det_cols = set(det.schema().names)
        assert det_cols - plain_cols == {
            "meta_script", "meta_sources", "meta_conflicts",
            "meta_enabled_stages"}
        row = det.take(1)[0]
        stages = json.loads(row["meta_enabled_stages"])
        assert stages.get("regex") is True and "geo" in stages
        json.loads(row["meta_sources"])          # valid JSON
        assert row["meta_script"] in ("bn", "en", "mixed", "neutral")

    def test_suggest_areas(self):
        from ai_bangladesh_address_parser_ray.kernel.validate_format import (
            suggest_areas)
        top = suggest_areas("gulsan", limit=3)
        assert top[0]["area"] == "Gulshan"
        top2 = suggest_areas("mirp", limit=3)
        assert top2[0]["area"] == "Mirpur"


class TestSuggestTopk:
    def test_table_shape_and_ranks(self):
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            suggest_topk)
        t = suggest_topk(["gulsh", "mirp"], limit=5).to_pandas()
        assert len(t) == 10
        assert list(t.columns) == ["query", "rank", "area", "district",
                                   "division", "score"]
        g = t[t["query"] == "gulsh"].sort_values("rank")
        assert g.iloc[0]["area"] == "Gulshan"
        # scores non-increasing within a query
        assert (g["score"].diff().dropna() <= 1e-9).all()


class TestCompareAdjacent:
    def test_pairs_match_kernel(self, extracted):
        from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS
        from ai_bangladesh_address_parser_ray.kernel.compare import (
            compare_components)
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            compare_adjacent_stage)
        got = compare_adjacent_stage(extracted).to_pandas()
        assert len(got) > 0
        assert set(got.columns) == {"conv_id", "turn_a", "turn_b",
                                    "similarity", "score", "match"}
        # oracle: recompute each pair from the extracted table
        df = extracted.to_pandas()
        df = df[df.area != ""].set_index(["conv_id", "turn_idx"])
        for r in got.head(50).itertuples():
            c1 = {f: df.loc[(r.conv_id, r.turn_a), f]
                  for f in COMPONENT_FIELDS}
            c2 = {f: df.loc[(r.conv_id, r.turn_b), f]
                  for f in COMPONENT_FIELDS}
            exp = compare_components(c1, c2)
            assert abs(r.score - exp["score"]) < 1e-9
            assert r.match == exp["match"]

    def test_adjacency_is_consecutive_mentions(self, extracted):
        from ai_bangladesh_address_parser_ray.stages.postprocess import (
            compare_adjacent_stage)
        got = compare_adjacent_stage(extracted).to_pandas()
        df = extracted.to_pandas()
        mentions = df[df.area != ""]
        n_pairs_expected = sum(
            max(0, n - 1)
            for n in mentions.groupby("conv_id").size())
        assert len(got) == n_pairs_expected
        assert (got.turn_a < got.turn_b).all()
