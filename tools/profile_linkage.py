"""Phase-by-phase wall-clock profile of the linkage pipeline.

Usage: python tools/profile_linkage.py [num_cpus] [preset]
"""
import os
import sys
import time

import ray
import ray.data


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    preset = sys.argv[2] if len(sys.argv) > 2 else "sf-scaling"
    os.environ["GRAFT_SYNTH_PRESET"] = preset
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from ai_bangladesh_address_parser_ray.pipelines.linkage import (
        LinkageConfig, _has_any_component)
    from ai_bangladesh_address_parser_ray.sources.synthetic import synth_dir_for
    from ai_bangladesh_address_parser_ray.stages.normalize import (
        normalize_stage, _hash64)
    from ai_bangladesh_address_parser_ray.stages.extract import (
        extract_stage)
    from ai_bangladesh_address_parser_ray.stages.blocking import blocking_stage
    from ai_bangladesh_address_parser_ray.stages.pairs import (
        candidate_pairs_stage)
    from ai_bangladesh_address_parser_ray.stages.scoring import (
        score_pairs_stage)
    from ai_bangladesh_address_parser_ray.stages.unionfind import (
        connected_components)
    import pyarrow as pa
    import pyarrow.compute as pc

    cfg = LinkageConfig().resolved()
    d = synth_dir_for("/root/testdata/sf0.1")
    ds = ray.data.read_parquet(f"{d}/transcripts")

    t = {}
    t0 = time.time()
    extracted = extract_stage(
        normalize_stage(ds), concurrency=cfg.extract_concurrency).materialize()
    t["1_extract"] = time.time() - t0

    t0 = time.time()
    ent = extracted.map_batches(_has_any_component, batch_format="pyarrow",
                                zero_copy_batch=True)
    blocked = blocking_stage(ent).materialize()
    t["2_block"] = time.time() - t0

    t0 = time.time()
    pairs = candidate_pairs_stage(blocked).materialize()
    t["3_pairs"] = time.time() - t0

    t0 = time.time()
    scored = score_pairs_stage(pairs).materialize()
    t["4_score"] = time.time() - t0

    t0 = time.time()
    edges = scored.filter(expr="match == True").materialize()
    t["5_edges"] = time.time() - t0

    t0 = time.time()
    clusters = connected_components(edges, num_partitions=cfg.num_partitions)
    clusters = clusters.materialize()
    t["6_uf"] = time.time() - t0

    t0 = time.time()
    from ai_bangladesh_address_parser_ray.pipelines.linkage import (
        _join_clusters_back)
    turns = _join_clusters_back(extracted, clusters, cfg,
                                broadcast_limit=cfg.join_broadcast_limit)
    rows = 0
    for b in turns.select_columns(["cluster_id"]).iter_batches(
            batch_format="pyarrow"):
        rows += b.num_rows
    t["7_join_consume"] = time.time() - t0

    total = sum(t.values())
    print({"cpus": cpus, "rows": rows,
           "phases": {k: round(v, 1) for k, v in t.items()},
           "total": round(total, 1)})
    ray.shutdown()


if __name__ == "__main__":
    main()
