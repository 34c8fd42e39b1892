"""Pairwise-F1 of the linkage pipeline vs planted ground truth at any
preset scale (BASELINE metric: F1 >= 0.99 on labeled pairs at the
reference blocking keys).

Usage: python tools/eval_f1.py [preset] [num_cpus]
"""
import os
import sys

import ray
import ray.data


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.environ["GRAFT_SYNTH_PRESET"] = preset
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    import pandas as pd
    from ai_bangladesh_address_parser_ray.pipelines.evaluate import pairwise_f1
    from ai_bangladesh_address_parser_ray.pipelines.linkage import (
        LinkageConfig, run_linkage)
    from ai_bangladesh_address_parser_ray.sources.synthetic import synth_dir_for
    from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS

    d = synth_dir_for("/root/testdata/" + preset)
    ds = ray.data.read_parquet(f"{d}/transcripts")
    out = run_linkage(ds, LinkageConfig())
    cols = ["conv_id", "turn_idx", "cluster_id"] + list(COMPONENT_FIELDS)
    turns = out["turns"].select_columns(cols).to_pandas()
    mentions = pd.read_parquet(f"{d}/mentions.parquet")
    m = pairwise_f1(turns, mentions)
    print({"preset": preset, "cpus": cpus,
           **{k: (round(v, 5) if isinstance(v, float) else v)
              for k, v in m.items()}})
    ray.shutdown()


if __name__ == "__main__":
    main()
