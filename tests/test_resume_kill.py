"""Kill-and-resume: SIGKILL a checkpointed linkage run mid-pipeline, then
resume — completed phases restore from their manifests and the final output
is identical to an uninterrupted run (north-rule resumability evidence,
stronger than the rerun-after-completion test in test_pipeline.py)."""

import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

from ai_bangladesh_address_parser_ray import COMPONENT_FIELDS

_RUNNER = """
import sys, os
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         log_to_driver=False)
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from ai_bangladesh_address_parser_ray.pipelines.linkage import (
    LinkageConfig, run_linkage)
ds = ray.data.read_parquet(os.path.join({synth!r}, "transcripts"))
cfg = LinkageConfig(num_partitions=4, extract_concurrency=2,
                    checkpoint_dir={ckpt!r})
res = run_linkage(ds, cfg, input_token={synth!r})
res["turns"].materialize()
print("RUN_COMPLETE", flush=True)
ray.shutdown()
"""


class TestKillResume:
    @pytest.mark.timeout(600)
    def test_sigkill_then_resume_identical(self, ray_session, synth_small,
                                           tmp_path_factory):
        import ray.data
        from ai_bangladesh_address_parser_ray.pipelines.linkage import (
            LinkageConfig, run_linkage)

        ckpt = str(tmp_path_factory.mktemp("ckpt_kill") / "run")
        code = _RUNNER.format(repo="/root/repo", synth=synth_small,
                              ckpt=ckpt)
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)
        # wait for the FIRST phase checkpoint to land, then kill hard
        manifest1 = os.path.join(ckpt, "01_extracted", "manifest.json")
        deadline = time.time() + 240
        killed_mid_run = False
        while time.time() < deadline:
            if proc.poll() is not None:
                break                      # finished before we could kill
            if os.path.exists(manifest1):
                try:
                    m = json.load(open(manifest1))
                except (json.JSONDecodeError, OSError):
                    time.sleep(0.02)
                    continue
                if m.get("complete"):
                    proc.send_signal(signal.SIGKILL)
                    proc.wait()
                    killed_mid_run = True
                    break
            time.sleep(0.02)
        if not killed_mid_run:
            out = proc.communicate()[0]
            assert "RUN_COMPLETE" in out  # raced: at least it finished
        assert os.path.exists(manifest1), "phase-1 checkpoint never appeared"
        snap1 = json.load(open(manifest1))
        assert snap1["complete"]

        # resume IN-PROCESS on the same checkpoint dir + input token
        ds = ray.data.read_parquet(os.path.join(synth_small, "transcripts"))
        cfg = LinkageConfig(num_partitions=4, extract_concurrency=2,
                            checkpoint_dir=ckpt)
        res = run_linkage(ds, cfg, input_token=synth_small)
        resumed = res["turns"].to_pandas()

        # phase-1 manifest untouched: restored, not recomputed
        assert json.load(open(manifest1)) == snap1

        # identical to a fresh, uninterrupted run (fresh checkpoint dir)
        ckpt2 = str(tmp_path_factory.mktemp("ckpt_fresh") / "run")
        cfg2 = LinkageConfig(num_partitions=4, extract_concurrency=2,
                             checkpoint_dir=ckpt2)
        fresh = run_linkage(ds, cfg2, input_token=synth_small)[
            "turns"].to_pandas()
        key = ["conv_id", "turn_idx"]
        a = resumed.sort_values(key).reset_index(drop=True)
        b = fresh.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a[key + COMPONENT_FIELDS + ["cluster_id"]],
            b[key + COMPONENT_FIELDS + ["cluster_id"]])
