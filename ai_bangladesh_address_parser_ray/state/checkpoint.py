"""Per-phase checkpoint manifests: lineage + metrics + resume.

Each expensive pipeline phase (extracted turns, candidate pairs, match
edges, clusters) can be checkpointed as partitioned Parquet plus a
``manifest.json`` recording the input fingerprint, per-file row counts
(partition lineage), total rows and wall time. A rerun with the same
fingerprint skips the phase and streams the Parquet back; a changed
fingerprint (different input or config) invalidates the checkpoint — stale
state can never leak into a new run (SURVEY.md §7.4 "resume correctness").
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable, Optional

import ray.data


def fingerprint(*parts) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode("utf-8"))
        h.update(b"\x00")
    return h.hexdigest()[:24]


class CheckpointManager:
    def __init__(self, root: Optional[str]):
        self.root = root
        if root:
            os.makedirs(root, exist_ok=True)

    def _dir(self, phase: str) -> str:
        return os.path.join(self.root, phase)

    def _data_dir(self, phase: str) -> str:
        return os.path.join(self.root, phase, "data")

    def _manifest_path(self, phase: str) -> str:
        return os.path.join(self._dir(phase), "manifest.json")

    def manifest(self, phase: str) -> Optional[dict]:
        try:
            with open(self._manifest_path(phase)) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def is_complete(self, phase: str, fp: str) -> bool:
        m = self.manifest(phase)
        return bool(m and m.get("complete") and m.get("fingerprint") == fp)

    def run(self, phase: str, fp: str,
            fn: Callable[[], "ray.data.Dataset"]) -> "ray.data.Dataset":
        """Compute-or-restore. ``fn`` must be a deterministic function of the
        fingerprinted inputs."""
        if self.root is None:
            return fn()
        if self.is_complete(phase, fp):
            return ray.data.read_parquet(self._data_dir(phase))

        # a stale/partial phase dir is discarded wholesale (fingerprint gate)
        phase_dir = self._dir(phase)
        if os.path.exists(phase_dir):
            import shutil
            shutil.rmtree(phase_dir)
        out_dir = self._data_dir(phase)
        os.makedirs(out_dir, exist_ok=True)

        t0 = time.perf_counter()
        ds = fn()
        ds.write_parquet(out_dir)
        wall = time.perf_counter() - t0

        import pyarrow.parquet as pq
        files = []
        total = 0
        for name in sorted(os.listdir(out_dir)):
            if not name.endswith(".parquet"):
                continue
            nrows = pq.read_metadata(os.path.join(out_dir, name)).num_rows
            files.append({"file": name, "rows": nrows})
            total += nrows
        with open(self._manifest_path(phase), "w") as f:
            json.dump({
                "phase": phase,
                "fingerprint": fp,
                "rows": total,
                "wall_s": round(wall, 3),
                "files": files,
                "complete": True,
            }, f, indent=2)
        return ray.data.read_parquet(out_dir)
