"""Per-stage checkpointing + lineage records (north_rule: "resumable from
per-stage checkpoints so a killed job restarts mid-shuffle without
recomputing completed partitions"; SURVEY.md §4.1 checkpoint row).

Layout under ``checkpoint_dir``:

    <stage>/part-*.parquet      the stage's materialized output (sharded)
    <stage>/manifest.json       config hash, row count, wall time, files
    <stage>/_SUCCESS            atomic completion marker (written last)
    lineage.jsonl               append-only stage-level lineage records

A stage is recomputed only when its ``_SUCCESS`` is missing or its recorded
config hash differs from the current run's. Writes go to a temp directory
first and are renamed into place, so a killed writer never leaves a
half-complete stage that looks finished.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, is_dataclass
from typing import Callable, Optional

import ray
import ray.data


def config_hash(config) -> str:
    if is_dataclass(config):
        payload = {k: repr(v) for k, v in asdict(config).items()}
    else:
        payload = {"repr": repr(config)}
    return hashlib.sha256(json.dumps(payload, sort_keys=True).encode()).hexdigest()[:16]


class CheckpointManager:
    def __init__(self, root: Optional[str], config=None):
        self.root = root
        self.cfg_hash = config_hash(config) if config is not None else "none"
        if root:
            os.makedirs(root, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def is_complete(self, name: str) -> bool:
        if not self.root:
            return False
        d = self._stage_dir(name)
        marker = os.path.join(d, "_SUCCESS")
        manifest = os.path.join(d, "manifest.json")
        if not (os.path.exists(marker) and os.path.exists(manifest)):
            return False
        try:
            meta = json.load(open(manifest))
        except Exception:
            return False
        return meta.get("config_hash") == self.cfg_hash

    def _log_lineage(self, record: dict) -> None:
        with open(os.path.join(self.root, "lineage.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

    def stage(
        self, name: str, producer: Callable[[], "ray.data.Dataset"]
    ) -> "ray.data.Dataset":
        """Return the stage output, recomputing only if not checkpointed.

        The producer's output is materialized to parquet; downstream stages
        read the checkpoint, so a resumed run skips every completed stage.
        """
        if not self.root:
            return producer()
        d = self._stage_dir(name)
        if self.is_complete(name):
            self._log_lineage(
                {"stage": name, "event": "resume_hit", "config_hash": self.cfg_hash,
                 "ts": time.time()}
            )
            return ray.data.read_parquet(d, file_extensions=["parquet"])
        if os.path.exists(d):
            shutil.rmtree(d)
        tmp = d + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        t0 = time.time()
        ds = producer()
        ds.write_parquet(tmp)
        n_rows = ray.data.read_parquet(tmp, file_extensions=["parquet"]).count()
        files = sorted(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(tmp, d)
        manifest = {
            "stage": name,
            "config_hash": self.cfg_hash,
            "rows": n_rows,
            "files": files,
            "wall_time_s": round(time.time() - t0, 3),
            "ts": time.time(),
        }
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")
        self._log_lineage({**manifest, "event": "computed"})
        return ray.data.read_parquet(d, file_extensions=["parquet"])
