"""Single-wide-exchange A/B: sort-based vs hash-based shuffle for ONE
bucketed grouped aggregate (the configuration the hash hook was kept for —
round 4 rejected hash for CHAINED exchanges because each one spawns its own
aggregator actor pool and the pools stack; a single wide exchange is the
intended Ray design point for hash partitioning on real multi-node
clusters).

Each leg runs in a fresh subprocess / fresh Ray session at 32 CPUs,
interleaved min-of-N so host noise hits both legs alike:

    python tools/hash_exchange_ab.py [rows] [repeats]

Prints one JSON line for BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_LEG_SCRIPT = r"""
import json, os, sys, time
import numpy as np
import ray, ray.data

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

rows = int(os.environ["AB_ROWS"])
mode = os.environ["AB_MODE"]  # "sort" | "hash"

# synthetic (key, val): ~rows/64 distinct keys, deterministic
def gen(t):
    import pyarrow as pa
    ids = t["id"].to_numpy(zero_copy_only=False)
    with np.errstate(over="ignore"):
        h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return pa.table({
        "k": pa.array((h % np.uint64(max(1, rows // int(os.environ.get("AB_KEY_DIV", "64"))))).astype(np.int64)),
        "v": pa.array((ids % 1000).astype(np.float64)),
    })

ds = ray.data.range(rows).map_batches(gen, batch_format="pyarrow",
                                      batch_size=262_144).materialize()

from string_grouper_ray.functions.grouped import groupby_agg

t0 = time.time()
# SGR_GROUP_SHUFFLE overrides globally; the per-call param needs >=16 CPUs
os.environ["SGR_GROUP_SHUFFLE"] = mode
out = groupby_agg(ds, "k", "v", "sum", out_col="s")
n = out.count()
dt = time.time() - t0
print(json.dumps({"mode": mode, "sec": round(dt, 2), "groups": n}))
ray.shutdown()
"""


def run_leg(rows: int, mode: str) -> float:
    env = dict(os.environ, AB_ROWS=str(rows), AB_MODE=mode, RAY_GRAFT_CPUS="32")
    res = subprocess.run(
        [sys.executable, "-c", _LEG_SCRIPT], env=env, capture_output=True,
        text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return json.loads(res.stdout.strip().splitlines()[-1])["sec"]


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sort_all, hash_all = [], []
    for i in range(repeats):
        sort_all.append(run_leg(rows, "sort"))
        hash_all.append(run_leg(rows, "hash"))
        print(
            f"# rep {i}: sort={sort_all[-1]:.1f}s hash={hash_all[-1]:.1f}s",
            file=sys.stderr, flush=True,
        )
    print(json.dumps({
        "rows": rows,
        "sort_min": min(sort_all), "sort_all": sort_all,
        "hash_min": min(hash_all), "hash_all": hash_all,
        "hash_over_sort": round(min(hash_all) / min(sort_all), 2),
        "exchange": "single groupby_agg(sum) via bucketed_group_map",
        "num_cpus": 32,
    }))


if __name__ == "__main__":
    main()
