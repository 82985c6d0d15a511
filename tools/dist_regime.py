"""Distributed-regime A/B: fast paths (broadcast verify + driver UF) vs the
force-distributed configuration (join-mode verify + distributed CC) on the
same synthetic clip table, interleaved min-of-N so host noise hits both
legs alike. Each leg runs in a fresh subprocess / fresh Ray session.

    python tools/dist_regime.py [rows] [repeats]

Prints one JSON line compatible with BENCH/dist_regime.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_leg(rows: int, dist: bool, profile: bool = False) -> tuple[float, str]:
    env = dict(
        os.environ,
        GRAFT_CLIP_ROWS=str(rows),
        GRAFT_FORCE_DISTRIBUTED="1" if dist else "0",
        RAY_GRAFT_CPUS="32",
    )
    if profile:
        env["SGR_PROFILE"] = "1"
    res = subprocess.run(
        [sys.executable, "bench.py", "--headline-only"],
        env=env, capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    val = json.loads(res.stdout.strip().splitlines()[-1])["value"]
    return val, res.stdout


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    profile = bool(os.environ.get("SGR_PROFILE"))
    fast_all, dist_all = [], []
    for i in range(repeats):
        f, _ = run_leg(rows, dist=False)
        fast_all.append(f)
        d, out = run_leg(rows, dist=True, profile=profile and i == repeats - 1)
        dist_all.append(d)
        if profile and i == repeats - 1:
            sys.stderr.write(out)
        print(f"# rep {i}: fast={f:.1f}s dist={d:.1f}s", file=sys.stderr, flush=True)
    fast, dist = min(fast_all), min(dist_all)
    print(json.dumps({
        f"rows_{rows}": {
            "fast_min": round(fast, 2), "fast_all": fast_all,
            "dist_min": round(dist, 2), "dist_all": dist_all,
            "ratio": round(dist / fast, 2),
        },
        "config": "GRAFT_FORCE_DISTRIBUTED=1: verify_broadcast_max_rows=0 "
                  "(band-local in-task verify) + force_distributed CC",
    }))


if __name__ == "__main__":
    main()
