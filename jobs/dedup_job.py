"""``ray job submit`` entrypoint for the flagship clip-dedup pipeline.

On a real cluster (north rule: "run via ray job submit on a fixed-size
multi-node Ray cluster"):

    ray job submit --address http://<head>:8265 --working-dir . -- \
        python jobs/dedup_job.py \
            --input /data/clips.lance --output /data/clips_dedup \
            --checkpoint-dir /data/ckpt/clips_dedup

The script only CONNECTS to the cluster the job server placed it on
(``ray.init(address=...)`` guarded below) — it never owns a Ray session, so
the same file runs identically under the job server, under ``python`` on a
head node, or in this sandbox against a ``ray start --head`` local cluster
(the jobs CLI itself needs the ``ray[default]`` dashboard extra, which this
sandbox lacks — see jobs/RUNLOG.md for the in-sandbox kill/resume
demonstration).

Resumability: every expensive stage checkpoints under ``--checkpoint-dir``
(state/checkpoint.py: parquet shards + manifest + atomic _SUCCESS; a stage
re-runs only when its marker is missing or its config hash changed). Killing
the job mid-run and resubmitting with the same arguments skips completed
stages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# the package lives at the repo root (one level up from jobs/); make the
# entrypoint runnable from any cwd — ray job submit's --working-dir unpack,
# a head node shell, or this sandbox
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="clip table (Lance or parquet dir)")
    p.add_argument("--output", default=None, help="output dir (sharded parquet/Lance); "
                   "omit to only count the result")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--min-similarity", type=float, default=0.8)
    p.add_argument("--no-containment", action="store_true")
    p.add_argument("--no-payload", action="store_true",
                   help="skip the final audio-payload hydration join")
    p.add_argument("--address", default=None,
                   help="ray address; default: RAY_ADDRESS or auto-detect")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():  # job server may have initialized already
        ray.init(address=args.address, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.pipelines.clipdedup import dedup_clip_table

    cfg = EngineConfig(
        strategy="lsh",
        min_similarity=args.min_similarity,
        max_n_matches=20,
        exact_dup_shortcircuit=True,
        lsh_pair_emission="star",
        use_actor_pools=False,
        checkpoint_dir=args.checkpoint_dir,
    )
    t0 = time.time()
    out = dedup_clip_table(
        args.input,
        output_path=args.output,
        config=cfg,
        with_containment=not args.no_containment,
        hydrate_payload=not args.no_payload,
    )
    n = out.count() if out is not None else None
    print(json.dumps({
        "status": "ok",
        "rows": n,
        "seconds": round(time.time() - t0, 2),
        "output": args.output,
        "checkpoint_dir": args.checkpoint_dir,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
