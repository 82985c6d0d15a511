"""Flagship pipeline: end-to-end near-duplicate detection + clustering over
the audio clip table (the north_star pipeline of BASELINE.json).

    read (columns pruned: clip_id, transcript)       sources
      → row_idx assignment (zip-with-range)
      → MinHash/LSH candidates + exact verify        stages/lsh.py
        (or exact blocked matmul below the LSH cutover)
      → containment pass (prefix truncations)        stages/suffixstage.py
      → union of edge sets
      → connected components                         state/unionfind.py
      → per-group representative                     pipelines/cluster.py
      → assignments joined back onto the FULL table  (audio bytes move
        exactly once, in this final join)
      → sharded parquet out

Per-stage checkpoints via state/checkpoint.py: a killed run resumes from
the last completed stage. The audio payload never enters any shuffle
before the final hydration join.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..functions.joins import shuffle_join
from ..sparse import Vocabulary
from ..state.checkpoint import CheckpointManager
from ..state.unionfind import connected_components
from ..stages.suffixstage import containment_edges
from .cluster import group_assignments
from .match import match_edges


class _NarrowProject:
    """Narrow-table projection, optionally fusing the exact-dup identity
    hash into the read: the ``nhash`` column computes during the
    already-parallel read tasks instead of as a separate NormHash stage on
    the critical path (lsh.py ``_normhash_ds`` detects and reuses it —
    same ``_NormHash`` kernel, so the identities cannot diverge)."""

    def __init__(self, id_col: str, text_col: str, config, with_nhash: bool):
        self.id_col = id_col
        self.text_col = text_col
        self.with_nhash = with_nhash
        if with_nhash:
            from ..stages.lsh import _NormHash

            self._nh = _NormHash(config, text_col)

    def __call__(self, t: pa.Table) -> pa.Table:
        cols = {
            "row_idx": t["row_idx"],
            "clip_id": t[self.id_col],
            "text": t[self.text_col],
        }
        if self.with_nhash:
            cols["nhash"] = self._nh(t)["nhash"]
        return pa.table(cols)


def add_row_idx(ds: "ray.data.Dataset", count: Optional[int] = None) -> "ray.data.Dataset":
    """Assign a dense, deterministic row_idx by zipping with a range dataset
    (dataset order is deterministic for a deterministic file listing).

    The zip fragments blocks (range() defaults to many tiny blocks and zip
    aligns to them); repartition to a CPU-sized block count afterwards so
    downstream sorts/groupbys don't pay per-block overhead ×170.
    """
    n = count if count is not None else ds.count()
    idx = ray.data.range(n).map_batches(
        lambda t: t.rename_columns(["row_idx"]), batch_format="pyarrow"
    )
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    blocks = max(cpus, min(256, n // 50_000 + cpus))
    return ds.zip(idx).repartition(blocks)


def dedup_clip_table(
    input_path: str,
    output_path: Optional[str] = None,
    config: Optional[EngineConfig] = None,
    text_col: str = "transcript",
    id_col: str = "clip_id",
    with_containment: bool = True,
    hydrate_payload: bool = True,
    force_distributed: bool = False,
) -> "ray.data.Dataset":
    """Dedup/cluster a clip table from parquet; returns (or writes) the full
    table + (group_id, group_rep_id) columns.

    Rep-choice caveat: with ``exact_dup_shortcircuit`` + distinct-norm star
    containment edges, cluster MEMBERSHIP is provably unchanged (equivalence
    tests), but centroid ``group_rep_id`` picks can differ from an all-pairs
    edge construction — the centroid weight is a sum of edge similarities,
    and star emission changes which edges exist (same weight-sensitivity
    family as the rounding divergence documented in compat.py). Downstream
    consumers should treat the rep as "a stable member of the cluster", not
    a unique canonical choice across configs."""
    config = config or EngineConfig()
    ckpt = CheckpointManager(config.checkpoint_dir, config)

    from ..stages.lsh import StageTimer
    _tmark = StageTimer("clipdedup")
    _tmark("start")
    from ..sources.io import read_table, read_table_with_row_idx

    # prune at the read: only the narrow columns enter the match path
    # (read_table = the Lance-or-Parquet storage seam, sources/io.py).
    # Parquet inputs get row_idx straight from footer offsets — the
    # zip(range(n)) path costs a count pass + zip + repartition that is
    # parallelism-independent (pure serial floor at scale).
    narrow = read_table_with_row_idx(input_path, columns=[id_col, text_col])
    if narrow is None:
        narrow = read_table(input_path, columns=[id_col, text_col])
        narrow = add_row_idx(narrow, narrow.count())
    from ..functions.stagemap import stage_map_batches as _smb_narrow

    # batch_size=None: whole-block batches — a row-sized batch here would
    # fragment the materialized narrow table into thousands of tiny blocks
    # and every downstream stage's task count follows block count
    narrow = _smb_narrow(
        narrow, _NarrowProject,
        (id_col, text_col, config, config.exact_dup_shortcircuit),
        config, batch_format="pyarrow", batch_size=None,
    ).materialize()
    # Materializing the narrow table here is load-bearing: it is consumed by
    # 4+ downstream stages (containment thread, rep filter, banding, node/id
    # collection), and the lazy alternative re-executes the read inside each
    # of them CONCURRENTLY — measured 14.8 → 36.9 s at 1M/32 CPUs when this
    # barrier was removed (banding alone went 1.3 → 14.6 s). ~1.5 s of
    # parallelism-independent wall is the cheaper trade at small scale and
    # amortizes at large scale.
    _tmark("narrow_read")

    def compute_edges():
        cont_box: dict = {}
        cont_thread = None
        if with_containment:
            import threading

            # the containment pass depends only on the narrow table, so its
            # sort exchange (parallelism-independent latency) runs in a
            # driver thread CONCURRENTLY with the whole match chain instead
            # of serializing inside the downstream edge collect
            def _build_cont():
                try:
                    # distinct-norm star edges suffice for clustering when
                    # the exact-dup short-circuit connects identical norms
                    # to a rep; the all-pairs default would go quadratic on
                    # popular truncations of popular transcripts
                    cont_box["ds"] = containment_edges(
                        narrow.select_columns(["row_idx", "text"]), config,
                        "text", distinct=config.exact_dup_shortcircuit,
                    ).materialize()
                except BaseException as exc:
                    cont_box["err"] = exc

            cont_thread = threading.Thread(
                target=_build_cont, name="containment-edges", daemon=True
            )
            cont_thread.start()
        try:
            # defer the symmetrize pair dedup: group_assignments below runs
            # with dedup_edges=True, which max-merges duplicate (l, r) rows
            # on whichever route it takes, so the dedicated exchange inside
            # symmetrize_edges is redundant work on this pipeline
            match_cols = ["row_idx", "text"] + (
                ["nhash"] if config.exact_dup_shortcircuit else []
            )
            edges, _vocab = match_edges(
                narrow.select_columns(match_cols), None,
                config.with_options(defer_edge_dedup=True),
            )
        finally:
            # join even when match_edges raises: never leave the
            # containment materialize running with its error discarded
            if cont_thread is not None:
                cont_thread.join()
        if cont_thread is not None:
            if "err" in cont_box:
                raise cont_box["err"]
            # NOT deduped here: group_assignments(dedup_edges=True) merges
            # duplicate (l, r) rows on the driver below the CC threshold
            # (numpy lexsort on edges it collects anyway) and only pays the
            # distributed dedup shuffle above it
            edges = edges.union(cont_box["ds"])
        return edges

    edges = ckpt.stage("edges", compute_edges)
    if _tmark.enabled:
        edges = edges.materialize()
        _tmark("edges(total)")

    def compute_groups():
        return group_assignments(
            narrow.select_columns(["row_idx", "text", "clip_id"]), config, None,
            "text", edges=edges, dedup_edges=True,
            force_distributed=force_distributed, id_col="clip_id",
        )

    groups = ckpt.stage("groups", compute_groups)
    if _tmark.enabled:
        groups = groups.materialize()
        _tmark("groups(total)")

    # schema probe must not execute the plan: the distributed route returns a
    # lazy shuffle whose schema() would otherwise trigger real work. Unknown
    # schema → join route (correct either way; the fast path is an opt-in).
    _gsch = groups.schema(fetch_if_missing=False)
    if _gsch is not None and "group_rep_id" in _gsch.names:
        # driver fast path carried the clip ids through the union-find output
        # (group_assignments id_col): both rep-hydration joins collapse into a
        # projection — at 1M rows that was ~1 s of parallelism-independent
        # exchange latency on the critical path
        assign = groups.map_batches(
            lambda t: pa.table(
                {
                    "clip_id": t["clip_id"],
                    "group_id": t["group_id"].cast(pa.int64()),
                    "group_rep_id": t["group_rep_id"],
                }
            ),
            batch_format="pyarrow",
        )
    else:
        # distributed route: map row_idx-based assignment back to clip ids
        # (right key renamed: shuffle_join requires non-key column names to
        # be disjoint)
        idx_to_id = narrow.select_columns(["row_idx", "clip_id"]).map_batches(
            lambda t: t.rename_columns(["rep_row", "clip_id"]), batch_format="pyarrow"
        )
        assign = shuffle_join(
            groups, idx_to_id, on="group_rep_idx", right_on="rep_row", how="inner",
            left_schema=pa.schema(
                [("row_idx", pa.int64()), ("group_id", pa.int64()), ("group_rep_idx", pa.int64())]
            ),
            right_schema=pa.schema([("rep_row", pa.int64()), ("clip_id", pa.string())]),
        ).map_batches(
            lambda t: pa.table(
                {
                    "row_idx": t["row_idx"],
                    "group_id": t["group_id"],
                    "group_rep_id": t["clip_id"],
                }
            ),
            batch_format="pyarrow",
        )
        assign = shuffle_join(
            assign, narrow.select_columns(["row_idx", "clip_id"]), on="row_idx", how="inner",
            left_schema=pa.schema(
                [("row_idx", pa.int64()), ("group_id", pa.int64()), ("group_rep_id", pa.string())]
            ),
            right_schema=pa.schema([("row_idx", pa.int64()), ("clip_id", pa.string())]),
        ).map_batches(
            lambda t: pa.table(
                {
                    "clip_id": t["clip_id"],
                    "group_id": t["group_id"].cast(pa.int64()),
                    "group_rep_id": t["group_rep_id"],
                }
            ),
            batch_format="pyarrow",
        )

    if not hydrate_payload:
        out = assign
    else:
        # the ONE join that moves the audio payload
        full = read_table(input_path)
        full_schema = full.schema()
        out = shuffle_join(
            full, assign, on=id_col, right_on="clip_id", how="left",
            left_schema=full_schema,
            right_schema=pa.schema(
                [("clip_id", pa.string()), ("group_id", pa.int64()),
                 ("group_rep_id", pa.string())]
            ),
            num_buckets=64,
            bundle_rows=None,  # rows carry the audio payload: keep the
            # reader's byte-sized blocks, don't bundle 131k rows of bytes
        )
    if output_path:
        from ..sources.io import write_table

        write_table(out, output_path)
        return read_table(output_path)
    return out
