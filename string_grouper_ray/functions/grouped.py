"""Bucketed grouped-map: the scale-friendly alternative to
``groupby(key).map_groups(fn)`` when there are MANY SMALL groups.

Ray's ``map_groups`` invokes the UDF once per group; with millions of
tiny groups the per-group dispatch dominates. Here the shuffle key is
``hash(group keys) % num_buckets`` — one task per bucket — and the UDF
receives the WHOLE bucket (all of its groups) as one DataFrame, grouping
internally with vectorized pandas. Same correctness guarantee: all rows of
a group land in the same bucket.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_BUCKET = "__sgr_gbucket"


def default_buckets() -> int:
    """Shuffle fan-out sized to the cluster: ~4 reduce tasks per CPU slot
    (amortizes stragglers/skew across waves) with a floor of 32. Bucketing
    never changes results, only partitioning."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(32, 4 * cpus)



def _bucket_of(t: pa.Table, keys: List[str], num_buckets: int) -> pa.Array:
    # deterministic hashing only: Python's str hash is per-process randomized
    # and tasks run in different workers (same caveat as joins._key_bucket)
    from ..text import _fnv1a_64

    h = np.zeros(len(t), dtype=np.uint64)
    for k in keys:
        vals = t[k].to_numpy(zero_copy_only=False)
        if vals.dtype.kind in "iu":
            hv = vals.astype(np.uint64, copy=False)
        else:
            hv = np.fromiter(
                (_fnv1a_64(str(v)) for v in vals), dtype=np.uint64, count=len(vals)
            )
        with np.errstate(over="ignore"):
            h = (h ^ hv) * np.uint64(0x9E3779B97F4A7C15)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


def bundle_for(rows_estimate: int) -> int:
    """Map-side bundle size for a sort exchange over ~``rows_estimate``
    rows: target ~8 input blocks per CPU slot (reduce parallelism follows
    input block count in this Ray version), clamped so tiny jobs still
    bundle (floor 65536) and huge jobs never fragment into thousands of
    blocks (ceiling 4M rows — blocks × partitions intermediates stay sane).
    Measured at 1M flagship rows, 32 CPUs: 524k bundles → 40.9 s end-to-end,
    65k bundles → 26.5 s (reduce ran 20 → ~300 partitions)."""
    try:
        # max(…, 1): a workerless head (--num-cpus=0) reports CPU=0.0 —
        # the .get default only covers a MISSING key, not a zero value
        cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        cpus = 8
    return int(min(4_194_304, max(65_536, rows_estimate // (8 * cpus))))


def bucketed_group_map(
    ds: "ray.data.Dataset",
    keys: List[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: Optional[int] = None,
    bundle_rows: Optional[int] = None,
    shuffle: Optional[str] = None,
    bucket_format: str = "pandas",
) -> "ray.data.Dataset":
    """``bucket_fn`` sees one whole bucket (all rows of every group hashed
    into it, WITHOUT the bucket column) and must handle grouping itself.

    ``bundle_rows``: map-side bundle size; callers that know their row
    volume should pass :func:`bundle_for` of it (see that docstring).

    ``bucket_format``: ``"pandas"`` (default) or ``"pyarrow"`` — the batch
    type handed to ``bucket_fn``. Use pyarrow for buckets carrying string
    or binary payload columns: the pandas conversion boxes every value
    into a Python object (measured: the dominant cost of the text-carrying
    verify exchange), while the arrow table slices zero-copy.

    ``shuffle``: per-call exchange strategy — ``"sort"`` (default) or
    ``"hash"``; the ``SGR_GROUP_SHUFFLE`` env var overrides globally.
    Hash partitioning streams rows to aggregator actors with no
    sample/boundary barrier, but each hash exchange spawns its own
    persistent aggregator ACTOR pool; measured on chained exchanges
    (the band-local verify path) the pools stack — ~100 live aggregator
    processes at 32 CPUs, 38 s CPU in 7+ min wall vs ~2 min for sort —
    so no production call site selects hash today. The hook stays for
    single wide exchanges on real multi-node clusters, where per-node
    aggregators are the intended Ray design."""
    if num_buckets is None:
        num_buckets = default_buckets()

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(_BUCKET, _bucket_of(t, keys, num_buckets))

    # Bundle small input blocks into ~512k-row map tasks: Ray's sort shuffle
    # creates input_blocks × num_partitions intermediate objects, so a
    # fragmented input (e.g. a union of several materialized stages at ~20k
    # rows/block) multiplies scheduling/metadata cost ~10× (measured 14 s →
    # 200 s on an identical 23M-row dedup). Safe row-based bound: every
    # caller of this primitive shuffles NARROW rows (ids, keys, packed
    # membersets) — wide-payload joins go through shuffle_join instead.

    if bucket_format == "pyarrow":

        def run(g: pa.Table) -> pa.Table:
            out = bucket_fn(g.drop_columns([_BUCKET]))
            if isinstance(out, pa.Table):
                return out
            return pa.Table.from_pandas(out, preserve_index=False)

    else:

        def run(g: pd.DataFrame) -> pa.Table:
            # return ARROW, not the pandas frame: pandas blocks are pickled in
            # the object store (no zero-copy) and a dataset mixing pandas blocks
            # with arrow ones from sibling stages breaks repartition and slows
            # every downstream shuffle ~10× (observed on the 4M-row flagship)
            out = bucket_fn(g.drop(columns=[_BUCKET]))
            if isinstance(out, pa.Table):
                return out
            return pa.Table.from_pandas(out, preserve_index=False)

    def run_gen(g):
        # generator variant for the hash route: yields nothing for empty
        # partitions (hash partitioning with more partitions than occupied
        # buckets produces empty blocks, and an empty pandas frame through
        # bucket_fn risks a schema-less output breaking the downstream union)
        if len(g):
            yield run(g)

    import os

    # map-side bundle size balances two costs in the sort exchange: reduce
    # parallelism tracks the input block count (more blocks → more reduce
    # tasks) while intermediate-object count grows as blocks × partitions
    # (too many tiny blocks → 10× scheduling/metadata collapse, see below)
    bundle = int(
        os.environ.get("SGR_BUNDLE_ROWS", "0")
    ) or bundle_rows or 524_288
    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=bundle)
    choice = os.environ.get("SGR_GROUP_SHUFFLE") or shuffle or "sort"
    if choice == "hash" and not os.environ.get("SGR_GROUP_SHUFFLE"):
        # each hash exchange spins up its own aggregator ACTOR pool; on a
        # small cluster (tests run at 4 CPUs) several chained exchanges
        # stack dozens of actor processes and the startup cost swamps the
        # exchange itself — fall back to sort below 16 CPUs unless the env
        # var forces hash explicitly
        try:
            if int(ray.cluster_resources().get("CPU", 0)) < 16:
                choice = "sort"
        except Exception:
            choice = "sort"
    if choice == "hash":
        # HASH-PARTITION exchange (opt-in): the shuffle key is already a
        # dense integer bucket id, so hash repartition streams rows to
        # aggregator actors with no sample/boundary barrier, honors
        # num_buckets exactly, and emits ONE block per partition (a bucket
        # never straddles blocks: hash_shuffle.finalize() builds each
        # partition as a single block). Measured on this host it wins for
        # narrow/small exchanges but loses ~8× on the 19.5M-row band-row
        # exchange (aggregator actors are the bottleneck), so the sort
        # exchange stays the default; downstream fan-out starvation is
        # fixed by streaming block splits at the call sites instead.
        from ray.data.context import ShuffleStrategy

        tagged.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        # each aggregator is a dedicated actor PROCESS; the default cap (64)
        # starts a per-exchange worker storm on small clusters.
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        tagged.context.max_hash_shuffle_aggregators = min(64, max(8, cpus))
        shuffled = tagged.repartition(num_buckets, keys=[_BUCKET], sort=False)
        return shuffled.map_batches(
            run_gen, batch_format=bucket_format, batch_size=None
        )

    # sort-based route (default): num_partitions is ignored by this Ray
    # version's sort shuffle — reduce parallelism follows the input block
    # count, so keep map-side bundles big enough to avoid the
    # input_blocks × partitions intermediate-object quadratic and let
    # callers split the (few, large) output blocks with a streaming
    # repartition where downstream stages need task fan-out.
    return tagged.groupby(_BUCKET, num_partitions=num_buckets).map_groups(
        run, batch_format=bucket_format
    )


def dedup_pairs(
    ds: "ray.data.Dataset",
    keys: List[str],
    agg_col: Optional[str] = None,
    agg: str = "max",
    num_buckets: Optional[int] = None,
    bundle_rows: Optional[int] = None,
    shuffle: Optional[str] = None,
) -> "ray.data.Dataset":
    """Distinct rows per key tuple (optionally keeping the max/min of one
    value column). One bucketed shuffle + vectorized pandas dedup — Ray's
    native multi-key groupby aggregate is avoided (it degrades sharply with
    row count in this version)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if agg_col is None:
            return df.drop_duplicates(subset=keys)
        df = df.sort_values(keys + [agg_col], ascending=[True] * len(keys) + [agg != "max"],
                            kind="stable")
        return df.groupby(keys, sort=False).head(1)

    return bucketed_group_map(
        ds, keys, fn, num_buckets, bundle_rows=bundle_rows, shuffle=shuffle
    )


def groupby_agg(
    ds: "ray.data.Dataset",
    key: str,
    col: Optional[str],
    agg: str,
    out_col: Optional[str] = None,
    num_buckets: Optional[int] = None,
) -> "ray.data.Dataset":
    """Distributed per-key aggregate (``sum``/``min``/``max``/``count``) with
    map-side partial aggregation.

    Each batch first collapses to one row per distinct key (vectorized pandas
    groupby), so the single bucketed shuffle moves ``#batches × #distinct``
    partial rows instead of every input row. Ray's native
    ``groupby().sum()`` shuffles and sorts the full row set and degrades
    sharply with row count in this version (measured 360 s for a 7.8M-row
    sum that this does in ~2 s); every wide aggregate in the engine routes
    through here.

    Output columns: ``(key, out_col)`` where ``out_col`` defaults to
    ``f"{agg}({col})"`` (``"count()"`` for count).
    """
    out_col = out_col or (f"{agg}({col})" if col is not None else "count()")
    combine_agg = "sum" if agg == "count" else agg

    # Kernel choice is MEASURED, not assumed (census-shaped data: 262k-row
    # batches, ~230k distinct int64 keys/batch, this host/pyarrow-16):
    # np.unique(return_counts) 5.4 ms < pandas groupby.size 10.9 ms <
    # pa.TableGroupBy count_all 16.8 ms — the "Arrow-native" TableGroupBy
    # was tried and is the SLOWEST of the three for both count and sum, so
    # the integer-key count partial (the flagship band census) goes through
    # numpy and everything else keeps pandas's hashtable (Arrow tables at
    # the batch boundary either way).
    def partial(t: pa.Table) -> pa.Table:
        if agg == "count":
            try:
                vals = t[key].to_numpy(zero_copy_only=False)
            except (pa.ArrowInvalid, ValueError):
                vals = None
            if vals is not None and vals.dtype.kind in "iu":
                keys, cnt = np.unique(vals, return_counts=True)
                return pa.table(
                    {key: pa.array(keys), out_col: pa.array(cnt.astype(np.int64))}
                )
        df = t.select([key] + ([col] if col is not None else [])).to_pandas()
        if agg == "count":
            out = df.groupby(key, sort=False).size().reset_index(name=out_col)
        else:
            out = df.groupby(key, sort=False, as_index=False)[col].agg(agg)
            out = out.rename(columns={col: out_col})
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, sort=False, as_index=False)[out_col].agg(combine_agg)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return bucketed_group_map(partials, [key], combine, num_buckets)


def per_group_topk(
    ds: "ray.data.Dataset",
    group_key: str,
    sort_cols: List[str],
    ascending: List[bool],
    k: int,
    num_buckets: Optional[int] = None,
    bundle_rows: Optional[int] = None,
) -> "ray.data.Dataset":
    """Vectorized per-group top-k: sort within bucket, ``groupby.head(k)``."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_key] + sort_cols, ascending=[True] + ascending,
                            kind="stable")
        return df.groupby(group_key, sort=False).head(k)

    return bucketed_group_map(ds, [group_key], fn, num_buckets, bundle_rows=bundle_rows)
