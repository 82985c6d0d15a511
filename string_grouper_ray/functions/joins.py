"""Join primitives for the engine (J3/J4 support in SURVEY.md §2.4).

``Dataset.join`` exists in Ray 2.49 but its hash-shuffle aggregator breaks
when one logical plan contains more than one join (state from the first
join's shuffle leaks into the second — observed as
``ArrowInvalid: No match ... on right side of the join``). The engine
therefore uses the two portable patterns from the Ray Data playbook:

* :func:`broadcast_join` — small side collected once, ``ray.put``, merged
  against every batch of the big side inside ``map_batches``. No shuffle.
* :func:`shuffle_join` — explicit partitioned hash join: both sides get a
  ``bucket = hash(key) % B`` column, are unioned with a side tag, shuffled
  ONCE on the bucket, and merged bucket-wise with a vectorized pandas merge
  inside ``map_groups``. One all-to-all exchange, arbitrary-size sides.

Both preserve the left side's rows for ``how="left"``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

_SIDE_COL = "__sgr_side"
_BUCKET_COL = "__sgr_bucket"


def _key_bucket(col: pa.ChunkedArray, num_buckets: int) -> pa.Array:
    """Deterministic bucket id per key value.

    NEVER Python's builtin ``hash`` — string hashing is randomized per
    process, and map tasks run in different workers, so the same key would
    land in different buckets on the two sides of the join.
    """
    from ..text import _fnv1a_64

    vals = col.to_numpy(zero_copy_only=False)
    if vals.dtype.kind in "iu":
        with np.errstate(over="ignore"):
            h = vals.astype(np.uint64, copy=False) * np.uint64(0x9E3779B97F4A7C15)
    else:
        h = np.fromiter(
            (_fnv1a_64(str(v)) for v in vals), dtype=np.uint64, count=len(vals)
        )
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


_ORDER_COL = "__sgr_border"


class _BroadcastMerger:
    def __init__(self, small_ref, on: str, right_on: str, how: str, columns: Optional[List[str]]):
        small: pa.Table = ray.get(small_ref)
        if columns:
            small = small.select(
                [right_on] + [c for c in columns if c != right_on]
            )
        self.small = small.combine_chunks()
        self.on = on
        self.right_on = right_on
        self.how = how

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow-native hash join per batch (no pandas boxing). Left row
        # order is restored via a transient order column: Table.join does
        # not guarantee output order, the old pandas merge did, and join
        # primitives should stay deterministic under re-execution.
        b = batch.append_column(
            _ORDER_COL, pa.array(np.arange(len(batch), dtype=np.int64))
        )
        out = b.join(
            self.small,
            keys=[self.on],
            right_keys=[self.right_on],
            join_type=("left outer" if self.how == "left" else "inner"),
        )
        return out.sort_by(_ORDER_COL).drop_columns([_ORDER_COL])


def broadcast_join(
    big: "ray.data.Dataset",
    small: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    columns: Optional[List[str]] = None,
    concurrency: Optional[int] = None,
) -> "ray.data.Dataset":
    """Map-side join: ``small`` is materialized on the driver and broadcast.

    Use only when the small side provably fits in memory (dimension tables,
    per-group representatives, vocabulary-sized lookups).

    Contract notes vs the pre-Arrow (pandas-merge) version: non-key column
    name collisions are rejected here (pandas used to suffix _x/_y;
    ``pa.Table.join`` would silently emit two same-named fields), the
    ``right_on`` key column is not duplicated into the output, and null
    join keys do not match (pandas matched NaN to NaN).
    """
    right_on = right_on or on
    parts = ray.get(small.to_arrow_refs())
    if parts:
        small_tbl = pa.concat_tables(parts, promote_options="default")
    else:
        small_tbl = _arrow_schema(small).empty_table()
    big_schema = big.schema(fetch_if_missing=False)  # never execute the plan
    if big_schema is not None:
        overlap = (set(small_tbl.column_names) & set(big_schema.names)) - (
            {on} if on == right_on else set()
        )
        if overlap:
            raise ValueError(
                f"broadcast_join: column name collision {sorted(overlap)} — "
                "rename non-key columns before joining (pa.Table.join would "
                "silently emit duplicate field names)"
            )
    small_ref = ray.put(small_tbl)
    if concurrency is None:
        # scale the pool to the cluster rather than a flat 2 — a big-side
        # scan routed through here must not serialize on two actors
        try:
            concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
        except Exception:
            concurrency = 4
    return big.map_batches(
        _BroadcastMerger,
        fn_constructor_args=(small_ref, on, right_on, how, columns),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def _arrow_schema(ds: "ray.data.Dataset") -> pa.Schema:
    """``ds.schema()`` with pandas extension dtypes (nullable Int64 from an
    upstream pandas-block stage) mapped back to Arrow types instead of None."""
    sch = ds.schema()
    fields = []
    for name, typ in zip(sch.names, sch.types):
        if not isinstance(typ, pa.DataType):
            try:
                typ = pa.from_numpy_dtype(getattr(typ, "numpy_dtype", typ))
            except (TypeError, pa.ArrowInvalid, pa.ArrowNotImplementedError):
                typ = {"Int64": pa.int64(), "Int32": pa.int32(),
                       "Float64": pa.float64(), "boolean": pa.bool_(),
                       "string": pa.string()}.get(str(typ))
        if typ is None:
            raise TypeError(
                f"shuffle_join: cannot map dtype of column {name!r} to Arrow; "
                "pass an explicit schema"
            )
        fields.append(pa.field(name, typ))
    return pa.schema(fields)


def shuffle_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    num_buckets: Optional[int] = None,
    left_schema: Optional[pa.Schema] = None,
    right_schema: Optional[pa.Schema] = None,
    bundle_rows: Optional[int] = 131_072,
) -> "ray.data.Dataset":
    """Partitioned hash join of two arbitrarily large datasets.

    One shuffle keyed on ``hash(key) % num_buckets``; within each bucket the
    two sides are split by tag and merged with a vectorized pandas merge.
    Column name collisions (other than the key) are the caller's job to
    avoid. Size ``num_buckets`` ≈ total rows / desired bucket rows; skewed
    single keys are bounded by their own frequency (salt upstream when a
    single key is hot).

    Pass ``left_schema`` / ``right_schema`` when the input is a lazy plan
    whose schema Ray would otherwise have to execute blocks to discover
    (``Dataset.schema()`` on an unexecuted shuffle triggers real work).

    ``bundle_rows`` bundles the tag-map outputs so the sort shuffle sees
    ~that many rows per input block: Ray's sort materializes
    ``input_blocks × num_partitions`` intermediate objects, and a
    fragmented input (e.g. 2048-row encode batches at 4M rows) drives the
    driver/raylet into minutes of pure object-metadata scheduling with 0
    CPUs busy (measured: join-mode verify 19.5 s at 1M → 224 s at 2M →
    stalled ≥20 min at 4M; bundled, 4M verifies in ~90 s). The default
    suits narrow rows (ids + packed vectors); pass None to disable for
    wide-payload joins (e.g. rows carrying audio bytes) where a 131k-row
    block would be gigabytes.
    """
    if num_buckets is None:
        from .grouped import default_buckets

        num_buckets = default_buckets()
    right_on = right_on or on
    left_schema = left_schema or _arrow_schema(left)
    right_schema = right_schema or _arrow_schema(right)
    overlap = (set(left_schema.names) & set(right_schema.names)) - (
        {on} if on == right_on else set()
    )
    if overlap:
        raise ValueError(
            f"shuffle_join: column name collision {sorted(overlap)} — rename "
            "non-key columns before joining"
        )
    left_cols = list(left_schema.names)
    right_cols = list(right_schema.names)
    all_fields = {}
    for name, typ in zip(left_schema.names, left_schema.types):
        all_fields[name] = typ
    for name, typ in zip(right_schema.names, right_schema.types):
        all_fields.setdefault(name, typ)

    def prep(side: int, key: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {}
            n = len(t)
            for name, typ in all_fields.items():
                if name in t.column_names:
                    cols[name] = t[name]
                else:
                    cols[name] = pa.nulls(n, type=typ)
            cols[_SIDE_COL] = pa.array(np.full(n, side, dtype=np.int8))
            cols[_BUCKET_COL] = _key_bucket(t[key], num_buckets) if n else pa.array([], type=pa.int64())
            return pa.table(cols)

        return fn

    tagged = left.map_batches(
        prep(0, on), batch_format="pyarrow", batch_size=bundle_rows
    ).union(
        right.map_batches(prep(1, right_on), batch_format="pyarrow", batch_size=bundle_rows)
    )

    merge_how = "left" if how == "left" else "inner"
    out_cols = left_cols + [c for c in right_cols if c not in left_cols]
    int_cols = [
        name for name, typ in all_fields.items() if pa.types.is_integer(typ)
    ]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g[_SIDE_COL] == 0][left_cols]
        rhs = g[g[_SIDE_COL] == 1][right_cols]
        merged = lhs.merge(rhs, left_on=on, right_on=right_on, how=merge_how)
        # keep integer columns integer across buckets: pandas degrades int64
        # to float64 when a left join introduces NaN, and only in the buckets
        # where it does — normalize to nullable Int64 so block schemas agree
        for c in int_cols:
            if c in merged.columns and merged[c].dtype.kind == "f":
                merged[c] = merged[c].astype("Int64")
        # arrow output: zero-copy blocks, homogeneous block type downstream
        # (see functions/grouped.py run())
        return pa.Table.from_pandas(
            merged[[c for c in out_cols if c in merged.columns]],
            preserve_index=False,
        )

    return tagged.groupby(_BUCKET_COL, num_partitions=num_buckets).map_groups(
        merge_bucket, batch_format="pandas"
    )
