"""Storage seam (S1/S2 in SURVEY.md §2.1).

The north rule's canonical storage is Lance; this sandbox has no ``pylance``
(SURVEY.md §4.3), so every reader/writer goes through this single seam:
Lance when the library is importable and the path looks like a Lance
dataset, Parquet otherwise — same schema, same directory layout, drop-in
switch on a real cluster.
"""

from __future__ import annotations

import os
from typing import List, Optional

import ray
import ray.data


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def _is_lance_path(path: str) -> bool:
    return path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions"))


def read_table(path: str, columns: Optional[List[str]] = None) -> "ray.data.Dataset":
    """Read a clip/doc table from Lance (if available) or Parquet/CSV."""
    if _is_lance_path(path) and _lance_available():
        return ray.data.read_lance(path, columns=columns)
    if path.endswith(".csv"):
        ds = ray.data.read_csv(path)
        return ds.select_columns(columns) if columns else ds
    return ray.data.read_parquet(path, columns=columns)


def write_table(ds: "ray.data.Dataset", path: str, **kwargs) -> None:
    """Write to Lance when requested and available, else sharded Parquet."""
    if path.endswith(".lance"):
        if not _lance_available():
            raise RuntimeError(
                "Lance output requested but pylance is not installed; "
                "write to a non-.lance path for the Parquet fallback"
            )
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)


def read_table_with_row_idx(
    path: str, columns: Optional[List[str]] = None
) -> Optional["ray.data.Dataset"]:
    """Parquet read with a global, deterministic, dense ``row_idx`` column —
    WITHOUT the ``zip(range(n))`` barrier (count pass + zip block alignment
    + repartition cost ~40 s at 1M rows and is parallelism-independent,
    i.e. pure serial floor for the scaling criterion).

    Offsets come from parquet footers only (driver-side, O(files) metadata
    reads, no data I/O); one read task per row-group then emits
    ``row_idx = group_offset + arange(rows)``. Returns None when ``path``
    is not plain parquet (Lance/CSV callers fall back to the zip path).
    """
    import glob as _glob

    if _is_lance_path(path) or path.endswith(".csv"):
        return None
    if os.path.isdir(path):
        # recursive: ray.data.read_parquet (the zip-path fallback) descends
        # into partition subdirectories, so this enumeration must too — a
        # top-level-only glob would silently DROP nested rows instead of
        # falling back
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        # mixed-format detection must walk the SAME tree the recursive glob
        # reads: a non-parquet file inside a nested partition subdirectory
        # would otherwise be silently skipped here while the generic reader
        # (the fallback this check exists to trigger) would try to read it
        for root, dirs, fnames in os.walk(path):
            dirs[:] = [d for d in dirs if not (d.startswith(".") or d.startswith("_"))]
            if any(
                not (e.startswith(".") or e.startswith("_")) and not e.endswith(".parquet")
                for e in fnames
            ):
                return None  # mixed-format directory: let the generic reader decide
    elif path.endswith(".parquet"):
        files = [path]
    else:
        return None
    if not files:
        return None

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    items = []
    offset = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            rows = meta.row_group(rg).num_rows
            items.append({"file": f, "row_group": rg, "offset": offset})
            offset += rows

    cols = columns

    def read_group(t: pa.Table) -> pa.Table:
        out = []
        for file, rg, off in zip(
            t["file"].to_pylist(), t["row_group"].to_pylist(), t["offset"].to_pylist()
        ):
            g = pq.ParquetFile(file).read_row_group(rg, columns=cols)
            out.append(
                g.append_column(
                    "row_idx", pa.array(off + np.arange(len(g), dtype=np.int64))
                )
            )
        return pa.concat_tables(out)

    return ray.data.from_items(items, override_num_blocks=len(items)).map_batches(
        read_group, batch_format="pyarrow", batch_size=1
    )
