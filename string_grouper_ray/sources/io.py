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
