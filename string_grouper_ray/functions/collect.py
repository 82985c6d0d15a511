"""Fast driver-side collection.

``Dataset.take_all()`` builds a Python dict per row (≈0.5 ms/row — 20 s for
a 30k-row edge list). Hot paths that must collect small-but-not-tiny
results to the driver use these batch-wise collectors instead.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import ray
import ray.data


def collect_columns(ds: "ray.data.Dataset", cols: List[str]) -> Dict[str, np.ndarray]:
    """Collect the given columns as numpy arrays (batch-wise, no per-row
    Python objects)."""
    parts: Dict[str, List[np.ndarray]] = {c: [] for c in cols}
    for batch in ds.select_columns(cols).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for c in cols:
            parts[c].append(batch[c].to_numpy(zero_copy_only=False))
    return {
        c: (np.concatenate(v) if v else np.empty(0)) for c, v in parts.items()
    }


def collect_column_lists(ds: "ray.data.Dataset", cols: List[str]) -> Dict[str, list]:
    """Like collect_columns but returns Python lists (for string/object
    columns where numpy conversion is pointless)."""
    parts: Dict[str, list] = {c: [] for c in cols}
    for batch in ds.select_columns(cols).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        for c in cols:
            parts[c].extend(batch[c].to_pylist())
    return parts
