"""Driver-table → Dataset helpers."""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data


def from_arrow_sliced(out_tbl: pa.Table) -> "ray.data.Dataset":
    """``ray.data.from_arrow`` with the driver-built table split into
    ~CPU-count blocks so downstream maps / joins get task fan-out instead
    of one giant block."""
    try:
        cpus = max(1, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        cpus = 8
    n_slices = max(1, min(cpus, len(out_tbl) // 65_536 + 1))
    step = -(-len(out_tbl) // n_slices) if len(out_tbl) else 1
    slices = [out_tbl.slice(i * step, step) for i in range(n_slices)] or [out_tbl]
    return ray.data.from_arrow(slices if len(slices) > 1 else slices[0])
