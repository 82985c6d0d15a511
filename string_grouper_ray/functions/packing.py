"""Binary packing for ragged numeric payloads crossing pandas-based joins.

Arrow list columns that pass through a pandas stage become object arrays of
numpy arrays; Ray then re-infers them per block as tensor extension types —
FIXED-shape when a block happens to be rectangular, variable-shaped
otherwise — and concatenating mixed blocks fails inside the shuffle.
The robust transport is a single ``binary`` value per row (used by the
shingle-set joins of ``pipelines/dedup.py``). The tf-idf verify join does
NOT pack vectors anymore — it carries the (much smaller) texts and
re-encodes in the verifier (``stages/lsh._make_mset_verify``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa


def pack_u64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.uint64).tobytes()


def unpack_u64(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint64)


def unpack_binary_column(col, dtype) -> Tuple[np.ndarray, np.ndarray]:
    """Flatten an Arrow ``binary`` column of packed fixed-width payloads into
    ``(flat_values, element_offsets)`` — zero-copy off the Arrow buffers
    (one ``.view`` over the values buffer; no per-row ``frombuffer``).

    ``element_offsets`` has ``len(col) + 1`` entries; row ``i``'s payload is
    ``flat[element_offsets[i]:element_offsets[i+1]]``. Every row's byte
    length must be a multiple of ``dtype``'s itemsize (guaranteed by
    :func:`pack_u64`-style writers; raises otherwise).
    """
    dtype = np.dtype(dtype)
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=dtype), np.zeros(1, dtype=np.int64)
    off_dtype = np.int64 if pa.types.is_large_binary(a.type) else np.int32
    bufs = a.buffers()
    off = np.frombuffer(bufs[1], dtype=off_dtype)[a.offset : a.offset + n + 1].astype(
        np.int64
    )
    data = np.frombuffer(bufs[2], dtype=np.uint8)[off[0] : off[-1]]
    if data.size % dtype.itemsize:
        raise ValueError(
            f"unpack_binary_column: payload bytes not a multiple of {dtype.itemsize}"
        )
    if data.size and data.ctypes.data % dtype.itemsize:
        # non-aligned slice start (possible on sliced buffers): one copy
        flat = np.frombuffer(data.tobytes(), dtype=dtype)
    else:
        flat = data.view(dtype)
    return flat, (off - off[0]) // dtype.itemsize


def gather_ranges(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flatten index ranges [starts[i], starts[i]+lengths[i]) into one gather
    array (the ``_gather_positions`` pattern from sparse.py, shared here for
    packed-payload consumers)."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep_starts = np.repeat(starts, lengths)
    csum = np.cumsum(lengths) - lengths
    offsets = np.arange(total, dtype=np.int64) - np.repeat(csum, lengths)
    return rep_starts + offsets
