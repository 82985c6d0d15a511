"""Binary packing for ragged numeric payloads crossing pandas-based joins.

Arrow list columns that pass through a pandas stage become object arrays of
numpy arrays; Ray then re-infers them per block as tensor extension types —
FIXED-shape when a block happens to be rectangular, variable-shaped
otherwise — and concatenating mixed blocks fails inside the shuffle.
The robust transport is a single ``binary`` value per row: numpy bytes with
a tiny header. Pack before a shuffle_join, unpack in the consumer.
"""

from __future__ import annotations

import numpy as np


def pack_vector(ids: np.ndarray, weights: np.ndarray) -> bytes:
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    n = np.int32(len(ids))
    return n.tobytes() + ids.tobytes() + weights.tobytes()


def unpack_vector(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    n = int(np.frombuffer(data[:4], dtype=np.int32)[0])
    ids = np.frombuffer(data[4 : 4 + 4 * n], dtype=np.int32)
    ws = np.frombuffer(data[4 + 4 * n : 4 + 4 * n + 8 * n], dtype=np.float64)
    return ids, ws


def pack_u64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.uint64).tobytes()


def unpack_u64(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint64)
