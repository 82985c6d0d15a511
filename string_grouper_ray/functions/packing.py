"""Binary packing for ragged numeric payloads crossing pandas-based joins.

Arrow list columns that pass through a pandas stage become object arrays of
numpy arrays; Ray then re-infers them per block as tensor extension types —
FIXED-shape when a block happens to be rectangular, variable-shaped
otherwise — and concatenating mixed blocks fails inside the shuffle.
The robust transport is a single ``binary`` value per row (used by the
shingle-set joins of ``pipelines/dedup.py``). The tf-idf verify join does
NOT pack vectors anymore — it carries the (much smaller) texts and
re-encodes in the verifier (``stages/lsh._VerifyCosineFromText``).
"""

from __future__ import annotations

import numpy as np


def pack_u64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.uint64).tobytes()


def unpack_u64(data: bytes) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint64)
