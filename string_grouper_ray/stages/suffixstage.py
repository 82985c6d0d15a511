"""Containment pass (operator F4 in SURVEY.md §2.3; north_rule "suffix-array
substring pass catches exact contained duplicates that MinHash misses").

MinHash similarity degrades for containments: a short transcript fully
contained in a long one shares all its shingles, but Jaccard (and char
tf-idf cosine) drops with the length ratio, so truncations can fall below
the similarity threshold while still being duplicates.

Distributed formulation (no global suffix array is materialized):

1. normalize transcripts (same normalizer as the match path, M1),
2. global ``Dataset.sort`` on the normalized string — in sorted order all
   strings having prefix ``x`` form a contiguous range immediately after
   ``x`` itself,
3. a per-block sorted scan with a prefix stack emits (contained ⊑
   container) edges with similarity 1.0,
4. a boundary-strip pass (last/first ``strip_width`` rows of adjacent
   blocks, collected — a few hundred rows per block boundary) catches
   ranges that cross block boundaries.

Caveat (documented): this catches PREFIX containment exactly — the
generator's truncation duplicates (FIXTURES.md F6). Mid-string substring
containment is left to the shingle-overlap candidates of the LSH path; a
prefix range longer than ``strip_width`` spanning 3+ blocks may lose its
cross-block edges (bounded by repartitioning before the scan).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..text import NGramTokenizer


class _Normalize:
    def __init__(self, config: EngineConfig, text_col: str):
        self.tokenizer = NGramTokenizer(config)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        norm = [self.tokenizer.normalize(s) for s in texts]
        return pa.table({"row_idx": t["row_idx"], "norm": pa.array(norm, type=pa.string())})


def _prefix_scan(
    norms: List[str], rows: List[int], min_len: int, min_ratio: float = 0.6
) -> pd.DataFrame:
    """Sorted scan with a prefix stack: emit (contained_row, container_row).

    ``min_ratio`` requires the contained prefix to cover at least that
    fraction of the container — a short shared prefix (e.g. a common first
    word) is not a duplicate and would otherwise merge unrelated clusters.
    """
    out_l: List[int] = []
    out_r: List[int] = []
    stack: List[tuple] = []  # (norm, row)
    for s, r in zip(norms, rows):
        while stack and not s.startswith(stack[-1][0]):
            stack.pop()
        for pnorm, prow in stack:
            if (
                len(pnorm) >= min_len
                and len(s) > len(pnorm)
                and len(pnorm) >= min_ratio * len(s)
            ):
                out_l.append(min(prow, r))
                out_r.append(max(prow, r))
        stack.append((s, r))
    return pd.DataFrame(
        {
            "left_idx": np.asarray(out_l, dtype=np.int64),
            "right_idx": np.asarray(out_r, dtype=np.int64),
            "similarity": np.ones(len(out_l), dtype=np.float64),
        }
    )


class _BlockScan:
    def __init__(self, min_len: int):
        self.min_len = min_len

    def __call__(self, t: pa.Table) -> pa.Table:
        norms = t["norm"].to_pylist()
        rows = t["row_idx"].to_pylist()
        df = _prefix_scan(norms, rows, self.min_len)
        return pa.Table.from_pandas(df, preserve_index=False)


def containment_edges(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    text_col: str = "text",
    min_len: int = 6,
    strip_width: int = 100,
) -> "ray.data.Dataset":
    """Edges (left_idx, right_idx, similarity=1.0) for prefix containments.

    ``min_len`` ignores trivially-short prefixes (noise floor).
    """
    config = config or EngineConfig()
    from ..functions.stagemap import stage_map_batches

    norm = stage_map_batches(
        ds, _Normalize, (config, text_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )
    sorted_ds = norm.sort("norm").materialize()

    in_block = stage_map_batches(
        sorted_ds, _BlockScan, (min_len,), config,
        batch_format="pyarrow", batch_size=None,
    )

    # boundary strips: head/tail of each block, scanned together on the driver
    def strip(t: pa.Table) -> pa.Table:
        n = len(t)
        if n <= 2 * strip_width:
            return t
        head = t.slice(0, strip_width)
        tail = t.slice(n - strip_width, strip_width)
        return pa.concat_tables([head, tail])

    from ..functions.collect import collect_column_lists

    strip_cols = collect_column_lists(
        sorted_ds.map_batches(strip, batch_format="pyarrow", batch_size=None),
        ["row_idx", "norm"],
    )
    if strip_cols["norm"]:
        pairs_sorted = sorted(zip(strip_cols["norm"], strip_cols["row_idx"]))
        strip_df = _prefix_scan(
            [p[0] for p in pairs_sorted], [p[1] for p in pairs_sorted], min_len
        )
    else:
        strip_df = pd.DataFrame(
            {"left_idx": [], "right_idx": [], "similarity": []}
        ).astype({"left_idx": np.int64, "right_idx": np.int64, "similarity": np.float64})
    boundary = ray.data.from_pandas(strip_df)

    out = in_block.union(boundary)
    # dedup (strip edges overlap in-block edges)
    from ..functions.grouped import dedup_pairs

    return dedup_pairs(out, ["left_idx", "right_idx"], agg_col="similarity")
