"""Top-1 fuzzy lookup — ``match_most_similar`` semantics (operator J4;
reference ``_get_nearest_matches`` at
``/root/reference/string_grouper/string_grouper.py:783-849``).

    edges (cross join, top-N per master row)
      → per-dupe best master: max similarity, ties → min master row
        (groupby right_idx)
      → LEFT join onto the duplicates table (unmatched dupes keep
        themselves — the COALESCE at string_grouper.py:816-820)
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..functions.joins import shuffle_join


def best_master_per_dupe(
    edges: "ray.data.Dataset", config: Optional[EngineConfig] = None
) -> "ray.data.Dataset":
    """(right_idx, best_left_idx, similarity): max-sim master per duplicate,
    ties broken by the lowest master row (string_grouper.py:803-807)."""

    import numpy as np

    from ..functions.grouped import bucketed_group_map

    def best_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # tie-break on similarity rounded to 9 decimals so the winner is
        # invariant to float summation order across partitions/engines
        # (sub-1e-9 differences are genuine ties; same trick as cluster reps)
        df = df.assign(__tie_sim=df["similarity"].round(9)).sort_values(
            ["right_idx", "__tie_sim", "left_idx"],
            ascending=[True, False, True],
            kind="stable",
        )
        firsts = df.groupby("right_idx", sort=False).head(1)
        return pd.DataFrame(
            {
                "right_idx": firsts["right_idx"].to_numpy(dtype=np.int64),
                "best_left_idx": firsts["left_idx"].to_numpy(dtype=np.int64),
                "similarity": firsts["similarity"].to_numpy(dtype=np.float64),
            }
        )

    return bucketed_group_map(edges, ["right_idx"], best_bucket)


def nearest_join(
    duplicates: "ray.data.Dataset",
    master: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Left join the best-master picks onto the duplicates table.

    Output columns: row_idx (dupe row), most_similar_idx (master row, or the
    dupe's own row when unmatched), most_similar_text (COALESCEd), similarity
    (null when unmatched), matched.
    """
    config = config or EngineConfig()
    best = best_master_per_dupe(edges, config)
    text_type = duplicates.schema().base_schema.field(text_col).type
    joined_schema = pa.schema(
        [
            ("row_idx", pa.int64()),
            (text_col, text_type),
            ("right_idx", pa.int64()),
            ("best_left_idx", pa.int64()),
            ("similarity", pa.float64()),
        ]
    )
    joined = shuffle_join(
        duplicates.select_columns(["row_idx", text_col]),
        best,
        on="row_idx",
        right_on="right_idx",
        how="left",
    )
    master_texts = master.select_columns(["row_idx", text_col]).map_batches(
        lambda t: t.rename_columns(["m_idx", "m_text"]), batch_format="pyarrow"
    )
    joined = shuffle_join(
        joined,
        master_texts,
        on="best_left_idx",
        right_on="m_idx",
        how="left",
        left_schema=joined_schema,
        right_schema=pa.schema([("m_idx", pa.int64()), ("m_text", text_type)]),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # PYARROW HAZARD (16.1): pc.coalesce over two ChunkedArrays with
        # DIFFERENT chunk layouts silently misaligns values (a double cast
        # collapses one side to a single chunk while the sibling column
        # keeps the block's 16-odd concat chunks; observed as unmatched
        # dupes coalescing to another row's id). Normalize layouts first.
        t = t.combine_chunks()
        # a bucket where no dupe matched produces all-null columns that Arrow
        # types as `null` — cast to the expected types before coalescing
        m_text = t["m_text"]
        if pa.types.is_null(m_text.type):
            m_text = m_text.cast(text_type)
        best_idx = t["best_left_idx"].cast(pa.float64()).cast(pa.int64(), safe=False)
        matched = pc.is_valid(t["best_left_idx"])
        return pa.table(
            {
                "row_idx": t["row_idx"].cast(pa.int64()),
                "most_similar_idx": pc.coalesce(best_idx, t["row_idx"].cast(pa.int64())),
                "most_similar_text": pc.coalesce(m_text, t[text_col]),
                "similarity": t["similarity"].cast(pa.float64()),
                "matched": matched,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")
