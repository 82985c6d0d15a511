"""Row-aligned pairwise cosine (operator M3; reference ``dot`` at
``/root/reference/string_grouper/string_grouper.py:433-440``).

The two sides are zip-joined on ``row_idx`` (one bucketed shuffle of the raw
strings), then a single stateful ``map_batches`` stage encodes both texts
against the shared corpus and computes the sparse dot per row — the vectors
never travel through a shuffle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..corpus import fit_vocabulary
from ..functions.joins import shuffle_join
from ..sparse import Vocabulary, pairwise_dot
from ..stages.vectorize import TfidfEncoder


class _PairwiseDot:
    def __init__(self, vocab_ref, config: EngineConfig):
        self.encoder = TfidfEncoder(vocab_ref, config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = self.encoder.encode_batch(batch["text"].to_pylist())
        b = self.encoder.encode_batch(batch["r_text"].to_pylist())
        sims = pairwise_dot(a, b)
        return pa.table(
            {"row_idx": batch["row_idx"], "similarity": pa.array(sims, type=pa.float64())}
        )


def pairwise_similarities(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    vocab: Optional[Vocabulary] = None,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Dataset of (row_idx, similarity) for row-aligned inputs.

    Raises if the two sides have different row counts (reference
    ``string_grouper.py:435-436``).
    """
    config = config or EngineConfig()
    if left.count() != right.count():
        raise ValueError("To perform this function, both input Series must have the same length.")
    if vocab is None:
        vocab = fit_vocabulary([left, right], text_col, config)
    vocab_ref = ray.put(vocab)
    lt = left.select_columns(["row_idx", text_col])
    if text_col != "text":
        lt = lt.map_batches(lambda t: t.rename_columns(["row_idx", "text"]), batch_format="pyarrow")
    rt = right.select_columns(["row_idx", text_col]).map_batches(
        lambda t: t.rename_columns(["row_idx", "r_text"]), batch_format="pyarrow"
    )
    from ..functions.stagemap import stage_map_batches

    joined = shuffle_join(lt, rt, on="row_idx", how="inner")
    return stage_map_batches(
        joined,
        _PairwiseDot,
        (vocab_ref, config),
        config,
        batch_format="pyarrow",
        batch_size=config.batch_size,
    )
