"""Distributed corpus fit (operators F1/F2, A1 in SURVEY.md).

The reference fits a ``TfidfVectorizer`` on the concatenation of master and
duplicates on the driver (``/root/reference/string_grouper/string_grouper.py:699-707``).
Here the fit is a Ray Data aggregation:

    union(sides) → map_batches(partial doc-frequency count per batch)
                 → groupby("ngram").sum("df")         # the only shuffle
                 → driver collect (vocab is small: char n-gram space is
                   bounded — ≤ ~1e6 distinct trigrams even at 10^12 rows)
                 → Vocabulary artifact → ray.put (broadcast, read once
                   per actor — never re-shipped per batch)

Partial aggregation inside ``map_batches`` keeps the shuffle tiny: one row
per distinct ngram per *batch*, not per document occurrence.

The fitted ``Vocabulary`` is reusable across calls (reference
``reset_data`` semantics, ``string_grouper.py:310-323``): pass it back into
the pipelines via ``corpus=`` to encode new data against an old vocabulary.
"""

from __future__ import annotations

from collections import Counter
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .config import EngineConfig
from .sparse import Vocabulary
from .text import NGramTokenizer


class _PartialDocFreq:
    """map_batches stage: per-batch partial document-frequency counts."""

    def __init__(self, config: EngineConfig, text_col: str):
        self.tokenizer = NGramTokenizer(config)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        empty = pa.table({"ngram": pa.array([], type=pa.string()),
                          "df": pa.array([], type=pa.int64())})
        cfg = self.tokenizer.config
        n = cfg.ngram_size
        normed = self.tokenizer.normalized_batch(texts)
        if n <= 7 and (cfg.normalize_to_ascii or all(s.isascii() for s in normed)):
            # vectorized distinct-per-doc count: pack every length-n ASCII
            # window into a uint64 key (same packing as the encoder's fast
            # path), dedup (row, key) pairs, then run-length count per key.
            # Key→string decode runs only per DISTINCT gram per batch.
            blob = "".join(normed).encode("ascii")
            arr = np.frombuffer(blob, dtype=np.uint8)
            nrows = len(normed)
            lens = np.fromiter((len(s) for s in normed), dtype=np.int64, count=nrows)
            gl = np.maximum(lens - n + 1, 0)
            total = len(arr) - n + 1
            if nrows == 0 or total <= 0 or not gl.any():
                return empty
            offs = np.zeros(nrows + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            key_all = np.zeros(total, dtype=np.uint64)
            for j in range(n):
                key_all <<= np.uint64(8)
                key_all |= arr[j : total + j].astype(np.uint64)
            nz = gl > 0
            gl_nz = gl[nz]
            base = np.zeros(len(gl_nz), dtype=np.int64)
            np.cumsum(gl_nz[:-1], out=base[1:])
            pos = (
                np.arange(int(gl_nz.sum()), dtype=np.int64)
                - np.repeat(base, gl_nz)
                + np.repeat(offs[:-1][nz], gl_nz)
            )
            rows = np.repeat(np.flatnonzero(nz), gl_nz)
            keys = key_all[pos]
            order = np.lexsort((keys, rows))
            rows, keys = rows[order], keys[order]
            keep = np.ones(len(rows), dtype=bool)
            keep[1:] = (rows[1:] != rows[:-1]) | (keys[1:] != keys[:-1])
            dk = np.sort(keys[keep])
            bound = np.ones(len(dk), dtype=bool)
            bound[1:] = dk[1:] != dk[:-1]
            starts = np.flatnonzero(bound)
            uniq = dk[starts]
            dfs = np.diff(np.append(starts, len(dk)))
            # unpack keys back to gram strings (one decode, n-char slices)
            chars = np.empty((len(uniq), n), dtype=np.uint8)
            for j in range(n):
                chars[:, n - 1 - j] = ((uniq >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)
            big = chars.tobytes().decode("ascii")
            grams = [big[i * n : (i + 1) * n] for i in range(len(uniq))]
            return pa.table({
                "ngram": pa.array(grams, type=pa.string()),
                "df": pa.array(dfs.astype(np.int64)),
            })
        counter: Counter = Counter()
        for s in normed:
            counter.update({s[i : i + n] for i in range(len(s) - n + 1)})
        if not counter:
            return empty
        return pa.table({
            "ngram": pa.array(list(counter.keys()), type=pa.string()),
            "df": pa.array(list(counter.values()), type=pa.int64()),
        })


def fit_vocabulary(
    datasets: Sequence["ray.data.Dataset"],
    text_col: str = "text",
    config: Optional[EngineConfig] = None,
) -> Vocabulary:
    """Fit the tf-idf vocabulary over the union of the given datasets.

    Mirrors ``_fit_vectorizer`` (fit over concat of both sides when
    duplicates are present, ``string_grouper.py:699-707``).
    """
    config = config or EngineConfig()
    ds = datasets[0]
    for other in datasets[1:]:
        ds = ds.union(other)
    n_docs = ds.count()
    from .functions.collect import collect_column_lists
    from .functions.stagemap import stage_map_batches

    from .functions.grouped import groupby_agg

    partials = stage_map_batches(
        ds,
        _PartialDocFreq,
        (config, text_col),
        config,
        batch_format="pyarrow",
        batch_size=config.batch_size,
    )
    agg = groupby_agg(partials, "ngram", "df", "sum")
    cols = collect_column_lists(agg, ["ngram", "sum(df)"])
    return Vocabulary.from_doc_frequencies(cols["ngram"], cols["sum(df)"], n_docs)


def fit_vocabulary_local(
    texts_list: Sequence[Sequence[str]], config: Optional[EngineConfig] = None
) -> Vocabulary:
    """Driver-local fit for small inputs (compat layer / tests)."""
    config = config or EngineConfig()
    tokenizer = NGramTokenizer(config)
    counter: Counter = Counter()
    n_docs = 0
    for texts in texts_list:
        n_docs += len(texts)
        for grams in tokenizer.ngrams_batch(list(texts)):
            counter.update(set(grams))
    ngrams = list(counter.keys())
    dfs = [counter[g] for g in ngrams]
    return Vocabulary.from_doc_frequencies(ngrams, dfs, n_docs)
