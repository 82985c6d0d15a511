"""TF-IDF encode stage (operator M2 in SURVEY.md §2.2).

A stateful ``map_batches`` actor stage: the fitted :class:`Vocabulary` is
fetched from the object store once per actor in ``__init__`` (broadcast via
``ray.put`` — never re-shipped per batch), then every batch is tokenized and
encoded into two Arrow list columns:

    term_ids:     list<int32>    sorted ascending per row
    term_weights: list<double>   L2-normalized tf-idf weights

Equivalent of ``self._vectorizer.transform(...)`` at
``/root/reference/string_grouper/string_grouper.py:689-695`` but per-batch,
zero-copy Arrow in/out, with no global matrix.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig
from ..sparse import CSRBatch, Vocabulary, encode_tfidf, encode_tfidf_ascii
from ..text import NGramTokenizer


class TfidfEncoder:
    def __init__(self, vocab_ref: Union["ray.ObjectRef", Vocabulary],
                 config: Optional[EngineConfig] = None,
                 text_col: str = "text"):
        self.vocab: Vocabulary = (
            ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        )
        self.config = config or EngineConfig()
        self.tokenizer = NGramTokenizer(self.config)
        self.text_col = text_col

    def encode_batch(self, texts) -> CSRBatch:
        cfg = self.config
        if cfg.ngram_size <= 7:
            # vectorized path: grams pack into uint64 keys, one searchsorted
            # against the packed vocab — ~20× the loop encoder. Requires
            # ASCII bytes == chars; normalize_to_ascii guarantees it, else
            # verify per batch (isascii is a C flag check).
            normed = self.tokenizer.normalized_batch(texts)
            if cfg.normalize_to_ascii or all(s.isascii() for s in normed):
                return encode_tfidf_ascii(
                    normed, self.vocab, cfg.ngram_size,
                    dtype=cfg.tfidf_matrix_dtype,
                )
            grams = [
                [s[i : i + cfg.ngram_size] for i in range(len(s) - cfg.ngram_size + 1)]
                for s in normed
            ]
            return encode_tfidf(grams, self.vocab, dtype=cfg.tfidf_matrix_dtype)
        grams = self.tokenizer.ngrams_batch(texts)
        return encode_tfidf(grams, self.vocab, dtype=self.config.tfidf_matrix_dtype)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        csr = self.encode_batch(texts)
        ids, ws = csr.to_lists()
        batch = batch.append_column(
            "term_ids", pa.array([a.tolist() for a in ids], type=pa.list_(pa.int32()))
        )
        batch = batch.append_column(
            "term_weights", pa.array([a.tolist() for a in ws], type=pa.list_(pa.float64()))
        )
        return batch


def csr_from_arrow(batch: pa.Table, n_cols: int) -> CSRBatch:
    """Rebuild a CSRBatch from the term_ids/term_weights list columns.

    Uses ``pc.list_flatten`` / ``list_value_length`` so chunked and sliced
    list arrays are handled uniformly.
    """
    import pyarrow.compute as pc

    ids_col = batch["term_ids"]
    ws_col = batch["term_weights"]
    lens = pc.list_value_length(ids_col).to_numpy(zero_copy_only=False).astype(np.int64)
    indptr = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    indices = pc.list_flatten(ids_col).to_numpy(zero_copy_only=False).astype(np.int32)
    data = pc.list_flatten(ws_col).to_numpy(zero_copy_only=False).astype(np.float64)
    return CSRBatch(indptr=indptr, indices=indices, data=data, n_cols=n_cols)
