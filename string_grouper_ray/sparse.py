"""Pure-numpy sparse TF-IDF + top-N cosine kernels.

scipy / scikit-learn / sparse_dot_topn are not available in this environment
(SURVEY.md §4.3), so this module reimplements the numeric core of the
reference exactly:

* TF-IDF encoding with sklearn ``TfidfVectorizer`` defaults — raw term
  counts, smooth IDF ``ln((1+N)/(1+df)) + 1``, L2 row normalization,
  alphabetically-ordered vocabulary (so the reference's tf-idf matrix
  goldens at ``test_string_grouper.py:519-556`` reproduce bit-for-bit).
* The top-N thresholded sparse matrix product of
  ``sp_matmul_topn`` (called at ``string_grouper.py:725,737``), implemented
  as a CSR × CSC-postings product with a bounded dense accumulator
  (``np.bincount`` over flattened (row, col) keys) — fully vectorized, no
  Python loop over matrix entries.

All kernels are batch-local: the Ray pipeline calls them inside
``map_batches`` tasks; no global matrix is ever materialized.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np


# --------------------------------------------------------------------------
# Vocabulary / IDF artifact (broadcast via ray.put; see corpus.py)
# --------------------------------------------------------------------------


@dataclass
class Vocabulary:
    """Fitted corpus state: {ngram -> column}, IDF weights, corpus size.

    Equivalent of the fitted sklearn vectorizer held by the reference driver
    (``string_grouper.py:305-308``), but a plain picklable artifact that is
    broadcast to actors.
    """

    index: Dict[str, int]  # ngram -> column id (alphabetic rank, as sklearn)
    idf: np.ndarray  # float64 [vocab_size]
    n_docs: int

    @property
    def size(self) -> int:
        return len(self.index)

    @classmethod
    def from_doc_frequencies(cls, ngrams: Sequence[str], dfs: Sequence[int], n_docs: int) -> "Vocabulary":
        """Build from (ngram, document-frequency) pairs.

        sklearn sorts feature names alphabetically and computes smooth IDF:
        ``idf = ln((1 + n) / (1 + df)) + 1``.
        """
        order = np.argsort(np.asarray(ngrams, dtype=object))
        index: Dict[str, int] = {}
        df_sorted = np.empty(len(order), dtype=np.float64)
        for rank, i in enumerate(order):
            index[ngrams[i]] = rank
            df_sorted[rank] = dfs[i]
        idf = np.log((1.0 + n_docs) / (1.0 + df_sorted)) + 1.0
        return cls(index=index, idf=idf, n_docs=n_docs)

    def packed_index(self) -> Tuple[np.ndarray, np.ndarray]:
        """Sorted uint64-key view of the term index for the vectorized
        encoder: key = (utf8_len << 56) | right-aligned utf-8 bytes.

        Terms whose utf-8 encoding exceeds 7 bytes are omitted — the
        length tag makes keys of different byte lengths distinct, and the
        fast path only ever probes with grams of byte length == ngram_size
        ≤ 7, which a longer term can never equal. Built lazily once per
        process (the dict ships via ray.put; this view rebuilds locally)."""
        cached = self.__dict__.get("_packed")
        if cached is not None:
            return cached
        keys: List[int] = []
        cols: List[int] = []
        for t, c in self.index.items():
            b = t.encode("utf-8")
            if len(b) <= 7:
                keys.append((len(b) << 56) | int.from_bytes(b, "big"))
                cols.append(c)
        karr = np.array(keys, dtype=np.uint64)
        carr = np.array(cols, dtype=np.int64)
        order = np.argsort(karr)
        cached = (karr[order], carr[order])
        self.__dict__["_packed"] = cached
        return cached

    def dense3_table(self) -> np.ndarray:
        """Dense trigram → column table for the default ``ngram_size=3``
        ASCII fast path: index = (b0 << 14) | (b1 << 7) | b2 over 7-bit
        ASCII bytes, value = column id or -1. 128³ int32 = 8 MB, built
        lazily once per process — it turns the per-gram vocabulary probe
        into one gather (measured ~6× the uint64 binary search). Vocab
        terms with non-ASCII bytes are unreachable from ASCII probes and
        are simply absent."""
        t = self.__dict__.get("_dense3")
        if t is not None:
            return t
        keys, cols = self.packed_index()
        tag3 = (keys >> np.uint64(56)) == np.uint64(3)
        k3 = keys[tag3]
        c3 = cols[tag3]
        b0 = ((k3 >> np.uint64(16)) & np.uint64(0xFF)).astype(np.int64)
        b1 = ((k3 >> np.uint64(8)) & np.uint64(0xFF)).astype(np.int64)
        b2 = (k3 & np.uint64(0xFF)).astype(np.int64)
        ok = (b0 < 128) & (b1 < 128) & (b2 < 128)
        t = np.full(128 ** 3, -1, dtype=np.int32)
        t[(b0[ok] << 14) | (b1[ok] << 7) | b2[ok]] = c3[ok].astype(np.int32)
        self.__dict__["_dense3"] = t
        return t


# --------------------------------------------------------------------------
# CSR batch representation
# --------------------------------------------------------------------------


@dataclass
class CSRBatch:
    """A batch of L2-normalized tf-idf rows in CSR layout."""

    indptr: np.ndarray  # int64 [n_rows + 1]
    indices: np.ndarray  # int32 [nnz], sorted ascending within each row
    data: np.ndarray  # float [nnz]
    n_cols: int

    @property
    def n_rows(self) -> int:
        return len(self.indptr) - 1

    def row_slices(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.indptr[:-1], self.indptr[1:]

    def to_lists(self) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Split into per-row (ids, weights) arrays — the Arrow list-column
        representation carried through the Dataset."""
        ids = np.split(self.indices, self.indptr[1:-1])
        ws = np.split(self.data, self.indptr[1:-1])
        return ids, ws

    @classmethod
    def from_lists(cls, ids: Sequence[np.ndarray], ws: Sequence[np.ndarray], n_cols: int) -> "CSRBatch":
        lens = np.fromiter((len(a) for a in ids), dtype=np.int64, count=len(ids))
        indptr = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(lens, out=indptr[1:])
        indices = np.concatenate(ids) if len(ids) else np.empty(0, dtype=np.int32)
        data = np.concatenate(ws) if len(ws) else np.empty(0, dtype=np.float64)
        return cls(indptr=indptr, indices=indices.astype(np.int32, copy=False),
                   data=data, n_cols=n_cols)


def encode_tfidf(
    ngram_lists: Sequence[Sequence[str]],
    vocab: Vocabulary,
    dtype: type = np.float64,
) -> CSRBatch:
    """Transform tokenized documents into L2-normalized tf-idf CSR rows.

    Matches ``TfidfVectorizer.transform`` (raw tf × smooth idf, L2 norm);
    n-grams absent from the vocabulary are dropped, exactly like sklearn
    transform on unseen tokens.
    """
    index = vocab.index
    idf = vocab.idf
    indptr = np.zeros(len(ngram_lists) + 1, dtype=np.int64)
    all_ids: List[np.ndarray] = []
    all_ws: List[np.ndarray] = []
    for i, grams in enumerate(ngram_lists):
        counts: Dict[int, int] = {}
        for g in grams:
            col = index.get(g)
            if col is not None:
                counts[col] = counts.get(col, 0) + 1
        if counts:
            cols = np.fromiter(counts.keys(), dtype=np.int32, count=len(counts))
            tfs = np.fromiter(counts.values(), dtype=np.float64, count=len(counts))
            order = np.argsort(cols)
            cols = cols[order]
            w = tfs[order] * idf[cols]
            norm = np.sqrt(np.dot(w, w))
            if norm > 0:
                w = w / norm
            all_ids.append(cols)
            all_ws.append(w.astype(dtype, copy=False))
            indptr[i + 1] = indptr[i] + len(cols)
        else:
            indptr[i + 1] = indptr[i]
    indices = np.concatenate(all_ids) if all_ids else np.empty(0, dtype=np.int32)
    data = np.concatenate(all_ws) if all_ws else np.empty(0, dtype=dtype)
    return CSRBatch(indptr=indptr, indices=indices, data=data, n_cols=vocab.size)


def encode_tfidf_ascii(
    normed: Sequence[str],
    vocab: Vocabulary,
    ngram_size: int,
    dtype: type = np.float64,
) -> CSRBatch:
    """Vectorized twin of :func:`encode_tfidf` over ALREADY-NORMALIZED
    ASCII strings (``NGramTokenizer.normalized_batch`` output).

    Semantics match the loop version exactly — same per-row ascending
    column order, raw tf × smooth idf, L2 norm — but grams never become
    Python objects: the batch's bytes concatenate into one uint8 array,
    every length-n window packs into a uint64 key in n shift-or passes,
    vocabulary lookup is one ``searchsorted`` against the packed index,
    and per-(row, col) term counts come from one sort + run-length scan.
    (The only float-level difference is the L2 norm's summation order —
    sequential ``reduceat`` vs BLAS ``dot`` — which is ≤1 ulp on real
    rows; the 1e-12 matrix goldens pin this.)

    Caller guarantees: every string is pure ASCII and ``ngram_size <= 7``
    (the packed-key length tag's range). ``TfidfEncoder.encode_batch``
    enforces both and falls back to the loop path otherwise.
    """
    n = ngram_size
    nrows = len(normed)
    vkeys, vcols = vocab.packed_index()
    indptr = np.zeros(nrows + 1, dtype=np.int64)
    empty = CSRBatch(
        indptr=indptr,
        indices=np.empty(0, dtype=np.int32),
        data=np.empty(0, dtype=dtype),
        n_cols=vocab.size,
    )
    if nrows == 0 or len(vkeys) == 0:
        return empty
    blob = "".join(normed).encode("ascii")
    arr = np.frombuffer(blob, dtype=np.uint8)
    lens = np.fromiter((len(s) for s in normed), dtype=np.int64, count=nrows)
    offs = np.zeros(nrows + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    gl = np.maximum(lens - n + 1, 0)  # grams per row
    total = len(arr) - n + 1
    if total <= 0 or not gl.any():
        return empty
    nz = gl > 0
    pos = _gather_positions(offs[:-1][nz], gl[nz])
    rows = np.repeat(np.arange(nrows, dtype=np.int64)[nz], gl[nz])
    if n == 3:
        # default-config path: one dense-table gather per gram, no binary
        # search (ASCII bytes are ≤ 0x7F, so 7-bit packing is exact)
        tab = vocab.dense3_table()
        idx_all = (
            (arr[0:total].astype(np.int32) << 14)
            | (arr[1 : total + 1].astype(np.int32) << 7)
            | arr[2 : total + 2]
        )
        cols_all = tab[idx_all[pos]]
        ok = cols_all >= 0
        if not ok.any():
            return empty
        cols = cols_all[ok].astype(np.int64)
        rows = rows[ok]
    else:
        key_all = np.zeros(total, dtype=np.uint64)
        for j in range(n):
            key_all <<= np.uint64(8)
            key_all |= arr[j : total + j].astype(np.uint64)
        key_all |= np.uint64(n) << np.uint64(56)
        keys = key_all[pos]
        # vocabulary lookup (unseen grams drop, like sklearn transform)
        ip = np.searchsorted(vkeys, keys)
        ok = ip < len(vkeys)
        ok[ok] = vkeys[ip[ok]] == keys[ok]
        if not ok.any():
            return empty
        cols = vcols[ip[ok]]
        rows = rows[ok]
    # (row, col) term counts: sort the combined key once, run-length scan.
    # rows < 2^31 per batch and cols < vocab.size keep the product in int64.
    combo = rows * np.int64(vocab.size) + cols
    combo.sort(kind="stable")
    bound = np.ones(len(combo), dtype=bool)
    bound[1:] = combo[1:] != combo[:-1]
    starts = np.flatnonzero(bound)
    combo_u = combo[starts]
    tf = np.diff(np.append(starts, len(combo))).astype(np.float64)
    rows_u = combo_u // np.int64(vocab.size)
    cols_u = (combo_u % np.int64(vocab.size)).astype(np.int64)
    w = tf * vocab.idf[cols_u]
    # per-row L2 norm: rows_u is non-decreasing (combo sorted row-major)
    rstart = np.ones(len(rows_u), dtype=bool)
    rstart[1:] = rows_u[1:] != rows_u[:-1]
    rpos = np.flatnonzero(rstart)
    norm = np.sqrt(np.add.reduceat(w * w, rpos))
    counts = np.diff(np.append(rpos, len(rows_u)))
    nz_norm = norm > 0
    norm[~nz_norm] = 1.0
    w = w / np.repeat(norm, counts)
    row_nnz = np.bincount(rows_u, minlength=nrows)
    np.cumsum(row_nnz, out=indptr[1:])
    return CSRBatch(
        indptr=indptr,
        indices=cols_u.astype(np.int32),
        data=w.astype(dtype, copy=False),
        n_cols=vocab.size,
    )


# --------------------------------------------------------------------------
# CSC postings (the broadcast right-hand side of the top-N product)
# --------------------------------------------------------------------------


@dataclass
class Postings:
    """Column-major (term -> [(row, weight)]) view of a CSR chunk."""

    col_ptr: np.ndarray  # int64 [n_cols + 1]
    row_idx: np.ndarray  # int32 [nnz]
    weight: np.ndarray  # float [nnz]
    n_rows: int  # rows in the underlying chunk
    row_offset: int = 0  # global row id of this chunk's first row

    @classmethod
    def from_csr(cls, csr: CSRBatch, row_offset: int = 0) -> "Postings":
        nnz = len(csr.indices)
        rows = np.repeat(
            np.arange(csr.n_rows, dtype=np.int32), np.diff(csr.indptr).astype(np.int64)
        )
        order = np.argsort(csr.indices, kind="stable")
        sorted_cols = csr.indices[order]
        col_counts = np.bincount(sorted_cols, minlength=csr.n_cols) if nnz else np.zeros(csr.n_cols, dtype=np.int64)
        col_ptr = np.zeros(csr.n_cols + 1, dtype=np.int64)
        np.cumsum(col_counts, out=col_ptr[1:])
        return cls(
            col_ptr=col_ptr,
            row_idx=rows[order],
            weight=csr.data[order],
            n_rows=csr.n_rows,
            row_offset=row_offset,
        )

    @property
    def n_cols(self) -> int:
        return len(self.col_ptr) - 1

    def dense(self) -> np.ndarray:
        """Densified (n_cols × n_rows) float64 view.

        Used by the tiny-vocabulary gemm fast path of :func:`topn_multiply`;
        only ever built when ``n_rows × n_cols`` fits the dense cutoff there
        (≤32M cells = ≤256 MB float64). Cached on the worker-resident copy
        only from the SECOND call on: a one-shot dense branch (common when
        the size heuristic flips per left batch) must not pin 256 MB on the
        process for its lifetime, while steady-state gemm callers amortize
        one rebuild. The cache is never re-pickled into the object store;
        worst-case resident overhead is 256 MB × live Postings chunks per
        worker process (see the ``right_chunk_rows`` memory note in
        config.py).
        """
        d = getattr(self, "_dense_t", None)
        if d is not None:
            return d
        d = np.zeros((self.n_cols, self.n_rows), dtype=np.float64)
        cols = np.repeat(
            np.arange(self.n_cols, dtype=np.int64), np.diff(self.col_ptr)
        )
        d[cols, self.row_idx.astype(np.int64)] = self.weight
        calls = getattr(self, "_dense_calls", 0) + 1
        self._dense_calls = calls
        if calls >= 2:
            self._dense_t = d
        return d


def _segment_ids(lengths: np.ndarray) -> np.ndarray:
    """``np.repeat(arange(len(lengths)), lengths)`` without np.repeat:
    varying-count repeat runs a per-segment C loop (~7M elems/s measured on
    this host's virtualized CPU) while scatter+cumsum streams at memory
    bandwidth (~3-10×). ``lengths`` must be all-positive."""
    total = int(lengths.sum())
    marks = np.zeros(total, dtype=np.int64)
    if len(lengths) > 1:
        marks[np.cumsum(lengths[:-1])] = 1
    return np.cumsum(marks)


def _gather_positions(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Flatten ranges [starts[i], starts[i]+lengths[i]) into one index array.

    Scatter-delta + one cumsum instead of np.repeat (see
    :func:`_segment_ids` for why): element 0 of each segment carries the
    jump from the previous segment's last position, every other element
    advances by 1."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    nz = lengths > 0
    if not nz.all():
        starts, lengths = starts[nz], lengths[nz]
    s = starts.astype(np.int64, copy=False)
    ln = lengths.astype(np.int64, copy=False)
    idx = np.ones(total, dtype=np.int64)
    idx[0] = s[0]
    if len(s) > 1:
        idx[np.cumsum(ln[:-1])] = s[1:] - (s[:-1] + ln[:-1] - 1)
    return np.cumsum(idx)


def topn_multiply(
    left: CSRBatch,
    right: Postings,
    threshold: float,
    topn: int,
    dense_budget: int = 4_000_000,
    force_dense: "bool | None" = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Thresholded top-N product ``left @ rightᵀ`` (cosines, since rows are
    L2-normalized). Returns (left_row, right_row, similarity) triplets with
    right_row already offset to global ids.

    Equivalent to one block-pair call of ``sp_matmul_topn``
    (``string_grouper.py:737``). The dense accumulator covers
    ``sub_rows × right.n_rows`` float64 at a time, bounded by
    ``dense_budget`` cells.
    """
    n_right = right.n_rows
    if n_right == 0 or left.n_rows == 0:
        e = np.empty(0)
        return e.astype(np.int64), e.astype(np.int64), e
    # Tiny-vocabulary fast path: short strings over a small alphabet (e.g.
    # ~100 distinct trigrams) make every posting list ~n_right/n_cols long,
    # so the COO scatter-add below touches nnz_left × avg_posting elements —
    # orders of magnitude more memory traffic than a dense gemm of the same
    # product. When the densified right side is small (≤256 MB) and the gemm
    # flop count undercuts the scatter volume, multiply dense sub-blocks via
    # BLAS instead. Semantics are identical: all tf-idf weights are strictly
    # positive, so dot > 0 iff the rows share a term — the >= tiny threshold
    # below excludes structural zeros either way. Rounding caveat (same
    # family as the n_blocks divergence documented in compat.py): the gemm
    # and the COO scatter-add sum the same products in DIFFERENT orders, so
    # a pair whose true cosine sits within ~1 ulp of ``threshold`` can be
    # kept by one branch and dropped by the other — i.e. the edge set at an
    # exact-threshold boundary depends on the size heuristic. Verified
    # equal to 1e-12 on non-adversarial inputs (test_topn_multiply_dense_
    # equals_coo); callers needing branch-independent boundaries should
    # quantize similarities before thresholding.
    n_cols = right.n_cols
    use_dense = False
    if n_right * n_cols <= 32_000_000 and len(left.indices):
        terms_all = left.indices.astype(np.int64)
        pairs_total = int(
            (right.col_ptr[terms_all + 1] - right.col_ptr[terms_all]).sum()
        )
        use_dense = left.n_rows * n_cols * n_right < pairs_total * 16
    if force_dense is not None:
        use_dense = force_dense
    sub = max(1, min(left.n_rows, dense_budget // max(1, n_right)))
    right_dense = None
    out_l: List[np.ndarray] = []
    out_r: List[np.ndarray] = []
    out_s: List[np.ndarray] = []
    for start in range(0, left.n_rows, sub):
        stop = min(start + sub, left.n_rows)
        lo, hi = left.indptr[start], left.indptr[stop]
        terms = left.indices[lo:hi].astype(np.int64)
        vals = left.data[lo:hi]
        rows_local = np.repeat(
            np.arange(stop - start, dtype=np.int64),
            np.diff(left.indptr[start : stop + 1]).astype(np.int64),
        )
        if use_dense:
            if right_dense is None:
                right_dense = right.dense()  # built once per call, not per sub-block
            ld = np.zeros((stop - start, n_cols), dtype=np.float64)
            ld[rows_local, terms] = vals
            scores = ld @ right_dense
        else:
            plen = (right.col_ptr[terms + 1] - right.col_ptr[terms]).astype(np.int64)
            pos = _gather_positions(right.col_ptr[terms], plen)
            if len(pos) == 0:
                continue
            pair_rows = np.repeat(rows_local, plen)
            pair_vals = np.repeat(vals, plen)
            cols = right.row_idx[pos].astype(np.int64)
            scores = np.bincount(
                pair_rows * n_right + cols,
                weights=pair_vals * right.weight[pos],
                minlength=(stop - start) * n_right,
            ).reshape(stop - start, n_right)
        # sparse semantics: structural zeros never appear; threshold keeps >=
        mask = scores >= max(threshold, np.finfo(np.float64).tiny)
        r_loc, c_loc = np.nonzero(mask)
        s = scores[r_loc, c_loc]
        if topn is not None and len(r_loc):
            # per-row top-N, ties broken by ascending column (stable)
            order = np.lexsort((c_loc, -s, r_loc))
            r_loc, c_loc, s = r_loc[order], c_loc[order], s[order]
            rank = np.arange(len(r_loc)) - np.searchsorted(r_loc, r_loc, side="left")
            keep = rank < topn
            r_loc, c_loc, s = r_loc[keep], c_loc[keep], s[keep]
        out_l.append(r_loc + start)
        out_r.append(c_loc + right.row_offset)
        out_s.append(s)
    if not out_l:
        e = np.empty(0)
        return e.astype(np.int64), e.astype(np.int64), e
    return (
        np.concatenate(out_l),
        np.concatenate(out_r),
        np.concatenate(out_s),
    )


def merge_row_topn(
    l_rows: np.ndarray, r_rows: np.ndarray, sims: np.ndarray, topn: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Merge per-chunk top-N candidate lists into a global per-row top-N
    (the ``zip_sp_matmul_topn`` step, ``string_grouper.py:746``)."""
    if len(l_rows) == 0:
        return l_rows, r_rows, sims
    order = np.lexsort((r_rows, -sims, l_rows))
    l_s, r_s, s_s = l_rows[order], r_rows[order], sims[order]
    rank = np.arange(len(l_s)) - np.searchsorted(l_s, l_s, side="left")
    keep = rank < topn
    return l_s[keep], r_s[keep], s_s[keep]


def pair_dots(
    l_csr: CSRBatch,
    r_csr: CSRBatch,
    l_of_pair: np.ndarray,
    r_of_pair: np.ndarray,
) -> np.ndarray:
    """Dot products of explicit (left row, right row) pairs, vectorized
    across the entire pair set — the verify kernel for LSH candidates.

    Each pair's terms are expanded under the key ``pair * stride + term``.
    Because pair ids are emitted in ascending order and CSR rows keep their
    term ids sorted, BOTH key arrays come out already sorted — the sparse
    intersection is one ``searchsorted`` plus a scatter-add, with no sort
    and no Python loop over pairs.
    """
    n_pairs = len(l_of_pair)
    out = np.zeros(n_pairs, dtype=np.float64)
    if n_pairs == 0:
        return out
    stride = np.int64(max(l_csr.n_cols, r_csr.n_cols))
    pair_ids = np.arange(n_pairs, dtype=np.int64)

    def expand(csr: CSRBatch, rows: np.ndarray):
        lens = np.diff(csr.indptr)[rows].astype(np.int64)
        nz = lens > 0
        lens_nz = lens[nz]
        pos = _gather_positions(csr.indptr[:-1][rows][nz], lens_nz)
        if not len(pos):
            e = np.empty(0, dtype=np.int64)
            return e, np.empty(0, dtype=np.float64), e
        ids_exp = pair_ids[nz][_segment_ids(lens_nz)]
        # int32 indices upcast in the add — no explicit astype pass
        keys = ids_exp * stride + csr.indices[pos]
        return keys, csr.data[pos], ids_exp

    kl, vl, il = expand(l_csr, l_of_pair)
    kr, vr, _ = expand(r_csr, r_of_pair)
    if len(kl) == 0 or len(kr) == 0:
        return out
    # per-element binary search is NOT the bottleneck here: probe keys kl
    # ascend, so successive searches walk the same cache lines (measured
    # 248 ms vs 254 ms for a timsort-merge alternative at 5.2M keys — the
    # stage is bound by expand()'s scattered gathers, not the search)
    pos = np.searchsorted(kr, kl)
    ok = pos < len(kr)
    hit = np.zeros(len(kl), dtype=bool)
    hit[ok] = kr[pos[ok]] == kl[ok]
    # bincount, not np.add.at: the buffered ufunc runs ~10× slower than the
    # C histogram on multi-million-hit verify batches (this is the hottest
    # kernel of both verify regimes); il carries each element's pair id so
    # no division by stride is needed here
    out += np.bincount(il[hit], weights=vl[hit] * vr[pos[hit]], minlength=n_pairs)
    return out


def pairwise_dot(a: CSRBatch, b: CSRBatch) -> np.ndarray:
    """Row-aligned sparse dot (operator M3, ``string_grouper.py:433-440``):
    the i-th row of ``a`` against the i-th row of ``b``, which is exactly
    :func:`pair_dots` over the identity pairing — one vectorized sparse
    intersection for the whole batch, no per-row loop."""
    if a.n_rows != b.n_rows:
        raise ValueError("pairwise_dot requires equal row counts")
    idx = np.arange(a.n_rows, dtype=np.int64)
    return pair_dots(a, b, idx, idx)
