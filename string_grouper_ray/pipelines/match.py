"""Fuzzy all-pairs top-N cosine join — the core operator (J1/J2 in SURVEY.md).

Replaces the reference's single-node blocked sparse matmul
(``/root/reference/string_grouper/string_grouper.py:709-752``) with two
Ray-Data-native strategies:

* ``strategy="exact"`` — the reference's own algorithm, distributed: the
  right-hand side's tf-idf vectors are built into bounded CSR chunks
  (≈``right_chunk_rows`` rows each), each chunk ``ray.put`` into the object
  store ONCE, and the left side streams through a ``map_batches`` actor pool
  that multiplies every left batch against every right chunk and merges the
  per-chunk top-Ns (exactly the reference's ``zip_sp_matmul_topn`` +
  ``vstack`` blocking scheme, ``string_grouper.py:714-752``, but scheduled by
  Ray's streaming executor). The left side never materializes. This is the
  default for up to a few million right rows (vector chunks are the only
  materialized state; the audio payload never enters this pipeline).

* ``strategy="lsh"`` — MinHash/LSH candidate generation + exact verify
  (see ``stages/minhash.py`` / ``stages/lsh.py``): the 10^12-row path where
  no side fits in memory.

Both strategies produce the same edge-list IR:

    left_idx:int64, right_idx:int64, similarity:float64

Self-join post-processing (``force_symmetries``, reference
``string_grouper.py:419-427,954-964``): diagonal forced to exactly 1.0 and
the edge set symmetrized, expressed as union + pair-key groupby-max.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..corpus import fit_vocabulary
from ..sparse import CSRBatch, Postings, Vocabulary, merge_row_topn, topn_multiply
from ..stages.vectorize import TfidfEncoder, csr_from_arrow

EDGE_SCHEMA = pa.schema(
    [("left_idx", pa.int64()), ("right_idx", pa.int64()), ("similarity", pa.float64())]
)


def _empty_edges() -> "ray.data.Dataset":
    return ray.data.from_arrow(EDGE_SCHEMA.empty_table())


def vectorize(
    ds: "ray.data.Dataset",
    vocab_ref,
    config: EngineConfig,
    text_col: str = "text",
) -> "ray.data.Dataset":
    from ..functions.stagemap import stage_map_batches

    return stage_map_batches(
        ds,
        TfidfEncoder,
        (vocab_ref, config, text_col),
        config,
        batch_format="pyarrow",
        batch_size=config.batch_size,
    )


class RightSideChunks:
    """The broadcast right-hand side: a list of (Postings, row_ids) refs."""

    def __init__(self, refs: List["ray.ObjectRef"], n_rows: int, vocab_size: int):
        self.refs = refs
        self.n_rows = n_rows
        self.vocab_size = vocab_size


def build_right_chunks(
    vectorized: "ray.data.Dataset", config: EngineConfig, vocab_size: int
) -> RightSideChunks:
    """Collect the vectorized right side into object-store CSR chunks.

    Each chunk is ``ray.put`` once and read by every matcher actor —
    broadcast, not re-shipped per batch. Chunk size mirrors the reference's
    right-block sweet spot (≈80k rows, ``docs/performance.md:71-79``).
    """
    refs: List[ray.ObjectRef] = []
    total = 0
    buf_ids: List[np.ndarray] = []
    buf_ws: List[np.ndarray] = []
    buf_rows: List[np.ndarray] = []
    buffered = 0

    def flush():
        nonlocal buf_ids, buf_ws, buf_rows, buffered
        if not buffered:
            return
        csr = CSRBatch.from_lists(
            [a for chunk in buf_ids for a in chunk],
            [a for chunk in buf_ws for a in chunk],
            vocab_size,
        )
        row_ids = np.concatenate(buf_rows)
        refs.append(ray.put((Postings.from_csr(csr), row_ids)))
        buf_ids, buf_ws, buf_rows, buffered = [], [], [], 0

    for batch in vectorized.select_columns(
        ["row_idx", "term_ids", "term_weights"]
    ).iter_batches(batch_size=config.batch_size, batch_format="pyarrow"):
        csr = csr_from_arrow(batch, vocab_size)
        ids, ws = csr.to_lists()
        buf_ids.append(ids)
        buf_ws.append(ws)
        buf_rows.append(batch["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64))
        buffered += csr.n_rows
        total += csr.n_rows
        if buffered >= config.right_chunk_rows:
            flush()
    flush()
    return RightSideChunks(refs, total, vocab_size)


class ExactTopKMatcher:
    """map_batches actor: left batch × all right chunks → top-N edges.

    State (the right chunks) is fetched once per actor in ``__init__``;
    ``__call__`` is pure vectorized numpy per batch.
    """

    def __init__(self, chunk_refs: List["ray.ObjectRef"], vocab_size: int, config: EngineConfig):
        # refs resolved lazily on the worker (zero-copy plasma reads); an
        # eager ray.get on a driver-constructed instance would pickle every
        # chunk's arrays into the operator spec (see _VerifyCosineBroadcast)
        self._refs = chunk_refs
        self._chunks: Optional[List[Tuple[Postings, np.ndarray]]] = None
        self.vocab_size = vocab_size
        self.config = config

    @property
    def chunks(self) -> List[Tuple[Postings, np.ndarray]]:
        if self._chunks is None:
            self._chunks = [
                ray.get(r) if isinstance(r, ray.ObjectRef) else r for r in self._refs
            ]
        return self._chunks

    def __call__(self, batch: pa.Table) -> pa.Table:
        csr = csr_from_arrow(batch, self.vocab_size)
        left_rows = batch["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        topn = self.config.max_n_matches
        parts_l: List[np.ndarray] = []
        parts_r: List[np.ndarray] = []
        parts_s: List[np.ndarray] = []
        for postings, row_ids in self.chunks:
            l, r, s = topn_multiply(
                csr, postings, threshold=self.config.min_similarity, topn=topn
            )
            parts_l.append(l)
            parts_r.append(row_ids[r])
            parts_s.append(s)
        if parts_l:
            l = np.concatenate(parts_l)
            r = np.concatenate(parts_r)
            s = np.concatenate(parts_s)
            if topn is not None and len(self.chunks) > 1:
                l, r, s = merge_row_topn(l, r, s, topn)
        else:
            l = r = np.empty(0, dtype=np.int64)
            s = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                "left_idx": pa.array(left_rows[l], type=pa.int64()),
                "right_idx": pa.array(r, type=pa.int64()),
                "similarity": pa.array(s.astype(np.float64), type=pa.float64()),
            }
        )


def symmetrize_edges(
    edges: "ray.data.Dataset", nodes: "ray.data.Dataset", config: EngineConfig,
    skip_dedup: bool = False,
) -> "ray.data.Dataset":
    """force_symmetries for self-joins (reference ``string_grouper.py:419-427``):

    1. every diagonal entry forced to exactly 1.0 (``_fix_diagonal``)
    2. every off-diagonal edge mirrored (``_symmetrize_matrix``)

    ``nodes`` must have a ``row_idx`` column covering every left row.
    Expressed as union + groupby(pair).max — one shuffle keyed on the pair.

    ``skip_dedup=True`` returns the raw union (mirror duplicates kept) for
    consumers that max-merge (left, right) duplicates themselves —
    ``group_assignments(dedup_edges=True)`` does, on both its driver and
    distributed routes — saving the pair-key exchange (parallelism-
    independent ~1 s at 1M rows). Only the dedup pipelines opt in via
    ``EngineConfig.defer_edge_dedup``; the match_strings edge-list API keeps
    the deduped contract.
    """

    def drop_diag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t["left_idx"], t["right_idx"]))

    def swap(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "left_idx": t["right_idx"],
                "right_idx": t["left_idx"],
                "similarity": t["similarity"],
            }
        )

    def diag(t: pa.Table) -> pa.Table:
        idx = t["row_idx"]
        ones = pa.array(np.ones(len(t), dtype=np.float64))
        return pa.table({"left_idx": idx, "right_idx": idx, "similarity": ones})

    # materialize before the fan-out: both `off` and its mirror descend from
    # the full match DAG, which would otherwise execute twice
    off = edges.map_batches(drop_diag, batch_format="pyarrow").materialize()
    mirrored = off.map_batches(swap, batch_format="pyarrow")
    diagonal = nodes.select_columns(["row_idx"]).map_batches(diag, batch_format="pyarrow")
    from ..functions.grouped import dedup_pairs

    unioned = off.union(mirrored, diagonal)
    if skip_dedup:
        return unioned
    return dedup_pairs(unioned, ["left_idx", "right_idx"], agg_col="similarity")


class _VocabSupplier:
    """Lazy, thread-safe vocabulary fit: ``supplier()`` fits on first call
    (under a lock) and returns the broadcast ``ObjectRef``; later calls are
    instant. LSH stages call it from the overlap threads, so the fit's
    exchange latency hides under the banding chain; ``.vocab`` exposes the
    fitted object for ``match_edges``'s return value."""

    def __init__(self, datasets, text_col: str, config, vocab=None):
        import threading

        self._lock = threading.Lock()
        self._datasets = datasets
        self._text_col = text_col
        self._config = config
        self.vocab = vocab
        self._ref = ray.put(vocab) if vocab is not None else None

    def __call__(self):
        with self._lock:
            if self._ref is None:
                self.vocab = fit_vocabulary(
                    self._datasets, self._text_col, self._config
                )
                self._ref = ray.put(self.vocab)
            return self._ref


def match_edges(
    left: "ray.data.Dataset",
    right: Optional["ray.data.Dataset"],
    config: Optional[EngineConfig] = None,
    vocab: Optional[Vocabulary] = None,
    text_col: str = "text",
) -> Tuple["ray.data.Dataset", Vocabulary]:
    """Compute the match edge list between two datasets (or a self-join).

    Inputs must carry ``row_idx:int64`` (stable row identity) and
    ``text_col``. Returns (edges, fitted vocabulary).
    """
    config = config or EngineConfig()
    self_join = right is None
    from ..stages.lsh import StageTimer
    _tmark = StageTimer("match")
    _tmark("match_edges_start")

    if config.strategy == "lsh":
        from ..stages.lsh import lsh_match_edges

        # The vocabulary feeds only the TF-IDF verify stages, not banding —
        # hand LSH a lazy supplier so the fit (one aggregate exchange +
        # driver collect, parallelism-independent latency) overlaps the
        # exact-dup collapse / banding / census chain instead of serializing
        # in front of it. The supplier closes over the ORIGINAL sides, so
        # document frequencies still count every row (incl. exact dups),
        # exactly as the eager fit did.
        supplier = _VocabSupplier(
            [left] if self_join else [left, right], text_col, config, vocab
        )
        _tmark("fit_vocabulary")  # deferred: overlapped inside the LSH chain
        edges = lsh_match_edges(left, right, supplier, config, text_col, tmark=_tmark)
        # idempotent resolve: guarantees the fit completed (and establishes
        # the happens-before for .vocab) even on LSH routes that returned
        # without consuming the vocabulary themselves
        supplier()
        vocab = supplier.vocab
    else:
        if vocab is None:
            vocab = fit_vocabulary(
                [left] if self_join else [left, right], text_col, config
            )
        vocab_ref = ray.put(vocab)
        _tmark("fit_vocabulary")
        if self_join:
            # encode once: the same vectorized dataset feeds both the
            # broadcast right chunks and the streaming left side
            vec = vectorize(left, vocab_ref, config, text_col).materialize()
            right_vec = left_vec = vec
        else:
            right_vec = vectorize(right, vocab_ref, config, text_col)
            left_vec = vectorize(left, vocab_ref, config, text_col)
        chunks = build_right_chunks(right_vec, config, vocab.size)
        from ..functions.stagemap import stage_map_batches

        matcher_batch = config.batch_size
        if self_join:
            # The matcher's task count is the left side's block count, and the
            # materialized self-join encode collapses to one block per
            # ~batch_size bundle (5 blocks at 20k rows) — starving the CPU
            # pool for exactly the inputs whose quadratic multiply needs it
            # most (r2 bench regression: 38 s vs 14 s on sf0.1 part). Re-split
            # to ~2 matcher tasks per CPU slot; batch_size must shrink with it
            # or map_batches re-bundles the small blocks right back together.
            want = max(1, config.resolve_concurrency() * 2)
            matcher_batch = min(
                config.batch_size, max(256, -(-max(chunks.n_rows, 1) // want))
            )
            n_blocks_want = -(-max(chunks.n_rows, 1) // matcher_batch)
            if left_vec.num_blocks() < n_blocks_want:
                left_vec = left_vec.repartition(n_blocks_want)
        edges = stage_map_batches(
            left_vec.select_columns(["row_idx", "term_ids", "term_weights"]),
            ExactTopKMatcher,
            (chunks.refs, vocab.size, config),
            config,
            batch_format="pyarrow",
            batch_size=matcher_batch,
        )

    if self_join and config.force_symmetries:
        if config.strategy != "lsh" and config.max_n_matches is None:
            # the uncapped exact self-join matrix is already symmetric:
            # sim(i,j) and sim(j,i) are term-ordered dot products of the same
            # two vectors (bitwise equal), so both directions pass or fail
            # the threshold together. Only the diagonal needs forcing to
            # exactly 1.0 (_fix_diagonal) — the mirror union and the pair-key
            # dedup shuffle of symmetrize_edges are redundant here.
            edges = force_diagonal(edges, left)
        else:
            import os as _os

            if _os.environ.get("SGR_PROFILE"):
                edges = edges.materialize()
                _tmark("pre_symmetrize(topk)")
            edges = symmetrize_edges(
                edges, left, config, skip_dedup=config.defer_edge_dedup
            )
            if _os.environ.get("SGR_PROFILE"):
                edges = edges.materialize()
                _tmark("symmetrize")
    return edges, vocab


def force_diagonal(
    edges: "ray.data.Dataset", nodes: "ray.data.Dataset"
) -> "ray.data.Dataset":
    """Replace all diagonal entries with exact (i, i, 1.0) rows for every
    node — streaming, no shuffle (reference ``_fix_diagonal``)."""

    def drop_diag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t["left_idx"], t["right_idx"]))

    def diag(t: pa.Table) -> pa.Table:
        idx = t["row_idx"]
        ones = pa.array(np.ones(len(t), dtype=np.float64))
        return pa.table({"left_idx": idx, "right_idx": idx, "similarity": ones})

    off = edges.map_batches(drop_diag, batch_format="pyarrow")
    diagonal = nodes.select_columns(["row_idx"]).map_batches(diag, batch_format="pyarrow")
    return off.union(diagonal)
