"""Similarity search over an embedding column (``list<float>``).

* :func:`knn_brute_force` — baseline: the (small) query matrix is broadcast
  via ``ray.put``; every batch computes a numpy matmul against it and emits
  per-query candidate top-k; a final groupby merges per-query global top-k.
  Exact; oracle-SQL-checkable with DuckDB ``list_cosine_similarity``.
* :func:`knn_lsh` — scale path: random-hyperplane (SimHash) bucketing of
  both queries and corpus; candidates only within matching buckets
  (multi-probe via several independent tables), then exact cosine on the
  candidates. Approximate; recall measured against the brute-force baseline
  in tests.
* :func:`embedding_near_dup_pairs` — near-duplicate detection by embedding
  cosine ≥ threshold (brute-force blocked matmul; same broadcast pattern).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..functions.stagemap import stage_map_batches


def _mat_from_batch(t: pa.Table, col: str) -> np.ndarray:
    import pyarrow.compute as pc

    flat = pc.list_flatten(t[col]).to_numpy(zero_copy_only=False).astype(np.float64)
    lens = pc.list_value_length(t[col]).to_numpy(zero_copy_only=False)
    dim = int(lens[0]) if len(lens) else 0
    if dim and not (lens == dim).all():
        raise ValueError("ragged embedding column")
    return flat.reshape(len(t), dim) if dim else np.zeros((len(t), 0))


def _l2_normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteTopK:
    """Per-batch candidate top-k against the broadcast query matrix."""

    def __init__(self, q_ref, k: int, id_col: str, vec_col: str):
        qids, qmat = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.qids = qids
        self.qmat = _l2_normalize(qmat)  # (nq, dim)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        mat = _l2_normalize(_mat_from_batch(t, self.vec_col))  # (n, dim)
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = self.qmat @ mat.T  # (nq, n)
        nq, n = sims.shape
        k = min(self.k, n)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            row = sims[qi]
            if n > k:
                cand = np.argpartition(-row, k - 1)[:k]
            else:
                cand = np.arange(n)
            out_q.append(np.full(len(cand), self.qids[qi], dtype=np.int64))
            out_id.append(ids[cand])
            out_s.append(row[cand])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )


def knn_brute_force(
    ds: "ray.data.Dataset",
    queries: "ray.data.Dataset",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    config: Optional[EngineConfig] = None,
) -> "ray.data.Dataset":
    """Exact cosine top-k of every query against the corpus.

    Per-batch partial top-k (map side) then per-query global top-k merge —
    the partial+final aggregate pattern; the corpus streams, only
    (n_queries × k × n_batches) candidate rows shuffle.
    """
    config = config or EngineConfig()
    qdf = queries.select_columns([id_col, vec_col]).to_pandas()
    qids = qdf[id_col].to_numpy(dtype=np.int64)
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in qdf[vec_col]])
    q_ref = ray.put((qids, qmat))
    cand = stage_map_batches(
        ds, _BruteTopK, (q_ref, k, id_col, vec_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        return g[["query_id", "vec_id", "cosine"]]

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


class _HyperplaneBucket:
    """SimHash (random hyperplane) bucket ids per row for ``n_tables``
    independent hash tables of ``n_bits`` bits."""

    def __init__(self, planes_ref, id_col: str, vec_col: str):
        self.planes = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        mat = _l2_normalize(_mat_from_batch(t, self.vec_col))
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out_tab, out_bucket, out_id = [], [], []
        for ti, planes in enumerate(self.planes):  # planes: (n_bits, dim)
            bits = (mat @ planes.T) > 0  # (n, n_bits)
            bucket = np.zeros(len(mat), dtype=np.int64)
            for b in range(bits.shape[1]):
                bucket = (bucket << 1) | bits[:, b]
            out_tab.append(np.full(len(mat), ti, dtype=np.int16))
            out_bucket.append(bucket)
            out_id.append(ids)
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(out_tab), type=pa.int16()),
                "bucket": pa.array(np.concatenate(out_bucket)),
                "vec_id": pa.array(np.concatenate(out_id)),
            }
        )


def make_hyperplanes(dim: int, n_tables: int, n_bits: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    return [rng.normal(size=(n_bits, dim)) for _ in range(n_tables)]


def knn_lsh(
    ds: "ray.data.Dataset",
    queries: "ray.data.Dataset",
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    config: Optional[EngineConfig] = None,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Approximate top-k: hyperplane-bucketed candidates, exact re-rank.

    The query side is tiny: its buckets are collected and broadcast as a
    filter; only corpus rows landing in a query's bucket are scored. The
    scale path when the corpus is too large for a full scan per query set.
    """
    config = config or EngineConfig()
    qdf = queries.select_columns([id_col, vec_col]).to_pandas()
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in qdf[vec_col]])
    planes = make_hyperplanes(qmat.shape[1], n_tables, n_bits, seed)
    planes_ref = ray.put(planes)

    qn = _l2_normalize(qmat)
    wanted = set()
    for ti, pl in enumerate(planes):
        bits = (qn @ pl.T) > 0
        bucket = np.zeros(len(qn), dtype=np.int64)
        for b in range(bits.shape[1]):
            bucket = (bucket << 1) | bits[:, b]
        for bu in bucket.tolist():
            wanted.add((ti, bu))
    wanted_ref = ray.put(wanted)

    class _Filter:
        def __init__(self, planes_ref, wanted_ref, id_col, vec_col):
            self.bucketer = _HyperplaneBucket(planes_ref, id_col, vec_col)
            self.wanted = ray.get(wanted_ref) if isinstance(wanted_ref, ray.ObjectRef) else wanted_ref

        def __call__(self, t: pa.Table) -> pa.Table:
            bt = self.bucketer(t)
            tab = bt["table_id"].to_numpy(zero_copy_only=False)
            buck = bt["bucket"].to_numpy(zero_copy_only=False)
            ids = bt["vec_id"].to_numpy(zero_copy_only=False)
            keep_ids = {
                int(i) for ti, bu, i in zip(tab, buck, ids) if (int(ti), int(bu)) in self.wanted
            }
            import pyarrow.compute as pc

            mask = pc.is_in(t["vec_id"], value_set=pa.array(sorted(keep_ids), type=pa.int64()))
            return t.filter(mask)

    candidates = stage_map_batches(
        ds, _Filter, (planes_ref, wanted_ref, id_col, vec_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )
    return knn_brute_force(candidates, queries, k, id_col, vec_col, config)


class _NearDupPairs:
    def __init__(self, all_ref, threshold: float, id_col: str, vec_col: str):
        ids, mat = ray.get(all_ref) if isinstance(all_ref, ray.ObjectRef) else all_ref
        self.all_ids = ids
        self.all_mat = _l2_normalize(mat)
        self.threshold = threshold
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        mat = _l2_normalize(_mat_from_batch(t, self.vec_col))
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = mat @ self.all_mat.T
        li, ri = np.nonzero(sims >= self.threshold)
        a = ids[li]
        b = self.all_ids[ri]
        keep = a < b  # canonical, no diagonal
        return pa.table(
            {
                "left_id": pa.array(a[keep]),
                "right_id": pa.array(b[keep]),
                "cosine": pa.array(sims[li, ri][keep].astype(np.float64)),
            }
        )


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    config: Optional[EngineConfig] = None,
) -> "ray.data.Dataset":
    """All pairs with cosine ≥ threshold. The corpus matrix is broadcast
    once (works to ~1e6 rows × small dim); beyond that use the hyperplane
    buckets of :func:`knn_lsh` to restrict comparisons."""
    config = config or EngineConfig()
    df = ds.select_columns([id_col, vec_col]).to_pandas()
    ids = df[id_col].to_numpy(dtype=np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]])
    all_ref = ray.put((ids, mat))
    return stage_map_batches(
        ds, _NearDupPairs, (all_ref, threshold, id_col, vec_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )
