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
* :func:`knn_ivf` — IVF scale path: spherical-kmeans coarse quantizer
  trained on a bounded driver-side sample, nearest-list assignment inside
  the streaming scan, exact cosine only for rows in a query's ``n_probe``
  closest lists (``n_probe == n_list`` degenerates to exact).
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
    max_query_rows: int = 1_000_000,
) -> "ray.data.Dataset":
    """Exact cosine top-k of every query against the corpus.

    Per-batch partial top-k (map side) then per-query global top-k merge —
    the partial+final aggregate pattern; the corpus streams, only
    (n_queries × k × n_batches) candidate rows shuffle.

    The QUERY side is collected on the driver and broadcast (the lookup
    workload this serves: few queries, huge corpus). ``max_query_rows``
    makes that assumption explicit — 1M × 128-dim float64 ≈ 1 GB broadcast;
    for query sets beyond it use :func:`knn_lsh`/:func:`knn_ivf` or swap the
    sides.
    """
    config = config or EngineConfig()
    # project then materialize ONCE: count() would otherwise execute the
    # query lineage a first time and to_pandas() a second time
    queries = queries.select_columns([id_col, vec_col]).materialize()
    n_q = queries.count()
    if n_q > max_query_rows:
        raise ValueError(
            f"knn_brute_force: query set has {n_q} rows, above the driver "
            f"broadcast guard of {max_query_rows} (≈8 B × dim × rows on the "
            "driver and in the object store). Use knn_lsh/knn_ivf for large "
            "query sets, raise max_query_rows on a big-memory driver, or "
            "swap corpus/queries."
        )
    qdf = queries.to_pandas()
    qids = qdf[id_col].to_numpy(dtype=np.int64)
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in qdf[vec_col]])
    q_ref = ray.put((qids, qmat))
    cand = stage_map_batches(
        ds, _BruteTopK, (q_ref, k, id_col, vec_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )

    def final_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        # arrow out (see functions/grouped.py run())
        return pa.Table.from_pandas(
            g[["query_id", "vec_id", "cosine"]], preserve_index=False
        )

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
    wanted_parts = []
    for ti, pl in enumerate(planes):
        bits = (qn @ pl.T) > 0
        bucket = np.zeros(len(qn), dtype=np.int64)
        for b in range(bits.shape[1]):
            bucket = (bucket << 1) | bits[:, b]
        wanted_parts.append((np.int64(ti) << np.int64(48)) | bucket)
    # sorted packed (table_id << 48 | bucket) keys: membership is one
    # vectorized searchsorted per batch, no per-row Python set test
    wanted_ref = ray.put(np.unique(np.concatenate(wanted_parts)))

    class _Filter:
        def __init__(self, planes_ref, wanted_ref, id_col, vec_col):
            self.bucketer = _HyperplaneBucket(planes_ref, id_col, vec_col)
            self.wanted = ray.get(wanted_ref) if isinstance(wanted_ref, ray.ObjectRef) else wanted_ref

        def __call__(self, t: pa.Table) -> pa.Table:
            bt = self.bucketer(t)
            tab = bt["table_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            buck = bt["bucket"].to_numpy(zero_copy_only=False)
            ids = bt["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            keys = (tab << np.int64(48)) | buck
            n = len(self.wanted)
            if n == 0 or len(keys) == 0:
                return t.filter(pa.array(np.zeros(len(t), dtype=bool)))
            pos = np.searchsorted(self.wanted, keys)
            hit = (pos < n) & (self.wanted[np.minimum(pos, n - 1)] == keys)
            keep_ids = np.unique(ids[hit])
            rows = t[self.bucketer.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if not len(keep_ids):
                return t.filter(pa.array(np.zeros(len(rows), dtype=bool)))
            rpos = np.searchsorted(keep_ids, rows)
            m = len(keep_ids)
            mask = (rpos < m) & (keep_ids[np.minimum(rpos, m - 1)] == rows)
            return t.filter(pa.array(mask))

    candidates = stage_map_batches(
        ds, _Filter, (planes_ref, wanted_ref, id_col, vec_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )
    return knn_brute_force(candidates, queries, k, id_col, vec_col, config)


def _train_sample(
    ds: "ray.data.Dataset", id_col: str, vec_col: str, train_rows: int, seed: int
) -> np.ndarray:
    """Bounded UNIFORM training sample for the coarse quantizer.

    A seeded splitmix64 hash of the row id decides membership — deterministic
    and unbiased on sorted/clustered corpora, unlike ``ds.limit(train_rows)``
    (the first N rows), whose centroids would silently skew recall when the
    table is ordered by anything embedding-correlated. The filter runs as a
    streaming map; only the ~train_rows survivors reach the driver.
    """
    n_total = ds.count()
    if n_total == 0:
        raise ValueError("knn_ivf: empty corpus")
    if n_total > train_rows:
        mod = np.uint64(1 << 20)
        cut = np.uint64(max(1, int(round((train_rows / n_total) * float(mod)))))
        gold = np.uint64(0x9E3779B97F4A7C15)
        useed = np.uint64(seed)

        def samp(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            with np.errstate(over="ignore"):
                x = ids.astype(np.uint64) * gold + useed
                x ^= x >> np.uint64(30)
                x *= np.uint64(0xBF58476D1CE4E5B9)
                x ^= x >> np.uint64(27)
                x *= np.uint64(0x94D049BB133111EB)
                x ^= x >> np.uint64(31)
            return t.filter(pa.array((x % mod) < cut))

        ds = ds.select_columns([id_col, vec_col]).map_batches(
            samp, batch_format="pyarrow"
        )
    sample = ds.select_columns([vec_col]).to_pandas()
    if len(sample) == 0:
        raise ValueError("knn_ivf: training sample came up empty")
    return np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])


def _train_centroids(
    mat: np.ndarray, n_list: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Spherical k-means (cosine Lloyd) on a driver-side sample — the same
    bounded-sample training FAISS-style IVF indexes use. Returns
    L2-normalized centroids (n_list × dim)."""
    rng = np.random.RandomState(seed)
    mat = _l2_normalize(mat)
    n = len(mat)
    n_list = min(n_list, n)
    cent = mat[rng.choice(n, size=n_list, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_list):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
            else:  # empty list: reseed from a random sample row
                cent[c] = mat[rng.randint(n)]
        cent = _l2_normalize(cent)
    return cent


class _IvfProbeScore:
    """Assign each corpus row to its nearest centroid list, keep only rows
    in a list probed by ≥1 query, and emit exact-cosine candidate top-k per
    probing query. Centroids + probe map are broadcast once per actor."""

    def __init__(self, state_ref, k: int, id_col: str, vec_col: str):
        cent, qids, qmat, probes = (
            ray.get(state_ref) if isinstance(state_ref, ray.ObjectRef) else state_ref
        )
        self.cent = cent  # (n_list, dim), normalized
        self.qids = qids
        self.qmat = qmat  # normalized (nq, dim)
        self.probes = probes  # (nq, n_probe) list ids per query
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, t: pa.Table) -> pa.Table:
        mat = _l2_normalize(_mat_from_batch(t, self.vec_col))
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = np.argmax(mat @ self.cent.T, axis=1) if len(mat) else np.empty(0, np.int64)
        out_q, out_id, out_s = [], [], []
        for qi in range(len(self.qids)):
            sel = np.isin(lists, self.probes[qi])
            if not sel.any():
                continue
            row = self.qmat[qi] @ mat[sel].T
            cand_ids = ids[sel]
            k = min(self.k, len(row))
            top = np.argpartition(-row, k - 1)[:k] if len(row) > k else np.arange(len(row))
            out_q.append(np.full(len(top), self.qids[qi], dtype=np.int64))
            out_id.append(cand_ids[top])
            out_s.append(row[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id)),
                "cosine": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: "ray.data.Dataset",
    k: int = 10,
    n_list: int = 64,
    n_probe: int = 8,
    train_rows: int = 20_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    config: Optional[EngineConfig] = None,
    seed: int = 42,
) -> "ray.data.Dataset":
    """IVF approximate top-k: spherical-kmeans coarse quantizer (trained on
    a bounded driver-side sample), nearest-list assignment inside the
    streaming corpus scan, exact cosine only for rows in a query's
    ``n_probe`` closest lists, partial+final top-k merge.

    The scale path when the hyperplane tables of :func:`knn_lsh` probe too
    coarsely: recall is tunable via ``n_probe`` (``n_probe == n_list``
    degenerates to exact brute force). Only centroids (n_list × dim) and
    the query matrix are broadcast; the corpus streams once.
    """
    config = config or EngineConfig()
    smat = _train_sample(ds, id_col, vec_col, train_rows, seed)
    cent = _train_centroids(smat, n_list, seed=seed)

    qdf = queries.select_columns([id_col, vec_col]).to_pandas()
    if len(qdf) == 0:
        raise ValueError("knn_ivf: empty query set")
    qids = qdf[id_col].to_numpy(dtype=np.int64)
    qmat = _l2_normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in qdf[vec_col]])
    )
    n_probe = min(n_probe, len(cent))
    qc = qmat @ cent.T  # (nq, n_list)
    probes = np.argpartition(-qc, n_probe - 1, axis=1)[:, :n_probe] if len(cent) > n_probe else np.tile(np.arange(len(cent)), (len(qmat), 1))
    state_ref = ray.put((cent, qids, qmat, probes))

    cand = stage_map_batches(
        ds, _IvfProbeScore, (state_ref, k, id_col, vec_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )

    def final_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        # arrow out (see functions/grouped.py run())
        return pa.Table.from_pandas(
            g[["query_id", "vec_id", "cosine"]], preserve_index=False
        )

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def _collect_embedding_chunks(
    ds: "ray.data.Dataset", id_col: str, vec_col: str, chunk_rows: int
):
    """Stream the corpus into bounded (ids, L2-normalized matrix) chunks,
    each ``ray.put`` once. The driver holds one chunk at a time — never the
    whole corpus."""
    refs = []
    buf_ids, buf_mats, buffered = [], [], 0

    def flush():
        nonlocal buf_ids, buf_mats, buffered
        if not buffered:
            return
        ids = np.concatenate(buf_ids)
        mat = _l2_normalize(np.vstack(buf_mats))
        refs.append(ray.put((ids, mat)))
        buf_ids, buf_mats, buffered = [], [], 0

    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        buf_ids.append(batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        buf_mats.append(_mat_from_batch(batch, vec_col))
        buffered += len(batch)
        if buffered >= chunk_rows:
            flush()
    flush()
    return refs


class _ChunkPairNearDup:
    """One task per corpus chunk pair (i ≤ j): dense slabbed product of two
    object-store chunks, emitting pairs ≥ threshold. Memory per task is two
    chunks plus one bounded slab of the similarity matrix."""

    def __init__(self, refs, threshold: float, dense_budget: int = 8_000_000):
        self.refs = refs
        self.threshold = threshold
        self.dense_budget = dense_budget

    def __call__(self, t: pa.Table) -> pa.Table:
        out_l, out_r, out_s = [], [], []
        for ci, cj in zip(t["i"].to_pylist(), t["j"].to_pylist()):
            ids_i, mat_i = ray.get(self.refs[ci])
            ids_j, mat_j = ray.get(self.refs[cj])
            slab = max(1, self.dense_budget // max(1, len(ids_j)))
            for s0 in range(0, len(ids_i), slab):
                s1 = min(s0 + slab, len(ids_i))
                sims = mat_i[s0:s1] @ mat_j.T
                li, ri = np.nonzero(sims >= self.threshold)
                if not len(li):
                    continue
                a, b = ids_i[s0:s1][li], ids_j[ri]
                s = sims[li, ri]
                if ci == cj:
                    # same chunk: both orientations appear — keep a < b only
                    # (also drops the diagonal)
                    m = a < b
                    lo, hi, s = a[m], b[m], s[m]
                else:
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                out_l.append(lo)
                out_r.append(hi)
                out_s.append(s)
        if not out_l:
            return pa.table(
                {
                    "left_id": pa.array([], type=pa.int64()),
                    "right_id": pa.array([], type=pa.int64()),
                    "cosine": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "left_id": pa.array(np.concatenate(out_l)),
                "right_id": pa.array(np.concatenate(out_r)),
                "cosine": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )


def embedding_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    config: Optional[EngineConfig] = None,
    method: str = "exact",
    chunk_rows: int = 16384,
    n_tables: int = 8,
    n_bits: int = 12,
    seed: int = 42,
) -> "ray.data.Dataset":
    """All pairs with embedding cosine ≥ threshold.

    * ``method="exact"`` — distributed blocked matmul: the corpus streams
      into bounded object-store chunks; one Ray task per chunk pair computes
      a slabbed dense product. No driver-side corpus materialization, memory
      bounded by two chunks per task. Compute is inherently O(n²/2) — that's
      what an exact all-pairs join at arbitrary threshold means.
    * ``method="lsh"`` — the 1e9-row path for genuine near-dup thresholds
      (≥ ~0.8): hyperplane (SimHash) bucketing over ``n_tables``
      independent tables, per-bucket candidate pairs (salted hot buckets,
      memberset dedup — the same machinery as the text LSH path), then an
      exact-cosine verify join. Approximate recall, measured in tests.
    """
    config = config or EngineConfig()
    if method == "exact":
        refs = _collect_embedding_chunks(ds, id_col, vec_col, chunk_rows)
        n = len(refs)
        pairs = [{"i": i, "j": j} for i in range(n) for j in range(i, n)]
        if not pairs:
            return ray.data.from_arrow(
                pa.schema(
                    [("left_id", pa.int64()), ("right_id", pa.int64()),
                     ("cosine", pa.float64())]
                ).empty_table()
            )
        pair_ds = ray.data.from_items(pairs)
        return stage_map_batches(
            pair_ds, _ChunkPairNearDup, (refs, threshold), config,
            batch_format="pyarrow", batch_size=1,
        )
    if method != "lsh":
        raise ValueError(f"unknown method {method!r}")
    return _near_dup_pairs_lsh(
        ds, threshold, id_col, vec_col, config, n_tables, n_bits, seed
    )


def _near_dup_pairs_lsh(
    ds: "ray.data.Dataset",
    threshold: float,
    id_col: str,
    vec_col: str,
    config: EngineConfig,
    n_tables: int,
    n_bits: int,
    seed: int,
) -> "ray.data.Dataset":
    """Hyperplane-bucketed candidate pairs + exact cosine verify join."""
    from ..functions.grouped import bucketed_group_map, dedup_pairs
    from ..functions.joins import shuffle_join
    from ..stages.lsh import _SaltHotBuckets, emit_pairs_bucket

    probe = ds.take(1)
    dim = len(probe[0][vec_col]) if probe else 0
    planes = make_hyperplanes(dim, n_tables, n_bits, seed)
    planes_ref = ray.put(planes)

    def to_band_rows(t: pa.Table) -> pa.Table:
        bt = _HyperplaneBucket(planes_ref, id_col, vec_col)(t)
        # pack (table_id, bucket) into one int64 band key (bucket < 2^n_bits)
        tab = bt["table_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        buck = bt["bucket"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "band_key": pa.array((tab << np.int64(48)) | buck),
                "row_idx": bt["vec_id"],
                "side": pa.array(np.zeros(len(tab), dtype=np.int8)),
            }
        )

    banded = ds.map_batches(to_band_rows, batch_format="pyarrow").materialize()
    from ..functions.grouped import groupby_agg

    counts = groupby_agg(banded, "band_key", None, "count", num_buckets=64)
    import pyarrow.compute as pc

    hot_rows = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], config.max_bucket_size)),
        batch_format="pyarrow",
    ).take_all()
    hot = {
        int(r["band_key"]): int(-(-r["count()"] // config.max_bucket_size))
        for r in hot_rows
    }
    salted = stage_map_batches(
        banded, _SaltHotBuckets, (ray.put(hot), config.max_bucket_size), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )
    pairs = bucketed_group_map(
        salted, ["band_key", "salt"], lambda df: emit_pairs_bucket(df, False)
    )
    pairs = dedup_pairs(pairs, ["left_idx", "right_idx"])

    packed = ds.select_columns([id_col, vec_col]).map_batches(
        lambda t: pa.table(
            {
                "v_idx": t[id_col].cast(pa.int64()),
                "vec": pa.array(
                    [m.tobytes() for m in _l2_normalize(_mat_from_batch(t, vec_col))],
                    type=pa.binary(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    rpacked = packed.map_batches(
        lambda t: t.rename_columns(["w_idx", "rvec"]), batch_format="pyarrow"
    )
    pair_schema = pa.schema([("left_idx", pa.int64()), ("right_idx", pa.int64())])
    lsch = pa.schema([("v_idx", pa.int64()), ("vec", pa.binary())])
    rsch = pa.schema([("w_idx", pa.int64()), ("rvec", pa.binary())])
    withl = shuffle_join(pairs, packed, on="left_idx", right_on="v_idx", how="inner",
                         left_schema=pair_schema, right_schema=lsch)
    withlr = shuffle_join(
        withl, rpacked, on="right_idx", right_on="w_idx", how="inner",
        left_schema=pa.schema(list(pair_schema) + [pa.field("v_idx", pa.int64()),
                                                   pa.field("vec", pa.binary())]),
        right_schema=rsch,
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lv = np.vstack([np.frombuffer(b, dtype=np.float64) for b in batch["vec"]]) \
            if len(batch) else np.zeros((0, 1))
        rv = np.vstack([np.frombuffer(b, dtype=np.float64) for b in batch["rvec"]]) \
            if len(batch) else np.zeros((0, 1))
        cos = np.einsum("ij,ij->i", lv, rv) if len(batch) else np.empty(0)
        keep = cos >= threshold
        return pa.table(  # arrow out (see functions/grouped.py run())
            {
                "left_id": pa.array(batch["left_idx"].to_numpy(dtype=np.int64)[keep]),
                "right_id": pa.array(batch["right_idx"].to_numpy(dtype=np.int64)[keep]),
                "cosine": pa.array(cos[keep].astype(np.float64)),
            }
        )

    return withlr.map_batches(verify, batch_format="pandas", batch_size=65536)
