"""Deduplication operators for training-data pipelines.

Five flavors, each a Dataset → Dataset transform:

* :func:`exact_dedup` — hash-partition on the content, keep the first
  (minimum id) row per distinct value. One groupby shuffle.
* :func:`minhash_dedup` — shingle → 128-perm MinHash → LSH bands →
  bucket groupby → candidate pairs → **true Jaccard** verify on shingle
  sets → connected components → keep min id per cluster.
* :func:`simhash_dedup` — 64-bit SimHash over shingle hashes, Hamming ≤ k
  via 4-way band partitioning (any pair within distance 3 shares one of 4
  16-bit bands exactly), verify Hamming, cluster, keep min id.
* :func:`ngram_jaccard_pairs` — EXACT n-gram Jaccard join (no hashing):
  explode distinct shingles, groupby shingle, count shared shingles per
  pair, Jaccard from the counts. SQL-expressible → a strong DuckDB oracle.
* embedding-cosine near-dup lives in pipelines/ann.py
  (:func:`~string_grouper_ray.pipelines.ann.embedding_near_dup_pairs`).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..functions.stagemap import fanout_batch, stage_map_batches
from ..state.unionfind import connected_components
from ..stages.minhash import MinHashBander, band_keys_matrix
from ..text import NGramTokenizer


_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount via a 16-bit lookup table (numpy<2 has no
    ``bitwise_count``)."""
    v = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint16).reshape(-1, 4)
    return _POP16[v].sum(axis=1, dtype=np.int64)


def exact_dedup(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """One row per distinct text, keeping the minimum id
    (= ``SELECT min(id) AS id, text GROUP BY text``)."""
    from ..functions.grouped import groupby_agg

    out = groupby_agg(ds.select_columns([id_col, text_col]), text_col, id_col, "min")
    return out.map_batches(
        lambda t: pa.table({id_col: t[f"min({id_col})"], text_col: t[text_col]}),
        batch_format="pyarrow",
    )


def _jaccard_sims(
    lvals: np.ndarray, l_len: np.ndarray, rvals: np.ndarray, r_len: np.ndarray
) -> np.ndarray:
    """Per-pair true Jaccard over per-side DISTINCT shingle arrays.

    Fully vectorized: all pairs' elements go through ONE
    ``lexsort((value, pair_id))``, and a value that appears twice under the
    same pair id is — by per-side uniqueness — exactly one intersection
    element, counted per pair with a single ``bincount``. No per-pair
    Python (the old ``intersect1d`` loop was the verify bottleneck at
    scale). Shared by the join-carried and broadcast-CSR verify stages so
    the two routes cannot diverge numerically."""
    n = len(l_len)
    pid = np.concatenate(
        [
            np.repeat(np.arange(n, dtype=np.int64), l_len),
            np.repeat(np.arange(n, dtype=np.int64), r_len),
        ]
    )
    vals = np.concatenate([lvals, rvals])
    inter = np.zeros(n, dtype=np.int64)
    if len(vals):
        order = np.lexsort((vals, pid))
        pid_s, vals_s = pid[order], vals[order]
        dup = (pid_s[1:] == pid_s[:-1]) & (vals_s[1:] == vals_s[:-1])
        if dup.any():
            inter = np.bincount(pid_s[1:][dup], minlength=n)
    union = l_len + r_len - inter
    # both-empty shingle sets (e.g. two sub-ngram-length texts) → 1.0
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def _jaccard_sims_ranked(
    lranks: np.ndarray,
    l_len: np.ndarray,
    rranks: np.ndarray,
    r_len: np.ndarray,
    n_distinct: int,
) -> np.ndarray:
    """Sort-free per-pair Jaccard when shingles arrive as DENSE RANKS
    (ints in ``[0, n_distinct)``, sorted-unique per side — the broadcast
    CSR is rank-encoded once at build time for exactly this).

    ``(pair_id, rank)`` packs into one monotone int64 key, so the per-pair
    intersection of two sorted runs is a single global ``searchsorted``
    probe — no data-moving ``lexsort``. Measured 6-8× the lexsort kernel
    (which is memory-bandwidth-bound and scales poorly across a full
    node's workers). Intersection counts are exact integers either way,
    so this and :func:`_jaccard_sims` cannot diverge — pinned by
    ``test_jaccard_ranked_kernel_equals_lexsort``."""
    n = len(l_len)
    D = max(int(n_distinct), 1)
    if n * D >= 2**62:  # key overflow guard: fall back to the sort kernel
        return _jaccard_sims(lranks, l_len, rranks, r_len)
    l_pid = np.repeat(np.arange(n, dtype=np.int64), l_len)
    r_pid = np.repeat(np.arange(n, dtype=np.int64), r_len)
    inter = np.zeros(n, dtype=np.int64)
    if len(lranks) and len(rranks):
        lk = l_pid * D + lranks.astype(np.int64)
        rk = r_pid * D + rranks.astype(np.int64)
        pos = np.searchsorted(rk, lk)
        valid = pos < len(rk)
        hit = valid & (rk[np.minimum(pos, len(rk) - 1)] == lk)
        if hit.any():
            inter = np.bincount(l_pid[hit], minlength=n)
    union = l_len + r_len - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def _gather_slices(
    vals: np.ndarray, offs: np.ndarray, idx: np.ndarray
) -> "tuple[np.ndarray, np.ndarray]":
    """Concatenate ``vals[offs[i]:offs[i+1]]`` for each ``i`` in ``idx``
    (vectorized ragged gather). Returns ``(flat, lengths)``."""
    lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return vals[:0], lens
    cum = np.cumsum(lens) - lens
    pos = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
    return vals[np.repeat(offs[idx], lens) + pos], lens


def collect_shingle_csr(sh_ds, id_col: str = "l_idx", sh_col: str = "l_sh"):
    """Driver-side collect of a shingle-column dataset into broadcastable
    RANK-ENCODED CSR state ``(row_ids_sorted, flat_ranks, offsets,
    n_distinct)``.

    Shingle hashes are replaced by their dense rank in the corpus's
    distinct-shingle set (one ``np.unique`` here — paid once per build, at
    the cutoff scale ~10 s vs the per-verify lexsorts it eliminates; the
    monotone rank map keeps each row's slice sorted-unique). int32 ranks
    halve the broadcast footprint vs raw u64 hashes. Bounded by
    ``EngineConfig.jaccard_broadcast_max_rows`` at the caller — resident
    size ≈ rows × (avg distinct shingles × 4 B + 16 B)."""
    ids_p, vals_p, lens_p = [], [], []
    from ..functions.packing import unpack_binary_column

    for bt in sh_ds.iter_batches(batch_format="pyarrow", batch_size=32768):
        v, o = unpack_binary_column(bt[sh_col], np.uint64)
        # copy: v views the Arrow buffer, which is recycled as iteration
        # advances
        vals_p.append(np.array(v, copy=True))
        lens_p.append(np.diff(o))
        ids_p.append(bt[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
    if not ids_p:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            np.zeros(1, dtype=np.int64),
            0,
        )
    ids = np.concatenate(ids_p)
    lens = np.concatenate(lens_p)
    vals = np.concatenate(vals_p) if vals_p else np.empty(0, dtype=np.uint64)
    offs_in = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs_in[1:])
    order = np.argsort(ids, kind="stable")
    flat, lens_sorted = _gather_slices(vals, offs_in, order)
    offs = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(lens_sorted, out=offs[1:])
    uniq, ranks = np.unique(flat, return_inverse=True)
    rank_dtype = np.int32 if len(uniq) < 2**31 else np.int64
    return ids[order], ranks.astype(rank_dtype), offs, len(uniq)


class _ShingleJaccardVerify:
    """True Jaccard on distinct shingle sets for candidate pairs carrying
    both shingle arrays (sorted-unique uint64, packed binary) — the
    join-route verifier; the math lives in :func:`_jaccard_sims`."""

    def __init__(self, threshold: float):
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.packing import unpack_binary_column

        lvals, loff = unpack_binary_column(batch["l_sh"], np.uint64)
        rvals, roff = unpack_binary_column(batch["r_sh"], np.uint64)
        sims = _jaccard_sims(lvals, np.diff(loff), rvals, np.diff(roff))
        keep = sims >= self.threshold
        mask = pa.array(keep)
        return pa.table(
            {
                "left_idx": batch["left_idx"].cast(pa.int64()).filter(mask),
                "right_idx": batch["right_idx"].cast(pa.int64()).filter(mask),
                "similarity": pa.array(sims[keep]),
            }
        )


class _ShingleJaccardBroadcastVerify:
    """True-Jaccard verify against broadcast rank-encoded shingle-CSR
    state — no join shuffles: row-id lookup is one ``searchsorted``, both
    sides' rank arrays gather from the shared flat buffer, and the
    similarity runs through the sort-free :func:`_jaccard_sims_ranked`
    kernel (exact-integer-equal to the join route's :func:`_jaccard_sims`).
    Mirrors ``_VerifyCosineBroadcast`` (stages/lsh.py): holds the ref,
    resolves lazily on the worker so the CSR rides plasma zero-copy
    instead of being pickled into the operator spec."""

    def __init__(self, csr_ref, threshold: float):
        self._ref = csr_ref
        self.threshold = threshold
        self._state = None

    def _csr(self):
        if self._state is None:
            self._state = (
                ray.get(self._ref) if isinstance(self._ref, ray.ObjectRef) else self._ref
            )
        return self._state

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ranks, offs, n_distinct = self._csr()
        l = batch["left_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch["right_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.searchsorted(ids, l)
        ri = np.searchsorted(ids, r)
        # pairs are emitted from bands over the same base rows the CSR was
        # built from, so every id resolves; clip defensively anyway (a miss
        # would yield a wrong-row similarity, caught by the route-equality
        # test, not a crash)
        li = np.minimum(li, max(len(ids) - 1, 0))
        ri = np.minimum(ri, max(len(ids) - 1, 0))
        lranks, l_len = _gather_slices(ranks, offs, li)
        rranks, r_len = _gather_slices(ranks, offs, ri)
        sims = _jaccard_sims_ranked(lranks, l_len, rranks, r_len, n_distinct)
        keep = sims >= self.threshold
        mask = pa.array(keep)
        return pa.table(
            {
                "left_idx": batch["left_idx"].cast(pa.int64()).filter(mask),
                "right_idx": batch["right_idx"].cast(pa.int64()).filter(mask),
                "similarity": pa.array(sims[keep]),
            }
        )


class _ShingleColumn:
    def __init__(self, config: EngineConfig, text_col: str, out_prefix: str):
        self.tokenizer = NGramTokenizer(config)
        self.text_col = text_col
        self.out_prefix = out_prefix

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.packing import pack_u64

        shingles = self.tokenizer.shingle_hashes_batch(t[self.text_col].to_pylist())
        arr = pa.array([pack_u64(np.sort(s)) for s in shingles], type=pa.binary())
        return pa.table(
            {
                f"{self.out_prefix}_idx": t["row_idx"],
                f"{self.out_prefix}_sh": arr,
            }
        )


def _cluster_and_keep(
    edges: "ray.data.Dataset", ds: "ray.data.Dataset", id_col: str, config: EngineConfig
) -> "ray.data.Dataset":
    """CC over candidate edges → (id, cluster_id, keep=min-of-cluster)."""
    labels = connected_components(edges, ds.select_columns(["row_idx"]), config)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: t["row_idx"],
                "cluster_id": t["group_id"],
                "keep": pc.equal(t["row_idx"], t["group_id"]),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow")


def minhash_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.7,
    config: Optional[EngineConfig] = None,
    prefilter_min_band_matches: Optional[int] = None,
) -> "ray.data.Dataset":
    """MinHash+LSH near-dedup with true-Jaccard verification.

    Input needs a unique integer ``id_col``; it doubles as ``row_idx``.
    Output: (id, cluster_id, keep) for every input row.

    ``prefilter_min_band_matches``: drop candidate pairs that match fewer
    than this many bands BEFORE the verify joins. The band-match count is
    free (it is the pair's multiplicity in the dedup shuffle the pipeline
    pays anyway) and it is a signature-based Jaccard estimate: at
    rows_per_band=1, E[matches] = J·bands, so a high-recall configuration
    (lsh_bands=num_perm, where any pair sharing ONE minhash becomes a
    candidate — overwhelmingly sub-threshold noise on doc corpora) keeps
    its provable recall while the verify joins only ever see plausible
    pairs. E.g. 52/128 at J≥0.7: P(drop a true pair) = P(Binom(128,.7)<52)
    ≈ 7e-14 — far below the accepted memberset-collision risk (~5e-5).
    """
    config = config or EngineConfig()
    from ..functions.joins import shuffle_join
    from ..stages.lsh import _SaltHotBuckets

    base = ds.map_batches(
        lambda t: pa.table({"row_idx": t[id_col].cast(pa.int64()), "text": t[text_col]}),
        batch_format="pyarrow",
    ).materialize()

    # Broadcast-verify fast path (mirrors the flagship's broadcast-CSR
    # cosine verify, stages/lsh.py): below the cutoff the per-row shingle
    # sets fit the object store, so candidate pairs verify in ONE map stage
    # against broadcast CSR state instead of carrying packed shingle binaries
    # through two wide shuffle_joins. Built SEQUENTIALLY before the banding
    # chain: a background-thread build ran concurrently with the banded
    # materialize and the two streaming executions split the operator
    # resource budget — measured 1.6-3x slower end-to-end than sequential
    # (same contention class as the chained-sort livelock noted in
    # BENCH/BASELINE.md). Route equality is pinned by
    # test_minhash_broadcast_verify_equals_join.
    n_base = base.count()
    use_broadcast_verify = n_base <= config.jaccard_broadcast_max_rows
    # fan-out batch for the compute-heavy per-row stages (banding is
    # ~0.8 ms/row): the memory-sized default runs a 5k-row input as ~2 fat
    # tasks — see fanout_batch
    bs = fanout_batch(n_base, config)
    csr_ref = None
    if use_broadcast_verify:
        sh = stage_map_batches(
            base, _ShingleColumn, (config, "text", "l"), config,
            batch_format="pyarrow", batch_size=bs,
        )
        csr_ref = ray.put(collect_shingle_csr(sh))

    banded = stage_map_batches(
        base, MinHashBander, (config, "text"), config,
        batch_format="pyarrow", batch_size=bs,
    ).map_batches(
        lambda t: t.append_column("side", pa.array(np.zeros(len(t), dtype=np.int8))),
        batch_format="pyarrow",
    ).materialize()

    from ..functions.grouped import groupby_agg

    counts = groupby_agg(banded, "band_key", None, "count", num_buckets=64)
    import pyarrow.compute as pc

    hot_rows = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], config.max_bucket_size)),
        batch_format="pyarrow",
    ).take_all()
    hot = {
        int(r["band_key"]): int(-(-r["count()"] // config.max_bucket_size)) for r in hot_rows
    }
    salted = stage_map_batches(
        banded, _SaltHotBuckets, (ray.put(hot), config.max_bucket_size), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )
    from ..functions.grouped import bucketed_group_map, dedup_pairs
    from ..stages.lsh import emit_pairs_bucket

    if prefilter_min_band_matches is not None:
        # keep cross-band repeats; the dedup shuffle counts them per pair
        # (== matching bands) and filters on the estimate — same shuffle
        # volume as the plain dedup, but the verify joins downstream only
        # see pairs whose estimated Jaccard clears the bar
        min_n = int(prefilter_min_band_matches)
        pairs_raw = bucketed_group_map(
            salted, ["band_key", "salt"],
            lambda df: emit_pairs_bucket(df, False, dedup=False),
        )

        def count_filter(df: pd.DataFrame) -> pd.DataFrame:
            g = (
                df.groupby(["left_idx", "right_idx"], sort=False)
                .size()
                .reset_index(name="n")
            )
            return g.loc[g["n"] >= min_n, ["left_idx", "right_idx"]]

        pairs = bucketed_group_map(pairs_raw, ["left_idx", "right_idx"], count_filter)
    else:
        pairs = bucketed_group_map(
            salted, ["band_key", "salt"], lambda df: emit_pairs_bucket(df, False)
        )
        pairs = dedup_pairs(pairs, ["left_idx", "right_idx"])

    if use_broadcast_verify:
        # materialize: without it the group-map exchange + pair-dedup sort
        # + repartition + CC exchanges all chain inside ONE streaming
        # execution, which thrashes under operator resource reservation
        # (measured 25-80 s vs ~11 s staged; same class as the chained-sort
        # livelock in BENCH/BASELINE.md). The sort in dedup_pairs is a
        # global barrier anyway — staging costs no pipelining.
        pairs = pairs.materialize()
        # split-only repartition: the pair dedup's sort exchange emits one
        # block per reduce partition, and map task fan-out follows block
        # count — unsplit, the whole verify ran as ~1 task (same fix as the
        # flagship's post-dedup split, stages/lsh.py). Materialized too:
        # fused repartition+verify executions measured 10-33 s rep-to-rep
        # at sf0.1 where the staged equivalent holds 5-7 s; the split
        # output is 16 B/row, staging it is ~free.
        pairs = pairs.repartition(target_num_rows_per_block=16384).materialize()
        verified = stage_map_batches(
            pairs,
            _ShingleJaccardBroadcastVerify,
            (csr_ref, jaccard_threshold), config,
            batch_format="pyarrow", batch_size=16384,
        )
        return _cluster_and_keep(verified, base, id_col, config)

    lsh_l = stage_map_batches(base, _ShingleColumn, (config, "text", "l"), config,
                              batch_format="pyarrow", batch_size=bs)
    lsh_r = stage_map_batches(base, _ShingleColumn, (config, "text", "r"), config,
                              batch_format="pyarrow", batch_size=bs)
    pair_schema = pa.schema([("left_idx", pa.int64()), ("right_idx", pa.int64())])
    lsch = pa.schema([("l_idx", pa.int64()), ("l_sh", pa.binary())])
    rsch = pa.schema([("r_idx", pa.int64()), ("r_sh", pa.binary())])
    withl_schema = pa.schema(
        list(pair_schema) + [pa.field("l_idx", pa.int64()), pa.field("l_sh", pa.binary())]
    )
    # bundle cap: these joins carry packed shingle sets (~8 B per distinct
    # shingle per doc — KBs/row on the long-document corpora minhash
    # targets), so the narrow-row default of 131k rows/bundle would make a
    # single tag-map output block multi-GB. 2048 rows ≈ 16 MB at 1 KB docs,
    # still hundreds of MB at 100 KB docs — the wide-payload hazard the
    # shuffle_join docstring warns about.
    _sh_bundle = 2048
    withl = shuffle_join(pairs, lsh_l, on="left_idx", right_on="l_idx", how="inner",
                         left_schema=pair_schema, right_schema=lsch,
                         bundle_rows=_sh_bundle)
    withlr = shuffle_join(withl, lsh_r, on="right_idx", right_on="r_idx", how="inner",
                          left_schema=withl_schema, right_schema=rsch,
                          bundle_rows=_sh_bundle)
    verified = stage_map_batches(
        withlr, _ShingleJaccardVerify, (jaccard_threshold,), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )
    return _cluster_and_keep(verified, base, id_col, config)


class _SimHasher:
    """64-bit SimHash over shingle hashes + 4×16-bit band keys."""

    def __init__(self, config: EngineConfig, text_col: str):
        self.tokenizer = NGramTokenizer(config)
        self.text_col = text_col

    @staticmethod
    def simhash(shingles: np.ndarray) -> np.uint64:
        return _SimHasher.simhash_batch([shingles])[0]

    @staticmethod
    def simhash_batch(shingle_lists) -> np.ndarray:
        """Per-bit majority votes for a whole batch in one vectorized pass:
        unpack all rows' shingle bits at once, ``add.reduceat`` the ±1 votes
        per row — no per-row or per-bit Python."""
        n = len(shingle_lists)
        out = np.zeros(n, dtype=np.uint64)
        lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64, count=n)
        nz = np.flatnonzero(lens)
        if not len(nz):
            return out
        flat = np.concatenate([shingle_lists[i] for i in nz]).astype(np.uint64)
        bit_ids = np.arange(64, dtype=np.uint64)[None, :]
        bits = ((flat[:, None] >> bit_ids) & np.uint64(1)).astype(np.int64)
        starts = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=starts[1:])
        votes = np.add.reduceat(2 * bits - 1, starts, axis=0)
        sig_bits = (votes > 0).astype(np.uint64)
        out[nz] = (sig_bits << bit_ids).sum(axis=1, dtype=np.uint64)
        return out

    def __call__(self, t: pa.Table) -> pa.Table:
        shingles = self.tokenizer.shingle_hashes_batch(t[self.text_col].to_pylist())
        sigs = self.simhash_batch(shingles)
        rows = t["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_band, out_key, out_row, out_sig = [], [], [], []
        for b in range(4):
            band_val = ((sigs >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            out_band.append(np.full(len(sigs), b, dtype=np.int8))
            out_key.append(band_val)
            out_row.append(rows)
            out_sig.append(sigs)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), type=pa.int8()),
                "band_val": pa.array(np.concatenate(out_key)),
                "row_idx": pa.array(np.concatenate(out_row)),
                "sig": pa.array(np.concatenate(out_sig), type=pa.uint64()),
            }
        )


def simhash_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    config: Optional[EngineConfig] = None,
) -> "ray.data.Dataset":
    """SimHash near-dedup: any pair within Hamming distance 3 of a 64-bit
    SimHash shares at least one of the 4 16-bit bands exactly (pigeonhole),
    so bucketing on (band, band_val) has full recall for k ≤ 3."""
    config = config or EngineConfig()
    base = ds.map_batches(
        lambda t: pa.table({"row_idx": t[id_col].cast(pa.int64()), "text": t[text_col]}),
        batch_format="pyarrow",
    ).materialize()
    banded = stage_map_batches(
        base, _SimHasher, (config, text_col if text_col == "text" else "text"), config,
        batch_format="pyarrow", batch_size=fanout_batch(base.count(), config),
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"left_idx": np.empty(0, np.int64),
                              "right_idx": np.empty(0, np.int64)})
        rows = g["row_idx"].to_numpy(dtype=np.int64)
        sigs = g["sig"].to_numpy().astype(np.uint64)
        if len(rows) < 2:
            return empty
        # 1. exact-dup collapse: identical sigs (the usual cause of hot
        #    buckets) become star edges to the min-row rep — connectivity is
        #    all the downstream CC needs, so no quadratic emission here.
        order = np.lexsort((rows, sigs))
        rows, sigs = rows[order], sigs[order]
        new_sig = np.ones(len(sigs), dtype=bool)
        new_sig[1:] = sigs[1:] != sigs[:-1]
        group_of = np.cumsum(new_sig) - 1
        rep_rows = rows[new_sig]  # min row per distinct sig (rows sorted within sig)
        out_l = [rep_rows[group_of[~new_sig]]]
        out_r = [rows[~new_sig]]
        # 2. Hamming pairs across DISTINCT sigs, chunked+vectorized popcount:
        #    bounded memory at any bucket size, zero recall loss (the old
        #    guard silently dropped all pairs for buckets >2000 rows).
        d_sigs = sigs[new_sig]
        d = len(d_sigs)
        if d >= 2:
            if d > 50_000:
                import logging

                logging.getLogger(__name__).warning(
                    "simhash bucket with %d distinct signatures — quadratic "
                    "verify will be slow (still exact)", d
                )
            chunk = 1024
            for i0 in range(0, d, chunk):
                ai = d_sigs[i0 : i0 + chunk]
                ra = rep_rows[i0 : i0 + chunk]
                for j0 in range(i0, d, chunk):
                    bj = d_sigs[j0 : j0 + chunk]
                    rb = rep_rows[j0 : j0 + chunk]
                    x = ai[:, None] ^ bj[None, :]
                    ham = _popcount64(x.reshape(-1)).reshape(x.shape)
                    if i0 == j0:
                        ham[np.tril_indices(len(ai), k=0)] = 64 + max_hamming
                    ii, jj = np.nonzero(ham <= max_hamming)
                    if len(ii):
                        out_l.append(ra[ii])
                        out_r.append(rb[jj])
        a = np.concatenate(out_l)
        b = np.concatenate(out_r)
        if len(a) == 0:
            return empty
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"left_idx": lo, "right_idx": hi}).drop_duplicates()

    from ..functions.grouped import bucketed_group_map

    def simhash_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [pairs_in_bucket(g) for _, g in df.groupby(["band", "band_val"], sort=False)]
        if not outs:
            return pd.DataFrame({"left_idx": np.empty(0, np.int64),
                                 "right_idx": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True).drop_duplicates()

    from ..functions.grouped import dedup_pairs

    pairs = bucketed_group_map(banded, ["band", "band_val"], simhash_bucket)
    pairs = dedup_pairs(pairs, ["left_idx", "right_idx"])
    edges = pairs.map_batches(
        lambda t: t.append_column("similarity", pa.array(np.ones(len(t), dtype=np.float64))),
        batch_format="pyarrow",
    )
    return _cluster_and_keep(edges, base, id_col, config)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    ngram_size: int = 3,
    config: Optional[EngineConfig] = None,
    max_gram_docs: Optional[int] = None,
) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard self-join: pairs with
    |shared distinct n-grams| / |union| ≥ threshold.

    Scale shape: the shuffle key is the FNV-64 of the n-gram; per-doc sizes
    are a distributed pre-aggregated count carried to the pairs by two
    bucketed shuffle joins (never a driver-side dict); hot grams are salted
    into chunk-pair sub-buckets (same skew machinery as the text LSH path)
    so no single task is quadratic in a stop-gram's posting list. Total
    emitted-pair volume is still Σ C(posting, 2) — inherent to an exact
    Jaccard join; pass ``max_gram_docs`` to drop grams with longer postings
    (every drop is logged with its posting size) or use ``minhash_dedup``
    for web-scale text. n-grams are raw character substrings of the
    ORIGINAL text (no normalization), so the DuckDB oracle is a direct
    substring expression. Gram identity is its 64-bit FNV hash; a collision
    (P ≈ D²/2⁶⁴ for D distinct grams) would overcount one intersection.
    """
    config = config or EngineConfig()
    from ..functions.grouped import bucketed_group_map, groupby_agg
    from ..functions.joins import shuffle_join
    from ..stages.lsh import _SaltHotBuckets, _emit_pairs, _segment_pairs

    class _ExplodeGrams:
        def __init__(self, n: int):
            self.n = n

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..text import fnv1a_64_batch

            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            out_id, out_g = [], []
            for i, s in enumerate(t[text_col].to_pylist()):
                grams = {s[j : j + self.n] for j in range(len(s) - self.n + 1)}
                out_id.extend([ids[i]] * len(grams))
                out_g.extend(grams)
            gkeys = fnv1a_64_batch(out_g).astype(np.int64)
            return pa.table(
                {
                    "band_key": pa.array(gkeys, type=pa.int64()),
                    "row_idx": pa.array(out_id, type=pa.int64()),
                    "side": pa.array(np.zeros(len(out_id), dtype=np.int8)),
                }
            )

    grams = stage_map_batches(ds, _ExplodeGrams, (ngram_size,), config,
                              batch_format="pyarrow", batch_size=config.batch_size)
    grams = grams.materialize()
    # per-doc distinct-gram counts (the union term): distributed, joined later
    sizes = groupby_agg(grams, "row_idx", None, "count", out_col="sz").map_batches(
        lambda t: pa.table({"doc": t["row_idx"], "sz": t["sz"].cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()  # consumed by both size joins

    # gram census → optional logged cap + salt map for hot grams
    counts = groupby_agg(grams, "band_key", None, "count", num_buckets=64)
    import pyarrow.compute as pc

    hot_rows = counts.map_batches(
        lambda t: t.filter(pc.greater(t["count()"], config.max_bucket_size)),
        batch_format="pyarrow",
    ).take_all()
    dropped: list = []
    hot = {}
    for r in hot_rows:
        k, c = int(r["band_key"]), int(r["count()"])
        if max_gram_docs is not None and c > max_gram_docs:
            dropped.append((k, c))
        else:
            hot[k] = -(-c // config.max_bucket_size)
    if dropped:
        import logging

        logging.getLogger(__name__).warning(
            "ngram_jaccard_pairs: dropping %d grams with postings > %d "
            "(largest: %d docs) — intersections through them are lost",
            len(dropped), max_gram_docs, max(c for _, c in dropped),
        )
        drop_keys = np.sort(np.array([k for k, _ in dropped], dtype=np.int64))
        drop_ref = ray.put(drop_keys)

        def drop_hot(t: pa.Table) -> pa.Table:
            dk = ray.get(drop_ref) if isinstance(drop_ref, ray.ObjectRef) else drop_ref
            keys = t["band_key"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(dk, keys)
            n = len(dk)
            is_dropped = (pos < n) & (dk[np.minimum(pos, n - 1)] == keys)
            return t.filter(pa.array(~is_dropped))

        grams = grams.map_batches(drop_hot, batch_format="pyarrow")

    salted = stage_map_batches(
        grams, _SaltHotBuckets, (ray.put(hot), config.max_bucket_size), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )

    def emit_multi(df: pd.DataFrame) -> pd.DataFrame:
        """Pairs per (gram, salt) group, KEEPING cross-gram multiplicity
        (the per-pair count is the intersection size)."""
        keys = df["band_key"].to_numpy(dtype=np.int64)
        salts = df["salt"].to_numpy(dtype=np.int64)
        rows = df["row_idx"].to_numpy(dtype=np.int64)
        order = np.lexsort((rows, salts, keys))
        keys, salts, rows = keys[order], salts[order], rows[order]
        outs = []
        plain = salts == 0
        if plain.any():
            pk, pr = keys[plain], rows[plain]
            boundaries = np.flatnonzero(np.diff(pk)) + 1
            offsets = np.concatenate([[0], boundaries]).astype(np.int64)
            sizes_ = np.diff(np.concatenate([offsets, [len(pk)]])).astype(np.int64)
            li, ri = _segment_pairs(offsets, sizes_)
            a, b = pr[li], pr[ri]
            outs.append(pd.DataFrame({"left_idx": np.minimum(a, b),
                                      "right_idx": np.maximum(a, b)}))
        if (~plain).any():
            sdf = pd.DataFrame(
                {
                    "band_key": keys[~plain],
                    "salt": salts[~plain],
                    "row_idx": rows[~plain],
                    "side": df["side"].to_numpy()[order][~plain],
                    "chunk": df["chunk"].to_numpy()[order][~plain],
                    "diag_sub": df["diag_sub"].to_numpy()[order][~plain],
                }
            )
            outs.extend(
                _emit_pairs(g, False)
                for _, g in sdf.groupby(["band_key", "salt"], sort=False)
            )
        if not outs:
            return pd.DataFrame({"left_idx": np.empty(0, np.int64),
                                 "right_idx": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)  # NO dedup: multiplicity matters

    shared = bucketed_group_map(salted, ["band_key", "salt"], emit_multi)

    # per-pair intersection counts: map-side partial count, bucketed combine
    # (Arrow-native hash aggregation — no pandas⇄Arrow hop, keys are int64)
    def partial_count(t: pa.Table) -> pa.Table:
        out = (
            t.select(["left_idx", "right_idx"])
            .group_by(["left_idx", "right_idx"])
            .aggregate([([], "count_all")])
        )
        # select/rename BY NAME: the key-vs-aggregate column order of
        # TableGroupBy output changed across pyarrow versions, and a
        # positional rename would silently mislabel a key column as the
        # count
        return pa.table(
            {
                "left_idx": out["left_idx"],
                "right_idx": out["right_idx"],
                "n": out["count_all"],
            }
        )

    def combine_count(t: pa.Table) -> pa.Table:
        out = t.group_by(["left_idx", "right_idx"]).aggregate([("n", "sum")])
        return pa.table(
            {
                "left_idx": out["left_idx"],
                "right_idx": out["right_idx"],
                "n": out["n_sum"],
            }
        )

    shared_counts = bucketed_group_map(
        shared.map_batches(partial_count, batch_format="pyarrow"),
        ["left_idx", "right_idx"],
        combine_count,
        bucket_format="pyarrow",
    )

    # carry both docs' sizes to the pair via two bucketed shuffle joins
    cnt_schema = pa.schema([("left_idx", pa.int64()), ("right_idx", pa.int64()),
                            ("n", pa.int64())])
    sz_schema = pa.schema([("doc", pa.int64()), ("sz", pa.int64())])
    withl = shuffle_join(shared_counts, sizes, on="left_idx", right_on="doc",
                         how="inner", left_schema=cnt_schema, right_schema=sz_schema)
    withl = withl.map_batches(
        lambda t: pa.table({"left_idx": t["left_idx"], "right_idx": t["right_idx"],
                            "n": t["n"], "l_sz": t["sz"]}),
        batch_format="pyarrow",
    )
    withlr = shuffle_join(
        withl, sizes.map_batches(lambda t: t.rename_columns(["doc2", "sz2"]),
                                 batch_format="pyarrow"),
        on="right_idx", right_on="doc2", how="inner",
        left_schema=pa.schema([("left_idx", pa.int64()), ("right_idx", pa.int64()),
                               ("n", pa.int64()), ("l_sz", pa.int64())]),
        right_schema=pa.schema([("doc2", pa.int64()), ("sz2", pa.int64())]),
    )

    def jaccard(t: pa.Table) -> pa.Table:
        l = t["left_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["right_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        inter = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        union = (
            t["l_sz"].to_numpy(zero_copy_only=False).astype(np.float64)
            + t["sz2"].to_numpy(zero_copy_only=False).astype(np.float64)
            - inter
        )
        jac = np.where(union > 0, inter / union, 0.0)
        keep = jac >= threshold
        return pa.table(
            {
                "left_id": pa.array(l[keep]),
                "right_id": pa.array(r[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return withlr.map_batches(jaccard, batch_format="pyarrow")
