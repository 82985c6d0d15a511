"""Connected components over the match edge list (operator A8 in SURVEY.md).

The reference calls ``scipy.sparse.csgraph.connected_components`` on a
driver-local adjacency matrix (``/root/reference/string_grouper/string_grouper.py:853-863``).
Here:

* **distributed path** — iterative min-label propagation with pointer
  jumping, expressed entirely as Dataset transforms: each round sends every
  node's current label across its edges (a join keyed on node), takes the
  per-node min (a groupby), then shortcuts label → label-of-label (a second
  join). Converges in O(log n) rounds for near-dup graphs; every round's
  label table is a checkpointable Dataset.
* **driver path** — when the deduped edge list is provably small
  (≤ ``cc_driver_max_edges``), collapse to numpy pairs on the driver and run
  array-based union-find with path compression. The edge list after
  thresholding is orders of magnitude smaller than the input table, so this
  is the common case even for large inputs.

Labels are canonical: every component is labeled by its minimum ``row_idx``
— deterministic regardless of partitioning, unlike scipy's arbitrary
component numbering (the reference's tests only compare group
*representatives*, which we reproduce exactly in pipelines/cluster.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig


def map_node_ids(values: np.ndarray, sorted_nodes: np.ndarray) -> np.ndarray:
    """Map raw node ids to positions in ``sorted_nodes``; unknown ids → -1.

    Dense-ish id spaces (span ≤ max(16× the node count, 2^20) — the floor
    means a table up to 8 MB is always allowed) use an O(1) table lookup
    instead of per-value binary search — the searchsorted pair plus its
    validity gathers measured ~1.8 s of the 2.9 s driver-UF wall on the
    7.8M-edge group_part graph; the table is one int64 vector of ``span``
    entries."""
    n = len(sorted_nodes)
    if n == 0:
        return np.full(len(values), -1, dtype=np.int64)
    span = int(sorted_nodes[-1] - sorted_nodes[0] + 1)
    if span <= max(16 * n, 1 << 20):
        base = sorted_nodes[0]
        lut = np.full(span, -1, dtype=np.int64)
        lut[sorted_nodes - base] = np.arange(n, dtype=np.int64)
        off = values - base
        inside = (off >= 0) & (off < span)
        return np.where(inside, lut[np.clip(off, 0, span - 1)], -1)
    idx = np.searchsorted(sorted_nodes, values).astype(np.int64)
    ok = (idx < n) & (sorted_nodes[np.minimum(idx, n - 1)] == values)
    return np.where(ok, idx, -1)


def _driver_union_find(l: np.ndarray, r: np.ndarray, nodes: np.ndarray) -> np.ndarray:
    """Vectorized min-label propagation with pointer jumping.

    Converges to the min-node label per component in O(log n) sweeps; each
    sweep is two segment-min relaxations over the edge arrays plus a few
    pointer-jump gathers — tens of millions of edges resolve in seconds,
    where a per-edge Python union-find loop would take minutes.
    """
    order = np.argsort(nodes)
    sorted_nodes = nodes[order]
    n = len(nodes)
    # one mapping call for both endpoint columns: the dense path builds
    # its O(span) lookup table per call, so mapping the concatenation
    # halves the table builds
    both = map_node_ids(np.concatenate([l, r]), sorted_nodes)
    li, ri = both[: len(l)], both[len(l):]
    # fail loudly on edges referencing unknown nodes: an unchecked mapping
    # would silently alias the endpoint to a neighboring node, corrupting
    # component labels
    li_ok = li >= 0
    ri_ok = ri >= 0
    if not (bool(li_ok.all()) and bool(ri_ok.all())):
        bad = np.concatenate([l[~li_ok], r[~ri_ok]])[:5]
        raise ValueError(
            f"connected_components: edge endpoints not present in the nodes "
            f"dataset (first offenders: {bad.tolist()})"
        )
    # canonicalize + dedup: self-join edge lists arrive mirrored (both
    # (i,j) and (j,i)) plus a forced diagonal — none of which add
    # connectivity. One packed-key unique halves every scatter sweep below.
    if n > 0 and n < 3_000_000_000:  # lo*n+hi must fit int64
        lo = np.minimum(li, ri)
        hi = np.maximum(li, ri)
        off_diag = lo != hi
        packed = lo[off_diag] * np.int64(n) + hi[off_diag]
        packed = np.unique(packed)
        li = (packed // n).astype(np.int64)
        ri = (packed % n).astype(np.int64)
    label = np.arange(n, dtype=np.int64)
    m = len(li)
    if m:
        # segment-min relaxation setup: sorting each endpoint column once
        # lets every sweep use buffered ``minimum.reduceat`` segment-mins
        # plus a plain fancy assignment onto the (unique) segment keys —
        # the unbuffered ``np.minimum.at`` scatters this replaces ran ~4×
        # slower per sweep at millions of edges (2.9 s → sub-second UF on
        # the 7.8M-edge group_part graph). Jacobi- instead of
        # Gauss-Seidel-ordered relaxation — may cost one extra sweep, the
        # fixpoint (and the convergence check) is identical.
        if bool(np.all(li[:-1] <= li[1:])):  # packed-unique leaves li sorted
            li_s, ri_by_lo = li, ri
        else:
            order_lo = np.argsort(li, kind="stable")
            li_s, ri_by_lo = li[order_lo], ri[order_lo]
        lo_starts = np.flatnonzero(np.r_[True, li_s[1:] != li_s[:-1]])
        uniq_lo = li_s[lo_starts]
        order_hi = np.argsort(ri, kind="stable")
        ri_s, li_by_hi = ri[order_hi], li[order_hi]
        hi_starts = np.flatnonzero(np.r_[True, ri_s[1:] != ri_s[:-1]])
        uniq_hi = ri_s[hi_starts]
    while True:
        # relax across edges (both directions)
        if m:
            label[uniq_lo] = np.minimum(
                label[uniq_lo], np.minimum.reduceat(label[ri_by_lo], lo_starts)
            )
            label[uniq_hi] = np.minimum(
                label[uniq_hi], np.minimum.reduceat(label[li_by_hi], hi_starts)
            )
        # pointer jumping: label <- label[label] until stable this sweep
        for _ in range(32):
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        # converged when no edge can still relax
        if m == 0 or bool(np.all(label[li] == label[ri])):
            break
    labels_sorted = sorted_nodes[label]  # component label = min node id
    labels = np.empty(n, dtype=np.int64)
    labels[order] = labels_sorted
    return labels


def spanning_forest_contract(
    edges: "ray.data.Dataset", num_buckets: int = 64
) -> "ray.data.Dataset":
    """Parallel edge contraction: hash-partition edges, run a local numpy
    union-find per partition, emit only each partition's spanning-forest
    edges (≤ distinct nodes per partition, vs O(edges) input).

    Connectivity-exact: a union of per-partition spanning forests connects
    exactly the same components as the full edge list, so the driver's
    union-find can finish on the contracted set. This keeps the serial
    driver work O(nodes) while the O(edges) pass stays map-parallel — the
    same filtering trick published for massive-graph CC (contract locally,
    solve the small remainder centrally).
    """
    from ..functions.grouped import bucketed_group_map

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        import pandas as pd  # noqa: F811

        l = df["left_idx"].to_numpy(dtype=np.int64)
        r = df["right_idx"].to_numpy(dtype=np.int64)
        nodes = np.unique(np.concatenate([l, r]))
        labels = _driver_union_find(l, r, nodes)
        # tree edges: every node → its component label (skip self-roots)
        keep = labels != nodes
        return pd.DataFrame(
            {
                "left_idx": labels[keep],
                "right_idx": nodes[keep],
                "similarity": np.ones(int(keep.sum()), dtype=np.float64),
            }
        )

    import pandas as pd

    return bucketed_group_map(
        edges.select_columns(["left_idx", "right_idx"]),
        ["left_idx", "right_idx"],
        contract,
        num_buckets=num_buckets,
    )


def connected_components(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    force_distributed: bool = False,
) -> "ray.data.Dataset":
    """Label every node with the minimum ``row_idx`` of its component.

    ``edges`` needs columns (left_idx, right_idx); ``nodes`` needs
    ``row_idx`` (isolated nodes become singleton components).
    Returns a Dataset with columns (row_idx:int64, group_id:int64).
    """
    config = config or EngineConfig()
    # materialize: the edge list is consumed at least twice (count + labels),
    # and re-executing the whole candidate/verify DAG would dominate runtime.
    # Thresholded edges are far smaller than the input table; they spill
    # gracefully if large. (Skip if the caller already materialized — a
    # second materialize copies every block again.)
    from ray.data.dataset import MaterializedDataset

    if not isinstance(edges, MaterializedDataset):
        edges = edges.materialize()
    n_edges = edges.count()
    if not force_distributed and n_edges <= config.cc_driver_max_edges:
        return _cc_driver(edges, nodes, n_edges, config)
    return _cc_distributed(edges, nodes, config)


def _cc_driver(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    n_edges: Optional[int] = None,
    config: Optional[EngineConfig] = None,
) -> "ray.data.Dataset":
    from ..functions.collect import collect_columns

    config = config or EngineConfig()
    if n_edges is None:
        n_edges = edges.count()
    if n_edges > config.cc_contract_min_edges:
        edges = spanning_forest_contract(edges)
    pairs = collect_columns(edges, ["left_idx", "right_idx"])
    l = pairs["left_idx"].astype(np.int64)
    r = pairs["right_idx"].astype(np.int64)
    node_ids = collect_columns(nodes, ["row_idx"])["row_idx"].astype(np.int64)
    labels = _driver_union_find(l, r, node_ids)
    return ray.data.from_arrow(
        pa.table({"row_idx": pa.array(node_ids), "group_id": pa.array(labels)})
    )


_EDGE_SCHEMA = pa.schema([("left_idx", pa.int64()), ("right_idx", pa.int64())])


def _star_bucket(t: pa.Table, large: bool) -> pa.Table:
    """One alternating-star operation over a hash bucket of edges.

    Input rows are (left_idx=group key u, right_idx=neighbor v); the bucket
    holds EVERY row of each u hashed into it. Per group:
      m = min(Γ(u) ∪ {u})
      large-star: emit (m, v) for v ∈ Γ(u), v > u
      small-star: emit (m, x) for x ∈ Γ(u) ∪ {u}, x ≠ m
    All numpy: lexsort + reduceat segment mins; output deduped in-bucket.
    """
    u = t["left_idx"].to_numpy(zero_copy_only=False)
    v = t["right_idx"].to_numpy(zero_copy_only=False)
    if not len(u):
        return _EDGE_SCHEMA.empty_table()
    order = np.lexsort((v, u))
    u = u[order]
    v = v[order]
    starts = np.ones(len(u), dtype=bool)
    starts[1:] = u[1:] != u[:-1]
    seg = np.flatnonzero(starts)
    m = np.minimum(np.minimum.reduceat(v, seg), u[seg])
    mv = m[np.cumsum(starts) - 1]  # per-row group min
    if large:
        keep = v > u
        l_out, r_out = mv[keep], v[keep]
    else:
        keep = v != mv
        l_out = np.concatenate([mv[keep], m])
        r_out = np.concatenate([v[keep], u[seg]])
        nz = l_out != r_out
        l_out, r_out = l_out[nz], r_out[nz]
    if not len(l_out):
        return _EDGE_SCHEMA.empty_table()
    o = np.lexsort((r_out, l_out))
    l_out, r_out = l_out[o], r_out[o]
    keep = np.ones(len(l_out), dtype=bool)
    keep[1:] = (l_out[1:] != l_out[:-1]) | (r_out[1:] != r_out[:-1])
    return pa.table(
        {
            "left_idx": pa.array(l_out[keep].astype(np.int64)),
            "right_idx": pa.array(r_out[keep].astype(np.int64)),
        }
    )


def _cc_distributed(
    edges: "ray.data.Dataset", nodes: "ray.data.Dataset", config: EngineConfig
) -> "ray.data.Dataset":
    """Alternating large-star / small-star contraction, all Dataset ops.

    Edge-volume reduction FIRST: repeated map-parallel spanning-forest
    contraction (one bucketed exchange per round) replaces the verified
    edge list with per-partition spanning forests — connectivity-exact and
    ≤ one edge per non-root node, so the star rounds below operate on
    ≤ |nodes| tree edges instead of ALL verified edges (which on dup-heavy
    corpora are many × |nodes|). Contraction repeats while it keeps
    shrinking the set ≥ 1.5×.

    Propagation is the alternating algorithm of Kiveris et al.,
    "Connected Components in MapReduce and Beyond" (SoCC 2014 — public):
    repeat {large-star; small-star} until the edge set stops changing; at
    the fixpoint the edges are exactly stars rooted at each component's
    MINIMUM node id (our canonical label). Each operation is ONE bucketed
    group exchange over the edge list — vs three exchanges per round
    (edge⋈label join, groupby-min, pointer-jump join) for the min-label
    propagation it replaces, which measured 11 rounds × ~4 s at 2M rows
    while the star loop converges in a handful of single-exchange rounds.
    Convergence test: the (count, Σleft, Σright) triple of the edge set is
    unchanged across a full large+small iteration (the multiset is
    non-increasing toward the fixpoint; a changed multiset with identical
    count AND both int64 sums is not a realistic collision), with a
    64-iteration backstop.
    """
    import os as _os
    import time as _time

    from ..functions.grouped import bucketed_group_map, groupby_agg
    from ..functions.joins import shuffle_join

    _prof = bool(_os.environ.get("SGR_PROFILE"))
    _t0 = _time.perf_counter()

    def _mark(label: str) -> None:
        nonlocal _t0
        if _prof:
            t = _time.perf_counter()
            print(f"    [cc] {label}: {t - _t0:.1f}s", flush=True)
            _t0 = t

    n_edges = edges.count()
    for _ci in range(3):
        contracted = spanning_forest_contract(edges).materialize()
        n_after = contracted.count()
        edges = contracted
        _mark(f"contract[{_ci}] {n_edges}->{n_after}")
        if n_after >= n_edges / 1.5:
            break
        n_edges = n_after

    def drop_diag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.not_equal(t["left_idx"], t["right_idx"]))

    stars = (
        edges.select_columns(["left_idx", "right_idx"])
        .map_batches(drop_diag, batch_format="pyarrow")
        .materialize()
    )
    _mark("star setup")

    def mirror(t: pa.Table) -> pa.Table:
        return pa.table({"left_idx": t["right_idx"], "right_idx": t["left_idx"]})

    def orient_max_first(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "left_idx": pc.max_element_wise(t["left_idx"], t["right_idx"]),
                "right_idx": pc.min_element_wise(t["left_idx"], t["right_idx"]),
            }
        )

    prev_triple = None
    if not stars.count():  # no edges at all: every node is a singleton
        return nodes.select_columns(["row_idx"]).map_batches(
            lambda t: pa.table({"row_idx": t["row_idx"], "group_id": t["row_idx"]}),
            batch_format="pyarrow",
        )
    import gc as _gc

    from ..functions.grouped import bundle_for

    n_star = stars.count()
    for _round in range(64):  # backstop; fixpoint in O(log^2 n) operations
        # explicit map-side bundles: reduce parallelism follows INPUT block
        # count in this Ray version, and the union below doubles the block
        # count every round — unbundled, the rounds' exchanges fragment
        # geometrically and per-round wall grows at constant edge count
        _bundle = bundle_for(2 * max(1, n_star))
        # bucket fan-out sized to the EDGE volume, not the flat CPU-derived
        # default: the round's materialized output is one block per occupied
        # bucket, and at a few million edges 128 buckets fragment each round's
        # input geometrically (profiled: blocks 8→43, per-round wall
        # 0.7→2.2 s at CONSTANT edge count) — ~128k rows per bucket keeps
        # rounds flat while staying above the per-CPU floor
        from ..functions.grouped import default_buckets

        _nb = int(min(default_buckets(), max(8, 2 * n_star // 131_072)))
        # large-star over the symmetrized adjacency (group key = left_idx)
        sym = stars.union(stars.map_batches(mirror, batch_format="pyarrow"))
        large = bucketed_group_map(
            sym, ["left_idx"], lambda t: _star_bucket(t, large=True),
            num_buckets=_nb, bucket_format="pyarrow", bundle_rows=_bundle,
        )
        # small-star groups each edge once, by its MAX endpoint
        prev_stars = stars
        stars = bucketed_group_map(
            large.map_batches(orient_max_first, batch_format="pyarrow"),
            ["left_idx"], lambda t: _star_bucket(t, large=False),
            num_buckets=_nb, bucket_format="pyarrow", bundle_rows=_bundle,
        ).materialize()
        # release the previous round's materialized edges and this round's
        # intermediate lineage NOW: the streaming executor budgets object
        # store per operator, and blocks pinned by dangling round datasets
        # throttle the next round's exchanges (measured: per-round wall grew
        # 0.9→3.6 s at constant edge count before this release)
        del prev_stars, sym, large
        _gc.collect()
        n = stars.count()
        sums = (stars.sum(["left_idx", "right_idx"]) if n
                else {"sum(left_idx)": 0, "sum(right_idx)": 0})
        triple = (n, sums["sum(left_idx)"], sums["sum(right_idx)"])
        _mark(f"star_round[{_round}] edges={n} blocks={stars.num_blocks()}")
        n_star = n
        if triple == prev_triple or n == 0:
            break
        prev_triple = triple

    # at the fixpoint every edge is (component_min, node); a node appears
    # under exactly one root, but dedup defensively (min root per node)
    # before hydrating so a duplicate star edge can never fan out a node
    att = groupby_agg(stars, "right_idx", "left_idx", "min").map_batches(
        lambda t: t.rename_columns(["node", "root"]), batch_format="pyarrow"
    )
    joined = shuffle_join(
        nodes.select_columns(["row_idx"]), att, on="row_idx", right_on="node",
        how="left",
        left_schema=pa.schema([("row_idx", pa.int64())]),
        right_schema=pa.schema([("node", pa.int64()), ("root", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # combine_chunks first: pc.coalesce over two ChunkedArrays with
        # different chunk layouts misaligns values in pyarrow 16.1 (the
        # cast can collapse one side to a single chunk) — here that
        # would silently corrupt component labels
        t = t.combine_chunks()
        lbl = pc.coalesce(t["root"].cast(pa.int64()), t["row_idx"].cast(pa.int64()))
        return pa.table({"row_idx": t["row_idx"].cast(pa.int64()), "group_id": lbl})

    out = joined.map_batches(finish, batch_format="pyarrow")
    _mark("labels join")
    return out
