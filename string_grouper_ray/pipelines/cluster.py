"""Dedup / clustering pipeline — ``group_similar_strings`` semantics
(operators A4/A5/A8 in SURVEY.md; reference ``_deduplicate`` at
``/root/reference/string_grouper/string_grouper.py:851-904``).

    edges (self-join, symmetrized)            pipelines/match.py
      → connected components                  state/unionfind.py
      → per-node weight                       'first': row_idx
                                              'centroid': groupby(left).sum(sim)
      → per-group representative              groupby(group).argmax/argmin
      → labels joined back onto the input     shuffle_join on row_idx/group_id

Determinism: components are labeled by min ``row_idx``; centroid ties break
to the lowest ``row_idx`` (the reference's ``idxmax`` takes the first
occurrence in row order, ``string_grouper.py:883-886``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import GROUP_REP_CENTROID, EngineConfig
from ..functions.joins import shuffle_join
from ..sparse import Vocabulary
from ..state.unionfind import connected_components
from .match import match_edges


def group_assignments(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    vocab: Optional[Vocabulary] = None,
    text_col: str = "text",
    edges: Optional["ray.data.Dataset"] = None,
    force_distributed: bool = False,
    dedup_edges: bool = False,
    id_col: Optional[str] = None,
) -> "ray.data.Dataset":
    """Cluster a dataset of (row_idx, text) rows into near-dup groups.

    Returns a Dataset with columns
    (row_idx:int64, group_id:int64, group_rep_idx:int64), where ``group_id``
    is the component's min row_idx and ``group_rep_idx`` the representative
    member per ``config.group_rep``.

    ``id_col``: when given AND the driver fast path is taken, the output
    additionally carries ``(id_col, group_rep_id)`` — the row's own id and
    the representative's id — so callers that only need id-level
    assignments skip two downstream shuffle joins (the rep hydration and
    the row hydration). The distributed (>``cc_driver_max_edges``) route
    ignores it and returns the 3-column schema; callers must check the
    output schema and fall back to joins (see pipelines/clipdedup.py).

    ``dedup_edges=True`` means the caller's edge list may contain duplicate
    (left, right) rows (e.g. a union of match + containment edges) that
    must be max-merged before weight sums. Below the driver-CC threshold
    that dedup is a numpy lexsort on the already-collected edges — callers
    should NOT pre-pay a distributed dedup shuffle for it (observed 18 s of
    a 70 s 1M-row flagship run); above the threshold the dedup runs as a
    bucketed shuffle here.
    """
    config = config or EngineConfig()
    if edges is None:
        edges, vocab = match_edges(ds, None, config, vocab, text_col)
    from ray.data.dataset import MaterializedDataset

    if not force_distributed and not isinstance(edges, MaterializedDataset):
        # Stream-collect attempt: the common flagship case ends on the
        # driver anyway (edge lists are orders of magnitude smaller than
        # the input), so consume the LAZY edge plan once, straight into
        # numpy — collection overlaps the chain's tail execution and the
        # materialize barrier + count pass + second block read all
        # disappear (~1 s of parallelism-independent wall at 1M rows).
        # Past the cap (the >cc_driver_max_edges route, where the driver
        # must not hold the edges) the partial collect is discarded and
        # the plan re-executes into the distributed path below — a
        # double-pay accepted because jobs at that edge volume run minutes
        # and take the distributed route's shuffles anyway.
        centroid_sim = config.group_rep == GROUP_REP_CENTROID
        # cap at the CONTRACTION threshold, not just the driver-CC one:
        # past it the existing spanning-forest/distributed logic is the
        # right route and the serial lexsort/UF on the collected arrays
        # would not be
        cap = min(config.cc_driver_max_edges, config.cc_contract_min_edges)
        parts_l, parts_r, parts_s = [], [], []
        n_seen = 0
        aborted = False
        for b in edges.iter_batches(batch_size=262_144, batch_format="pyarrow"):
            n_seen += len(b)
            if n_seen > cap:
                aborted = True
                break
            parts_l.append(b["left_idx"].to_numpy(zero_copy_only=False))
            parts_r.append(b["right_idx"].to_numpy(zero_copy_only=False))
            if centroid_sim:
                parts_s.append(b["similarity"].to_numpy(zero_copy_only=False))
        if not aborted:
            arrays = {
                "left_idx": np.concatenate(parts_l) if parts_l else np.empty(0, np.int64),
                "right_idx": np.concatenate(parts_r) if parts_r else np.empty(0, np.int64),
            }
            if centroid_sim:
                arrays["similarity"] = (
                    np.concatenate(parts_s) if parts_s else np.empty(0, np.float64)
                )
            return _driver_group_assignments(
                None, ds, config, dedup=dedup_edges, id_col=id_col,
                edge_arrays=arrays,
            )
        edges = edges.materialize()
    elif not isinstance(edges, MaterializedDataset):
        edges = edges.materialize()  # consumed twice (CC + centroid weights)
    n_edges = edges.count()
    driver_path = not force_distributed and n_edges <= config.cc_driver_max_edges
    if dedup_edges and not (driver_path and n_edges <= config.cc_contract_min_edges):
        # distributed (or contraction) route: weights aggregate the edge
        # dataset directly, so duplicates must be merged distributedly
        from ..functions.grouped import dedup_pairs

        edges = dedup_pairs(
            edges, ["left_idx", "right_idx"], agg_col="similarity"
        ).materialize()
        dedup_edges = False  # merged; driver path needs no second pass
    if driver_path:
        # thresholded edge lists are orders of magnitude smaller than the
        # input; below the driver-CC threshold the whole label → weight →
        # rep chain is a handful of numpy passes — skipping three shuffles
        # and two joins of the distributed path (which remains the >50M-edge
        # route below)
        return _driver_group_assignments(
            edges, ds, config, dedup=dedup_edges, id_col=id_col
        )
    labels = connected_components(edges, ds, config, force_distributed=force_distributed).materialize()

    if config.group_rep == GROUP_REP_CENTROID:
        # weighted degree per node: sum of similarities over its edges,
        # including the forced diagonal (string_grouper.py:875-881)
        from ..functions.grouped import groupby_agg

        weights = groupby_agg(
            edges, "left_idx", "similarity", "sum", out_col="weight"
        ).map_batches(
            lambda t: t.rename_columns(["row_idx", "weight"]),
            batch_format="pyarrow",
        )
        labeled = shuffle_join(
            labels, weights, on="row_idx", how="left",
            left_schema=pa.schema([("row_idx", pa.int64()), ("group_id", pa.int64())]),
            right_schema=pa.schema([("row_idx", pa.int64()), ("weight", pa.float64())]),
        )

        def fill_weight(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            w = pc.coalesce(
                t["weight"].cast(pa.float64()), pa.scalar(0.0, type=pa.float64())
            )
            return pa.table(
                {
                    "row_idx": t["row_idx"].cast(pa.int64()),
                    "group_id": t["group_id"].cast(pa.int64()),
                    "weight": w,
                }
            )

        labeled = labeled.map_batches(fill_weight, batch_format="pyarrow")
        maximize = True
    else:
        # group_rep='first': weight = the row's own position (string_grouper.py:871-873)
        def pos_weight(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "row_idx": t["row_idx"],
                    "group_id": t["group_id"],
                    "weight": t["row_idx"].cast(pa.float64()),
                }
            )

        labeled = labels.map_batches(pos_weight, batch_format="pyarrow")
        maximize = False

    def reps_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # argmax (centroid) / argmin (first) of weight; ties → lowest row_idx.
        # Weights are rounded to 9 decimals first: cliques of equally-similar
        # members produce weight sums that differ only by summation-order
        # float noise, and the rep choice must not depend on partitioning.
        df = df.assign(weight=df["weight"].round(9))
        df = df.sort_values(
            ["group_id", "weight", "row_idx"],
            ascending=[True, not maximize, True],
            kind="stable",
        )
        firsts = df.groupby("group_id", sort=False).head(1)
        return pd.DataFrame(
            {
                "group_id": firsts["group_id"].to_numpy(dtype=np.int64),
                "group_rep_idx": firsts["row_idx"].to_numpy(dtype=np.int64),
            }
        )

    from ..functions.grouped import bucketed_group_map

    reps = bucketed_group_map(labeled, ["group_id"], reps_bucket)
    out = shuffle_join(
        labels, reps, on="group_id", how="inner",
        left_schema=pa.schema([("row_idx", pa.int64()), ("group_id", pa.int64())]),
        right_schema=pa.schema([("group_id", pa.int64()), ("group_rep_idx", pa.int64())]),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "row_idx": t["row_idx"].cast(pa.int64()),
                "group_id": t["group_id"].cast(pa.int64()),
                "group_rep_idx": t["group_rep_idx"].cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def _driver_group_assignments(
    edges: Optional["ray.data.Dataset"],
    ds: "ray.data.Dataset",
    config: EngineConfig,
    dedup: bool = False,
    id_col: Optional[str] = None,
    edge_arrays: Optional[dict] = None,
) -> "ray.data.Dataset":
    """Driver fast path: labels, weights and representatives in one set of
    vectorized numpy passes over the collected edge list.

    Exact same semantics as the distributed path above — weights are the
    per-left-endpoint similarity sums over the *same* edge rows (mirrored +
    forced diagonal, see match_edges), rounded to 9 decimals before the
    argmax, ties to the lowest row_idx.
    """
    from ..functions.collect import collect_columns
    from ..stages.lsh import StageTimer
    from ..state.unionfind import _driver_union_find, spanning_forest_contract

    _tmark = StageTimer("groups")
    _tmark("start")
    centroid = config.group_rep == GROUP_REP_CENTROID
    if edge_arrays is not None:
        # caller stream-collected the lazy edge plan (capped at the
        # contraction threshold): no dataset passes, no contract branch
        n_edges = len(edge_arrays["left_idx"])
        contract = False
    else:
        n_edges = edges.count()
        contract = n_edges > config.cc_contract_min_edges
    if dedup and contract:
        # weights below aggregate `edges` distributedly — duplicates must be
        # merged there, not on the driver
        from ..functions.grouped import dedup_pairs

        edges = dedup_pairs(
            edges, ["left_idx", "right_idx"], agg_col="similarity"
        ).materialize()
        dedup = False
    if id_col is not None and ds.count() > config.ids_driver_max_rows:
        # the id strings (~40-64 B each) are NOT in the 16 B/edge budget
        # cc_driver_max_edges models — above this cutoff, skip the id
        # carry (the caller's schema probe falls back to the join route
        # for rep hydration) rather than risk a driver OOM on exactly the
        # memory-tight clusters for_cluster() protects
        id_col = None
    if id_col is not None:
        # single collection pass for (row_idx, id): ids stay Arrow end-to-end
        # (no per-value Python boxing of a million strings)
        idx_parts, id_chunks = [], []
        for b in ds.select_columns(["row_idx", id_col]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            idx_parts.append(
                b["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            id_chunks.extend(b[id_col].chunks)
        idx_all = (
            np.concatenate(idx_parts) if idx_parts else np.empty(0, dtype=np.int64)
        )
        order_ids = np.argsort(idx_all, kind="stable")
        node_ids = idx_all[order_ids]
        ids_sorted = pa.chunked_array(
            id_chunks or [pa.array([], type=pa.string())]
        ).take(pa.array(order_ids))
    else:
        ids_sorted = None
        node_ids = np.sort(
            collect_columns(ds, ["row_idx"])["row_idx"].astype(np.int64)
        )
    n = len(node_ids)
    _tmark("collect_nodes")

    if contract:
        # keep the serial driver work O(nodes): labels from the map-parallel
        # spanning-forest contraction, centroid weights from a distributed
        # partial-agg groupby — only O(nodes) rows ever reach the driver
        tree = collect_columns(
            spanning_forest_contract(edges), ["left_idx", "right_idx"]
        )
        l = tree["left_idx"].astype(np.int64)
        r = tree["right_idx"].astype(np.int64)
    else:
        if edge_arrays is not None:
            p = edge_arrays
        else:
            cols = ["left_idx", "right_idx"] + (["similarity"] if centroid else [])
            p = collect_columns(edges, cols)
        l = p["left_idx"].astype(np.int64)
        r = p["right_idx"].astype(np.int64)
        if dedup and len(l):
            # max-merge duplicate (left, right) rows — same semantics as
            # dedup_pairs(agg="max") but a numpy lexsort on the edges this
            # path collects anyway, instead of a distributed shuffle
            if centroid:
                sim = p["similarity"].astype(np.float64)
                order = np.lexsort((-sim, r, l))
            else:
                order = np.lexsort((r, l))
            ls, rs = l[order], r[order]
            keep = np.empty(len(ls), dtype=bool)
            keep[0] = True
            keep[1:] = (ls[1:] != ls[:-1]) | (rs[1:] != rs[:-1])
            l, r = ls[keep], rs[keep]
            if centroid:
                p = {"similarity": sim[order][keep]}
    _tmark("collect_edges")
    labels = _driver_union_find(l, r, node_ids)  # aligned with node_ids
    _tmark("union_find")

    if centroid:
        weight = np.zeros(n, dtype=np.float64)
        if contract:
            from ..functions.grouped import groupby_agg

            wcols = collect_columns(
                groupby_agg(edges, "left_idx", "similarity", "sum", out_col="weight"),
                ["left_idx", "weight"],
            )
            from ..state.unionfind import map_node_ids

            wl = wcols["left_idx"].astype(np.int64)
            li = map_node_ids(wl, node_ids)
            if len(li) and not bool((li >= 0).all()):
                raise ValueError(
                    "group weights reference edge endpoints missing from the "
                    "nodes dataset"
                )
            weight[li] = wcols["weight"].astype(np.float64)
        else:
            # node_ids is sorted; LUT-or-searchsorted mapping plus a
            # buffered bincount sum replace a third per-edge searchsorted
            # and an unbuffered np.add.at scatter (both ~seconds at the
            # 7.8M-edge group_part scale). bincount sums per bin instead
            # of in edge order — any last-ulp float difference is absorbed
            # by the 9-decimal round below (its existing purpose).
            from ..state.unionfind import map_node_ids

            li = map_node_ids(l, node_ids)
            if len(li) and not bool((li >= 0).all()):
                raise ValueError(
                    "group weights reference edge endpoints missing from "
                    "the nodes dataset"
                )
            weight = np.bincount(
                li, weights=p["similarity"].astype(np.float64), minlength=n
            )
        weight = np.round(weight, 9)
        weight_key = -weight  # argmax
    else:
        weight_key = node_ids.astype(np.float64)  # 'first': argmin row position

    order = np.lexsort((node_ids, weight_key, labels))
    g_sorted = labels[order]
    first_mask = np.empty(len(order), dtype=bool)
    first_mask[0:1] = True
    first_mask[1:] = g_sorted[1:] != g_sorted[:-1]
    rep_groups = g_sorted[first_mask]  # sorted ascending
    rep_nodes = node_ids[order][first_mask]
    group_rep = rep_nodes[np.searchsorted(rep_groups, labels)]

    cols = {
        "row_idx": pa.array(node_ids, type=pa.int64()),
        "group_id": pa.array(labels, type=pa.int64()),
        "group_rep_idx": pa.array(group_rep, type=pa.int64()),
    }
    if ids_sorted is not None:
        # node_ids is sorted, so rep positions come straight from searchsorted
        rep_pos = np.searchsorted(node_ids, group_rep)
        cols[id_col] = ids_sorted
        cols["group_rep_id"] = ids_sorted.take(pa.array(rep_pos))
    from ..functions.blocks import from_arrow_sliced

    return from_arrow_sliced(pa.table(cols))
