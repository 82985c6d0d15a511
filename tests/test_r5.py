"""Round-5 additions: automated kill/resume between the edges and groups
stages, cluster-resource route selection at mocked resources, the
id-carrying driver group output, and the Arrow-native aggregate/join
primitives."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from string_grouper_ray.config import EngineConfig


# ---------------------------------------------------------------------------
# kill/resume: a run that dies between `edges` and `groups` must resume with
# an `edges` checkpoint hit and recompute only `groups` (VERDICT r4 item 5 —
# the prior evidence was a manual job-kill in jobs/RUNLOG.md)
# ---------------------------------------------------------------------------


def test_checkpoint_kill_between_edges_and_groups(tmp_path, monkeypatch):
    from string_grouper_ray.pipelines import clipdedup as cd
    from string_grouper_ray.sources.synth import write_clip_table

    clip_dir = write_clip_table(
        300, str(tmp_path / "clips"), seed=7, with_audio=False
    )
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = EngineConfig(
        strategy="lsh", min_similarity=0.8, max_n_matches=None,
        use_actor_pools=False, checkpoint_dir=ckpt_dir,
        exact_dup_shortcircuit=True,
    )

    def poisoned(*a, **kw):
        raise RuntimeError("simulated kill during groups")

    # the poison stands in for a mid-job kill: edges completes and commits
    # its checkpoint, groups dies before writing anything
    monkeypatch.setattr(cd, "group_assignments", poisoned)
    with pytest.raises(RuntimeError, match="simulated kill"):
        cd.dedup_clip_table(clip_dir, config=cfg, hydrate_payload=False)
    assert os.path.exists(os.path.join(ckpt_dir, "edges", "_SUCCESS"))
    assert not os.path.exists(os.path.join(ckpt_dir, "groups", "_SUCCESS"))

    monkeypatch.undo()
    out = cd.dedup_clip_table(clip_dir, config=cfg, hydrate_payload=False)
    assert out.count() == 300

    events = [
        json.loads(line)
        for line in open(os.path.join(ckpt_dir, "lineage.jsonl"))
    ]
    # resumed run: edges was a checkpoint HIT (not recomputed), groups was
    # computed exactly once (by the resumed run)
    assert any(
        e["stage"] == "edges" and e["event"] == "resume_hit" for e in events
    )
    edge_computes = [
        e for e in events if e["stage"] == "edges" and e["event"] == "computed"
    ]
    group_computes = [
        e for e in events if e["stage"] == "groups" and e["event"] == "computed"
    ]
    assert len(edge_computes) == 1
    assert len(group_computes) == 1


# ---------------------------------------------------------------------------
# route selection from mocked cluster resources (VERDICT r4 item 3): the
# derived cutoffs must route a given job to join-mode verify on a small
# cluster and broadcast verify on a big one, without running either.
# ---------------------------------------------------------------------------


def _fake_nodes(store_bytes: int, mem_bytes: int, n_nodes: int = 2):
    nodes = []
    for i in range(n_nodes):
        res = {"object_store_memory": store_bytes, "memory": mem_bytes}
        if i == 0:
            res["node:__internal_head__"] = 1.0
        nodes.append({"Alive": True, "Resources": res})
    return nodes


def test_for_cluster_route_selection_mocked(monkeypatch):
    gib = 1 << 30
    # small cluster: 1 GiB object store per node, 4 GiB head memory
    monkeypatch.setattr(ray, "nodes", lambda: _fake_nodes(1 * gib, 4 * gib))
    small = EngineConfig.for_cluster()
    # big cluster: 32 GiB store, 96 GiB head memory
    monkeypatch.setattr(ray, "nodes", lambda: _fake_nodes(32 * gib, 96 * gib))
    big = EngineConfig.for_cluster()

    n_rows = 4_000_000
    # the 4M-row job routes join-mode on the small cluster, broadcast on the
    # big one — the decision the flagship makes at lsh.py use_broadcast
    assert n_rows > small.verify_broadcast_max_rows
    assert n_rows <= big.verify_broadcast_max_rows
    # exact-dup collapse: driver-route cutoff scales with the driver heap
    assert small.exactdup_driver_max_rows < big.exactdup_driver_max_rows
    assert small.exactdup_driver_max_rows == int(0.05 * 4 * gib / 16)
    # CC driver cutoff scales with driver memory, not cluster size
    assert big.cc_driver_max_edges == int(0.20 * 96 * gib / 16)
    # explicit overrides always win
    forced = EngineConfig.for_cluster(verify_broadcast_max_rows=123)
    assert forced.verify_broadcast_max_rows == 123


# ---------------------------------------------------------------------------
# id-carrying driver group output: the (clip_id, group_rep_id) columns added
# by group_assignments(id_col=...) must agree with the join-derived mapping
# ---------------------------------------------------------------------------


def test_group_assignments_id_col_parity():
    from string_grouper_ray.pipelines.cluster import group_assignments

    texts = (
        ["the quick brown fox jumps"] * 3
        + ["the quick brown fox jumped"]
        + ["completely different thing"]
        + ["another unrelated text"]
    )
    n = len(texts)
    ids = [f"clip-{i:03d}" for i in range(n)]
    ds = ray.data.from_pandas(
        pd.DataFrame({"row_idx": np.arange(n), "text": texts, "clip_id": ids})
    )
    cfg = EngineConfig(strategy="exact", min_similarity=0.8, use_actor_pools=False)
    out = group_assignments(ds, cfg, id_col="clip_id").to_pandas()
    assert {"row_idx", "group_id", "group_rep_idx", "clip_id", "group_rep_id"} <= set(
        out.columns
    )
    out = out.sort_values("row_idx").reset_index(drop=True)
    # own id column matches the input mapping
    assert out["clip_id"].tolist() == ids
    # rep id is the id of the rep row (join-equivalent, no join performed)
    idx_to_id = dict(zip(range(n), ids))
    assert out["group_rep_id"].tolist() == [
        idx_to_id[r] for r in out["group_rep_idx"].tolist()
    ]
    # baseline (no id_col): identical assignment columns
    base = (
        group_assignments(ds, cfg)
        .to_pandas()
        .sort_values("row_idx")
        .reset_index(drop=True)
    )
    assert base["group_id"].tolist() == out["group_id"].tolist()
    assert base["group_rep_idx"].tolist() == out["group_rep_idx"].tolist()


# ---------------------------------------------------------------------------
# Arrow-native primitives: groupby_agg and broadcast_join behavior pinned
# against an in-memory pandas reference
# ---------------------------------------------------------------------------


def test_groupby_agg_arrow_parity():
    from string_grouper_ray.functions.grouped import groupby_agg

    rng = np.random.default_rng(3)
    k = rng.integers(0, 50, size=5000)
    v = rng.random(5000)
    df = pd.DataFrame({"k": k, "v": v})
    ds = ray.data.from_pandas(df)

    for agg, ref in [
        ("sum", df.groupby("k")["v"].sum()),
        ("min", df.groupby("k")["v"].min()),
        ("max", df.groupby("k")["v"].max()),
    ]:
        got = (
            groupby_agg(ds, "k", "v", agg, out_col="o")
            .to_pandas()
            .set_index("k")["o"]
            .sort_index()
        )
        assert np.allclose(got.to_numpy(), ref.sort_index().to_numpy(), atol=1e-9)

    cnt = (
        groupby_agg(ds, "k", None, "count")
        .to_pandas()
        .set_index("k")["count()"]
        .sort_index()
    )
    assert cnt.to_numpy().tolist() == df.groupby("k").size().sort_index().tolist()


def test_dedup_edges_equals_prededuped():
    # the round-5 deferred symmetrize dedup relies on this: feeding
    # group_assignments(dedup_edges=True) an edge list WITH mirror/banding
    # duplicates must yield the same assignments and (centroid) reps as
    # feeding it the max-merged unique edges
    from string_grouper_ray.pipelines.cluster import group_assignments

    rng = np.random.default_rng(11)
    n = 60
    nodes = ray.data.from_pandas(
        pd.DataFrame({"row_idx": np.arange(n, dtype=np.int64),
                      "text": [f"t{i}" for i in range(n)]})
    )
    # random sparse graph + forced diagonal, then duplicate rows with
    # varying similarities (max must win)
    l = rng.integers(0, n, size=150)
    r = rng.integers(0, n, size=150)
    s = np.round(rng.uniform(0.5, 1.0, size=150), 3)
    l = np.concatenate([l, np.arange(n)])
    r = np.concatenate([r, np.arange(n)])
    s = np.concatenate([s, np.ones(n)])
    dup_sel = rng.integers(0, len(l), size=80)
    l2 = np.concatenate([l, l[dup_sel]])
    r2 = np.concatenate([r, r[dup_sel]])
    s2 = np.concatenate([s, np.maximum(0.5, s[dup_sel] - 0.1)])

    def edges_ds(a, b, c):
        return ray.data.from_arrow(pa.table({
            "left_idx": pa.array(a, type=pa.int64()),
            "right_idx": pa.array(b, type=pa.int64()),
            "similarity": pa.array(c, type=pa.float64()),
        }))

    # manual max-merge of the duplicated list
    order = np.lexsort((-s2, r2, l2))
    ls, rs, ss = l2[order], r2[order], s2[order]
    keep = np.empty(len(ls), dtype=bool)
    keep[0] = True
    keep[1:] = (ls[1:] != ls[:-1]) | (rs[1:] != rs[:-1])

    for rep_mode in ("centroid", "first"):
        cfg = EngineConfig(group_rep=rep_mode, use_actor_pools=False)
        a = (
            group_assignments(nodes, cfg, edges=edges_ds(l2, r2, s2),
                              dedup_edges=True)
            .to_pandas().sort_values("row_idx").reset_index(drop=True)
        )
        b = (
            group_assignments(nodes, cfg,
                              edges=edges_ds(ls[keep], rs[keep], ss[keep]),
                              dedup_edges=False)
            .to_pandas().sort_values("row_idx").reset_index(drop=True)
        )
        assert a["group_id"].tolist() == b["group_id"].tolist(), rep_mode
        assert a["group_rep_idx"].tolist() == b["group_rep_idx"].tolist(), rep_mode


def test_csv_source_through_match(tmp_path):
    # S3 in the SURVEY coverage table: CSV ingest (Ray built-in) feeding the
    # engine's match pipeline end-to-end
    import csv

    from string_grouper_ray.pipelines.match import match_edges

    p = tmp_path / "names.csv"
    rows = [
        ("c0", "Hyper Startup Inc."),
        ("c1", "Hyper Startup Incorporated"),
        ("c2", "Totally Different LLC"),
    ]
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["clip_id", "transcript"])
        w.writerows(rows)

    def project(t: pa.Table) -> pa.Table:
        # row identity from the DATA, not block position: Ray may split a
        # tiny CSV into one block per row with arbitrary order
        idx = np.array(
            [int(c[1:]) for c in t["clip_id"].to_pylist()], dtype=np.int64
        )
        return pa.table({"row_idx": pa.array(idx), "text": t["transcript"]})

    ds = ray.data.read_csv(str(p)).map_batches(project, batch_format="pyarrow")
    cfg = EngineConfig(strategy="exact", min_similarity=0.3, use_actor_pools=False)
    edges, _ = match_edges(ds, None, cfg)
    df = edges.to_pandas()
    pairs = set(zip(df["left_idx"], df["right_idx"]))
    assert (0, 1) in pairs and (1, 0) in pairs
    assert (0, 2) not in pairs and (2, 0) not in pairs


def test_stream_collect_abort_path_matches():
    # when the lazy edge plan exceeds the stream-collect cap, the partial
    # collect is discarded and the old materialize + contraction/driver
    # logic must produce identical assignments
    from string_grouper_ray.pipelines.cluster import group_assignments

    texts = (
        ["the quick brown fox jumps"] * 4
        + ["the quick brown fox jumped"] * 2
        + ["completely different thing", "another unrelated text"]
    )
    n = len(texts)
    ds = ray.data.from_pandas(
        pd.DataFrame({"row_idx": np.arange(n), "text": texts})
    )
    base = dict(strategy="exact", min_similarity=0.8, use_actor_pools=False)
    normal = (
        group_assignments(ds, EngineConfig(**base))
        .to_pandas().sort_values("row_idx").reset_index(drop=True)
    )
    # cap of 1 edge forces the abort on any non-trivial edge list; the
    # contraction threshold is equally tiny so the contract branch runs too
    tiny = EngineConfig(
        cc_contract_min_edges=1, cc_driver_max_edges=10_000, **base
    )
    aborted = (
        group_assignments(ds, tiny)
        .to_pandas().sort_values("row_idx").reset_index(drop=True)
    )
    assert normal["group_id"].tolist() == aborted["group_id"].tolist()
    assert normal["group_rep_idx"].tolist() == aborted["group_rep_idx"].tolist()


def test_decode_wav_batch_bit_identical():
    from string_grouper_ray.sources.audio import (
        decode_wav, decode_wav_batch, encode_wav,
    )

    rng = np.random.default_rng(5)
    bufs, codecs = [], []
    for n in (0, 1, 7, 400, 16001):
        bufs.append(encode_wav(rng.uniform(-1, 1, n), 16000))
        codecs.append("pcm_s16le")
    # non-canonical header: an extra LIST chunk between fmt and data must
    # route through the stdlib fallback, same output
    base = bufs[-1]
    extra = (
        base[:36]
        + b"LIST" + (4).to_bytes(4, "little") + b"INFO"
        + base[36:]
    )
    extra = b"RIFF" + (len(extra) - 8).to_bytes(4, "little") + extra[8:]
    bufs.append(extra)
    codecs.append("pcm_s16le")

    got, srs = decode_wav_batch(bufs, codecs)
    for b, c, g, sr in zip(bufs, codecs, got, srs):
        ref, ref_sr = decode_wav(b, c)
        assert sr == ref_sr
        assert np.array_equal(g, ref)
    # the codec stub still raises through the batch API
    with pytest.raises(NotImplementedError):
        decode_wav_batch([bufs[0]], ["opus"])


def test_broadcast_join_arrow():
    from string_grouper_ray.functions.joins import broadcast_join

    big = ray.data.from_pandas(
        pd.DataFrame({"key": [3, 1, 2, 9, 1], "x": [30, 10, 20, 90, 11]})
    )
    small = ray.data.from_pandas(
        pd.DataFrame({"k2": [1, 2, 2], "y": ["a", "b", "c"]})
    )
    # inner join: duplicate small-side keys expand rows — pin MULTIPLICITY
    # with a sorted list of tuples, not a set (a set collapses duplicates)
    inner = broadcast_join(big, small, on="key", right_on="k2", how="inner").to_pandas()
    assert sorted(zip(inner["key"], inner["x"], inner["y"])) == [
        (1, 10, "a"), (1, 11, "a"), (2, 20, "b"), (2, 20, "c")
    ]
    # left join: unmatched keys survive with null payload, left order kept
    # within each batch
    left = broadcast_join(big, small, on="key", right_on="k2", how="left").to_pandas()
    assert len(left) == 6  # 5 rows + one extra for key-2's duplicate match
    assert left[left["key"] == 3]["y"].isna().all()
    assert left[left["key"] == 9]["y"].isna().all()
    xs = left["x"].tolist()
    # left row order preserved per batch (single-block input here)
    assert [x for x in xs if x in (30, 10, 90)] == [30, 10, 90]
