"""Round-4 kernel regressions: Arrow-native memberset pair emission, the
vectorized shingle-Jaccard verify, and the packed-binary column flattener.
All Ray-free (pure driver-side kernels) except the knn guard test."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from string_grouper_ray.functions.packing import (
    pack_u64,
    unpack_binary_column,
)
from string_grouper_ray.pipelines.dedup import _ShingleJaccardVerify
from string_grouper_ray.stages.lsh import _PairsFromMembersets


def test_unpack_binary_column_roundtrip_and_slices():
    rng = np.random.default_rng(3)
    payloads = [rng.integers(0, 2**63, size=k).astype(np.uint64) for k in (0, 3, 1, 7, 0, 2)]
    col = pa.array([pack_u64(p) for p in payloads], type=pa.binary())
    flat, off = unpack_binary_column(col, np.uint64)
    assert len(off) == len(payloads) + 1
    for i, p in enumerate(payloads):
        np.testing.assert_array_equal(flat[off[i] : off[i + 1]], p)
    # sliced array (non-zero arrow offset) must still align
    sl = col.slice(2, 3)
    flat2, off2 = unpack_binary_column(sl, np.uint64)
    for i, p in enumerate(payloads[2:5]):
        np.testing.assert_array_equal(flat2[off2[i] : off2[i + 1]], p)
    # chunked input
    ch = pa.chunked_array([col.slice(0, 2), col.slice(2, 4)])
    flat3, off3 = unpack_binary_column(ch, np.uint64)
    np.testing.assert_array_equal(flat3, flat)
    np.testing.assert_array_equal(off3, off)
    # int8 payloads
    scol = pa.array([np.arange(k, dtype=np.int8).tobytes() for k in (2, 0, 5)])
    sflat, soff = unpack_binary_column(scol, np.int8)
    np.testing.assert_array_equal(sflat[soff[1] : soff[2]], np.empty(0, np.int8))
    np.testing.assert_array_equal(sflat[soff[2] : soff[3]], np.arange(5, dtype=np.int8))


def _mset_table(rows_list, mode_list, rhs_list=None, lsides=None, rsides=None):
    n = len(rows_list)
    rhs_list = rhs_list or [np.empty(0, np.int64)] * n
    lsides = lsides or [np.zeros(len(r), np.int8) for r in rows_list]
    rsides = rsides or [np.zeros(len(r), np.int8) for r in rhs_list]
    return pa.table(
        {
            "mset_hash": pa.array(np.arange(n, dtype=np.int64)),
            "l_members": pa.array(
                [np.asarray(r, np.int64).tobytes() for r in rows_list], type=pa.binary()
            ),
            "r_members": pa.array(
                [np.asarray(r, np.int64).tobytes() for r in rhs_list], type=pa.binary()
            ),
            "l_sides": pa.array(
                [np.asarray(s, np.int8).tobytes() for s in lsides], type=pa.binary()
            ),
            "r_sides": pa.array(
                [np.asarray(s, np.int8).tobytes() for s in rsides], type=pa.binary()
            ),
            "mode": pa.array(np.asarray(mode_list, np.int8), type=pa.int8()),
        }
    )


def _pairs_reference(rows_list, mode_list, rhs_list, lsides, rsides, cross, star):
    """Straight-line per-row re-derivation of the emission semantics."""
    pairs = set()

    def fin(a, b, sa, sb):
        if cross:
            if sa == sb:
                return
            pairs.add((a, b) if sa == 0 else (b, a))
        else:
            if a == b:
                return
            pairs.add((min(a, b), max(a, b)))

    for lhs, rhs, ls, rs, mode in zip(rows_list, rhs_list, lsides, rsides, mode_list):
        lhs = list(lhs)
        rhs = list(rhs)
        ls = list(ls)
        rs = list(rs)
        if mode == 0:
            if star and len(lhs) > 16:
                anchors = [0, len(lhs) - 1]
                for a in anchors:
                    for j in range(len(lhs)):
                        if j != a:
                            fin(lhs[a], lhs[j], ls[a], ls[j])
            else:
                for i in range(len(lhs)):
                    for j in range(i + 1, len(lhs)):
                        fin(lhs[i], lhs[j], ls[i], ls[j])
        else:
            allm = lhs + rhs
            alls = ls + rs
            if star:
                for a in {int(np.argmin(allm)), int(np.argmax(allm))}:
                    for j in range(len(allm)):
                        if j != a:
                            fin(allm[a], allm[j], alls[a], alls[j])
            else:
                for i in range(len(lhs)):
                    for j in range(len(rhs)):
                        fin(lhs[i], rhs[j], ls[i], rs[j])
    return pairs


def _emitted(table, cross, emission):
    out = _PairsFromMembersets(cross, emission)(table)
    return set(zip(out["left_idx"].to_pylist(), out["right_idx"].to_pylist()))


def test_pairs_from_membersets_arrow_matches_reference():
    rng = np.random.default_rng(11)
    rows_list, rhs_list, modes = [], [], []
    for _ in range(40):
        mode = int(rng.integers(0, 2))
        k = int(rng.integers(2, 25))
        lhs = np.sort(rng.choice(1000, size=k, replace=False)).astype(np.int64)
        if mode == 1:
            m = int(rng.integers(1, 10))
            rhs = np.sort(rng.choice(np.arange(1000, 1200), size=m, replace=False)).astype(np.int64)
        else:
            rhs = np.empty(0, np.int64)
        rows_list.append(lhs)
        rhs_list.append(rhs)
        modes.append(mode)
    lsides = [np.zeros(len(r), np.int8) for r in rows_list]
    rsides = [np.zeros(len(r), np.int8) for r in rhs_list]
    t = _mset_table(rows_list, modes, rhs_list, lsides, rsides)
    for emission in ("clique", "star"):
        got = _emitted(t, cross=False, emission=emission)
        want = _pairs_reference(
            rows_list, modes, rhs_list, lsides, rsides, cross=False,
            star=(emission == "star"),
        )
        assert got == want, emission
    # empty batch keeps the schema
    out0 = _PairsFromMembersets(False, "clique")(t.slice(0, 0))
    assert out0.column_names == ["left_idx", "right_idx"]
    assert len(out0) == 0


def test_pairs_from_membersets_cross_sides():
    rng = np.random.default_rng(5)
    rows_list, modes, lsides = [], [], []
    for _ in range(20):
        k = int(rng.integers(2, 12))
        lhs = np.sort(rng.choice(500, size=k, replace=False)).astype(np.int64)
        rows_list.append(lhs)
        modes.append(0)
        lsides.append(rng.integers(0, 2, size=k).astype(np.int8))
    rhs_list = [np.empty(0, np.int64)] * len(rows_list)
    rsides = [np.empty(0, np.int8)] * len(rows_list)
    t = _mset_table(rows_list, modes, rhs_list, lsides, rsides)
    got = _emitted(t, cross=True, emission="clique")
    want = _pairs_reference(rows_list, modes, rhs_list, lsides, rsides, True, False)
    assert got == want


def test_shingle_jaccard_verify_matches_naive():
    rng = np.random.default_rng(17)
    n = 200
    ls, rs, naive = [], [], np.empty(n)
    for i in range(n):
        ka, kb = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        a = np.unique(rng.integers(0, 40, size=ka).astype(np.uint64))
        b = np.unique(rng.integers(0, 40, size=kb).astype(np.uint64))
        ls.append(pack_u64(a))
        rs.append(pack_u64(b))
        if len(a) == 0 and len(b) == 0:
            naive[i] = 1.0
        else:
            inter = len(np.intersect1d(a, b, assume_unique=True))
            naive[i] = inter / (len(a) + len(b) - inter)
    t = pa.table(
        {
            "left_idx": pa.array(np.arange(n, dtype=np.int64)),
            "right_idx": pa.array(np.arange(n, dtype=np.int64) + 10_000),
            "l_sh": pa.array(ls, type=pa.binary()),
            "r_sh": pa.array(rs, type=pa.binary()),
        }
    )
    for thr in (0.0, 0.4, 0.9):
        out = _ShingleJaccardVerify(thr)(t)
        keep = naive >= thr
        assert len(out) == int(keep.sum())
        np.testing.assert_array_equal(
            out["left_idx"].to_numpy(), np.arange(n, dtype=np.int64)[keep]
        )
        np.testing.assert_allclose(out["similarity"].to_numpy(), naive[keep], atol=0, rtol=0)


def test_engine_config_for_cluster_derivation():
    """for_cluster derives broadcast/driver cutoffs from live cluster
    resources (smallest node's object store / driver memory) and explicit
    overrides always win."""
    import ray

    from string_grouper_ray.config import EngineConfig

    c = EngineConfig.for_cluster()
    assert ray.is_initialized()
    min_store = min(
        int(n["Resources"].get("object_store_memory", 0))
        for n in ray.nodes()
        if n.get("Alive")
    )
    assert 0 < c.verify_broadcast_max_rows <= 0.25 * min_store / 360
    assert 0 < c.rep_broadcast_max_rows == int(0.10 * min_store / 8)
    assert c.cc_driver_max_edges > 0
    c2 = EngineConfig.for_cluster(verify_broadcast_max_rows=7, strategy="lsh")
    assert c2.verify_broadcast_max_rows == 7 and c2.strategy == "lsh"


def test_knn_brute_force_query_guard():
    import ray.data

    from string_grouper_ray.pipelines.ann import knn_brute_force

    emb = pd.DataFrame(
        {"vec_id": np.arange(8), "embedding": [np.ones(4).tolist()] * 8}
    )
    ds = ray.data.from_pandas(emb)
    with pytest.raises(ValueError, match="query set has 8 rows"):
        knn_brute_force(ds, ds, k=2, max_query_rows=4)


def test_map_node_ids_dense_and_sparse_paths():
    from string_grouper_ray.state.unionfind import map_node_ids

    nodes = np.array([5, 8, 11, 14], dtype=np.int64)  # dense path (span 10)
    vals = np.array([11, 5, 14, 7, -3, 99], dtype=np.int64)
    got = map_node_ids(vals, nodes)
    assert got.tolist() == [2, 0, 3, -1, -1, -1]
    # sparse path (span >> 16x nodes): same answers through searchsorted
    sparse_nodes = nodes * 10**12
    got_sp = map_node_ids(vals * 10**12, sparse_nodes)
    assert got_sp.tolist() == [2, 0, 3, -1, -1, -1]
    assert map_node_ids(vals, np.empty(0, dtype=np.int64)).tolist() == [-1] * 6


def test_fanout_batch_bounds():
    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.functions.stagemap import fanout_batch

    cfg = EngineConfig(batch_size=4096)
    # big inputs keep the memory-sized default
    assert fanout_batch(10**8, cfg) == 4096
    # small inputs fan out but never below the vectorization floor
    assert fanout_batch(100, cfg) == 64
    small = fanout_batch(5000, cfg)
    assert 64 <= small < 4096
