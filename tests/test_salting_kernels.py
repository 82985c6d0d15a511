"""Pure-kernel regression tests for the r3 vectorizations: the
_SaltHotBuckets fast path, the reduceat memberset hash, and the dense gemm
branch of topn_multiply. All Ray-free (driver-side objects only)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from string_grouper_ray.sparse import CSRBatch, Postings, topn_multiply
from string_grouper_ray.stages.lsh import (
    _memberset_bucket,
    _mset_hash,
    _SaltHotBuckets,
)


def _salt_oracle(t: pa.Table, hot: dict) -> pa.Table:
    """The original per-row implementation of _SaltHotBuckets (r2), kept as
    the behavioral oracle for the vectorized fast path."""
    keys = t["band_key"].to_numpy(zero_copy_only=False)
    rows = t["row_idx"].to_numpy(zero_copy_only=False)
    sides = t["side"].to_numpy(zero_copy_only=False)
    out = {k: [] for k in ("band_key", "salt", "row_idx", "side", "chunk", "diag_sub")}
    for k, r, s in zip(keys.tolist(), rows.tolist(), sides.tolist()):
        n_chunks = hot.get(k)
        if n_chunks is None:
            vals = (k, 0, r, s, 0, True)
            for name, v in zip(out, vals):
                out[name].append(v)
        else:
            c = hash((r, k)) % n_chunks
            for j in range(n_chunks):
                lo, hi = (c, j) if c <= j else (j, c)
                vals = (k, lo * n_chunks + hi + 1, r, s, c, lo == hi)
                for name, v in zip(out, vals):
                    out[name].append(v)
    return pa.table(
        {
            "band_key": pa.array(out["band_key"], type=pa.int64()),
            "salt": pa.array(out["salt"], type=pa.int64()),
            "row_idx": pa.array(out["row_idx"], type=pa.int64()),
            "side": pa.array(out["side"], type=pa.int8()),
            "chunk": pa.array(out["chunk"], type=pa.int32()),
            "diag_sub": pa.array(out["diag_sub"], type=pa.bool_()),
        }
    )


def _sorted_rows(t: pa.Table):
    df = t.to_pandas().sort_values(list(t.column_names)).reset_index(drop=True)
    return df


def _mk_banded(keys, rows, sides):
    return pa.table(
        {
            "band_key": pa.array(keys, type=pa.int64()),
            "row_idx": pa.array(rows, type=pa.int64()),
            "side": pa.array(sides, type=pa.int8()),
        }
    )


def test_salt_hot_buckets_matches_per_row_oracle():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 12, size=400).tolist()
    rows = rng.integers(0, 1000, size=400).tolist()
    sides = rng.integers(0, 2, size=400).tolist()
    t = _mk_banded(keys, rows, sides)
    hot = {3: 4, 7: 2, 11: 3}  # three hot buckets with varying chunk counts
    got = _SaltHotBuckets(hot, max_bucket=10)(t)
    want = _salt_oracle(t, hot)
    pd.testing.assert_frame_equal(_sorted_rows(got), _sorted_rows(want))


def test_salt_hot_buckets_no_hot_fast_path():
    t = _mk_banded([1, 2, 2, 3], [10, 20, 30, 40], [0, 0, 1, 1])
    got = _SaltHotBuckets({}, max_bucket=10)(t)
    want = _salt_oracle(t, {})
    pd.testing.assert_frame_equal(_sorted_rows(got), _sorted_rows(want))
    # empty input
    got0 = _SaltHotBuckets({5: 3}, max_bucket=10)(t.slice(0, 0))
    assert len(got0) == 0
    assert got0.schema.names == got.schema.names


def test_memberset_mode0_hash_matches_single_group_form():
    # groups of varying sizes, all unsalted (mode 0)
    df = pd.DataFrame(
        {
            "band_key": [1, 1, 1, 2, 2, 5, 5, 5, 5],
            "salt": [0] * 9,
            "row_idx": [30, 10, 20, 7, 3, 100, 50, 75, 60],
            "side": np.zeros(9, dtype=np.int8),
            "chunk": np.zeros(9, dtype=np.int32),
            "diag_sub": np.ones(9, dtype=bool),
        }
    )
    out = _memberset_bucket(df)
    assert len(out) == 3
    for _, row in out.iterrows():
        members = np.frombuffer(row["l_members"], dtype=np.int64)
        assert (np.diff(members) > 0).all()  # sorted within group
        expect = _mset_hash(members, np.empty(0, dtype=np.int64), 0)
        assert int(row["mset_hash"]) == expect


def test_memberset_hash_distinguishes_multisets_and_modes():
    a = np.array([1, 1, 2], dtype=np.int64)
    b = np.array([1, 2, 2], dtype=np.int64)
    e = np.empty(0, dtype=np.int64)
    assert _mset_hash(a, e, 0) != _mset_hash(b, e, 0)
    assert _mset_hash(a, e, 0) != _mset_hash(a, e, 1)
    # lhs/rhs split position matters
    assert _mset_hash(np.array([1, 2], dtype=np.int64), np.array([3], dtype=np.int64), 1) != _mset_hash(
        np.array([1], dtype=np.int64), np.array([2, 3], dtype=np.int64), 1
    )


def _rand_csr(rng, n_rows, n_cols, nnz_per_row):
    ids, ws = [], []
    for _ in range(n_rows):
        k = int(rng.integers(1, nnz_per_row + 1))
        cols = np.sort(rng.choice(n_cols, size=k, replace=False)).astype(np.int32)
        w = rng.random(k)
        w = w / np.sqrt((w**2).sum())
        ids.append(cols)
        ws.append(w)
    return CSRBatch.from_lists(ids, ws, n_cols)


def test_topn_multiply_dense_equals_coo():
    rng = np.random.default_rng(11)
    left = _rand_csr(rng, 60, 37, 8)
    right_csr = _rand_csr(rng, 45, 37, 8)
    post = Postings.from_csr(right_csr, row_offset=100)
    for topn in (None, 3):
        for thr in (0.0, 0.4):
            l1, r1, s1 = topn_multiply(left, post, thr, topn, force_dense=False)
            l2, r2, s2 = topn_multiply(left, post, thr, topn, force_dense=True)
            o1 = np.lexsort((r1, l1))
            o2 = np.lexsort((r2, l2))
            assert np.array_equal(l1[o1], l2[o2])
            assert np.array_equal(r1[o1], r2[o2])
            np.testing.assert_allclose(s1[o1], s2[o2], rtol=0, atol=1e-12)
