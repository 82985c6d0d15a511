"""Partition-count / blocking invariance — the distributed analogue of the
reference's n_blocks grid tests (test_string_grouper.py:191-336): the match
output must be identical no matter how the data is split."""

import pandas as pd
import pytest

from string_grouper_ray import RayStringGrouper, match_strings

from fixtures import customers_df2


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["left_index", "right_index"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def baseline():
    s = customers_df2()["Customer Name"]
    return _sorted(match_strings(s, min_similarity=0.1))


@pytest.mark.parametrize("n_blocks", [(1, 1), (1, 2), (2, 1), (2, 2), (3, 2), (1, 7)])
def test_self_join_n_blocks_invariance(baseline, n_blocks):
    s = customers_df2()["Customer Name"]
    out = _sorted(match_strings(s, min_similarity=0.1, n_blocks=n_blocks))
    pd.testing.assert_frame_equal(baseline, out)


@pytest.mark.parametrize("n_blocks", [(1, 1), (2, 2), (3, 2)])
def test_cross_join_n_blocks_invariance(n_blocks):
    m = customers_df2()["Customer Name"]
    d = customers_df2()["Customer Name"].iloc[::-1].reset_index(drop=True)
    base = _sorted(match_strings(m, d, min_similarity=0.1))
    out = _sorted(match_strings(m, d, min_similarity=0.1, n_blocks=n_blocks))
    pd.testing.assert_frame_equal(base, out)


def test_batch_size_invariance(baseline):
    s = customers_df2()["Customer Name"]
    out = _sorted(match_strings(s, min_similarity=0.1, batch_size=2))
    pd.testing.assert_frame_equal(baseline, out)


def test_shuffle_primitives_emit_arrow_blocks():
    """Regression guard for the round-2 shuffle collapse: grouped-map and
    join primitives must emit ARROW blocks (pandas blocks are pickled into
    the object store — no zero-copy — and a dataset mixing pandas and arrow
    blocks breaks repartition and slows downstream shuffles ~10×)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray
    import ray.data
    from string_grouper_ray.functions.grouped import (
        bucketed_group_map, dedup_pairs, groupby_agg, per_group_topk)
    from string_grouper_ray.functions.joins import shuffle_join

    def assert_arrow(ds, label):
        for ref in ds.materialize().to_arrow_refs():
            tbl = ray.get(ref)
            assert isinstance(tbl, pa.Table), f"{label}: non-arrow block {type(tbl)}"

    rng = np.random.RandomState(0)
    t = pa.table({
        "left_idx": pa.array(rng.randint(0, 50, 500).astype(np.int64)),
        "right_idx": pa.array(rng.randint(0, 50, 500).astype(np.int64)),
        "similarity": pa.array(rng.rand(500)),
    })
    ds = ray.data.from_arrow(t)
    assert_arrow(dedup_pairs(ds, ["left_idx", "right_idx"], agg_col="similarity"), "dedup_pairs")
    assert_arrow(groupby_agg(ds, "left_idx", "similarity", "sum", out_col="w"), "groupby_agg")
    assert_arrow(per_group_topk(ds, "left_idx", ["similarity"], [False], 3), "per_group_topk")
    assert_arrow(
        bucketed_group_map(ds, ["left_idx"], lambda df: df.head(1)), "bucketed_group_map"
    )
    right = pa.table({
        "rid": pa.array(np.arange(50, dtype=np.int64)),
        "val": pa.array([f"v{i}" for i in range(50)]),
    })
    joined = shuffle_join(
        ds, ray.data.from_arrow(right), on="left_idx", right_on="rid", how="inner",
        left_schema=t.schema, right_schema=right.schema,
    )
    assert_arrow(joined, "shuffle_join")
