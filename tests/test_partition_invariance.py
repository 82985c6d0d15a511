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
