"""Ports of the reference group_similar_strings / match_most_similar golden
tests (test_string_grouper.py:684-947)."""

import numpy as np
import pandas as pd
import pytest

from string_grouper_ray import (
    RayStringGrouper,
    group_similar_strings,
    match_most_similar,
)

from fixtures import (
    customers_df,
    expected_result_centroid,
    expected_result_centroid_with_index_col,
    expected_result_first,
)


def test_groups_centroid_default():
    pd.testing.assert_series_equal(
        expected_result_centroid(),
        group_similar_strings(customers_df()["Customer Name"], min_similarity=0.6, ignore_index=True),
    )


def test_groups_centroid_keep_index():
    pd.testing.assert_frame_equal(
        expected_result_centroid_with_index_col(),
        group_similar_strings(customers_df()["Customer Name"], min_similarity=0.6, ignore_index=False),
    )


def test_groups_first():
    pd.testing.assert_series_equal(
        expected_result_first(),
        group_similar_strings(
            customers_df()["Customer Name"], group_rep="first", min_similarity=0.6, ignore_index=True
        ),
    )


def test_groups_single_valued_series():
    pd.testing.assert_frame_equal(
        pd.DataFrame([(0, "hello")], columns=["group_rep_index", "group_rep"]),
        group_similar_strings(pd.Series(["hello"]), min_similarity=0.6),
    )
    pd.testing.assert_series_equal(
        pd.Series(["hello"], name="group_rep"),
        group_similar_strings(pd.Series(["hello"]), min_similarity=0.6, ignore_index=True),
    )
    pd.testing.assert_frame_equal(
        pd.DataFrame([(0, "hello")], columns=["most_similar_index", "most_similar_master"]),
        match_most_similar(pd.Series(["hello"]), pd.Series(["hello"]), min_similarity=0.6),
    )
    pd.testing.assert_series_equal(
        pd.Series(["hello"], name="most_similar_master"),
        match_most_similar(
            pd.Series(["hello"]), pd.Series(["hello"]), min_similarity=0.6, ignore_index=True
        ),
    )


def test_groups_single_df():
    sg = RayStringGrouper(pd.Series(["foooo", "bar", "baz", "foooob"]), ignore_index=True).fit()
    pd.testing.assert_series_equal(
        pd.Series(["foooo", "bar", "baz", "foooo"], name="group_rep"), sg.get_groups()
    )


def test_groups_1_string_series_1_id_series():
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "baz", "foooob"]),
        master_id=pd.Series(["A0", "A1", "A2", "A3"]),
        ignore_index=True,
    ).fit()
    expected = pd.DataFrame(
        list(zip(["A0", "A1", "A2", "A0"], ["foooo", "bar", "baz", "foooo"])),
        columns=["group_rep_id", "group_rep"],
    )
    pd.testing.assert_frame_equal(expected, sg.get_groups())


def test_groups_two_df():
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "baz"]),
        pd.Series(["foooo", "bar", "baz", "foooob"]),
        ignore_index=True,
    ).fit()
    expected = pd.Series(["foooo", "bar", "baz", "foooo"], name="most_similar_master")
    pd.testing.assert_series_equal(expected, sg.get_groups())
    # corpus-reuse instance method with explicit max_n_matches
    result = sg.match_most_similar(
        pd.Series(["foooo", "bar", "baz"]),
        pd.Series(["foooo", "bar", "baz", "foooob"]),
        max_n_matches=3,
    )
    pd.testing.assert_series_equal(expected, result)


def test_groups_2_string_series_2_id_series():
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "baz"]),
        pd.Series(["foooo", "bar", "baz", "foooob"]),
        master_id=pd.Series(["A0", "A1", "A2"]),
        duplicates_id=pd.Series(["B0", "B1", "B2", "B3"]),
        ignore_index=True,
    ).fit()
    expected = pd.DataFrame(
        list(zip(["A0", "A1", "A2", "A0"], ["foooo", "bar", "baz", "foooo"])),
        columns=["most_similar_master_id", "most_similar_master"],
    )
    pd.testing.assert_frame_equal(expected, sg.get_groups())


def test_groups_2_string_series_2_numeric_id_series_missing_master():
    # nullable Int64 id preservation (test_string_grouper.py:846-864)
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "foooo"]),
        pd.Series(["foooo", "bar", "baz", "foooob"]),
        master_id=pd.Series([0, 1, 2], dtype="Int64"),
        duplicates_id=pd.Series([100, 101, 102, 103], dtype="Int64"),
        ignore_index=True,
    ).fit()
    expected = pd.DataFrame(
        list(zip([0, 1, 102, 0], ["foooo", "bar", "baz", "foooo"])),
        columns=["most_similar_master_id", "most_similar_master"],
    ).astype(dtype={"most_similar_master_id": "Int64", "most_similar_master": "str"})
    pd.testing.assert_frame_equal(expected, sg.get_groups())


def test_groups_numeric_indexes_replace_na():
    # test_string_grouper.py:866-878
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "foooo"], index=pd.Index([0, 1, 2], dtype="Int64")),
        pd.Series(["foooo", "bar", "baz", "foooob"], index=pd.Index([100, 101, 102, 103], dtype="Int64")),
        replace_na=True,
    ).fit()
    expected = pd.DataFrame(
        list(zip([0, 1, 102, 0], ["foooo", "bar", "baz", "foooo"])),
        columns=["most_similar_index", "most_similar_master"],
        index=pd.Index([100, 101, 102, 103], dtype="Int64"),
    ).astype(dtype={"most_similar_index": "Int64", "most_similar_master": "str"})
    pd.testing.assert_frame_equal(expected, sg.get_groups())


def test_groups_two_df_same_similarity_tie_first():
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "baz", "foooo"]),
        pd.Series(["foooo", "bar", "baz", "foooob"]),
        ignore_index=True,
    ).fit()
    expected = pd.Series(["foooo", "bar", "baz", "foooo"], name="most_similar_master")
    pd.testing.assert_series_equal(expected, sg.get_groups())


def test_groups_4_df_same_similarity_with_ids():
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "baz", "foooo"]),
        pd.Series(["foooo", "bar", "baz", "foooob"]),
        master_id=pd.Series(["A0", "A1", "A2", "A3"]),
        duplicates_id=pd.Series(["B0", "B1", "B2", "B3"]),
        ignore_index=True,
    ).fit()
    expected = pd.DataFrame(
        list(zip(["A0", "A1", "A2", "A0"], ["foooo", "bar", "baz", "foooo"])),
        columns=["most_similar_master_id", "most_similar_master"],
    )
    pd.testing.assert_frame_equal(expected, sg.get_groups())


def test_groups_two_df_no_match_keeps_dupe():
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "baz"]),
        pd.Series(["foooo", "dooz", "bar", "baz", "foooob"]),
        ignore_index=True,
    ).fit()
    expected = pd.Series(["foooo", "dooz", "bar", "baz", "foooo"], name="most_similar_master")
    pd.testing.assert_series_equal(expected, sg.get_groups())


def test_groups_4_df_no_match_with_ids():
    sg = RayStringGrouper(
        pd.Series(["foooo", "bar", "baz"]),
        pd.Series(["foooo", "dooz", "bar", "baz", "foooob"]),
        master_id=pd.Series(["A0", "A1", "A2"]),
        duplicates_id=pd.Series(["B0", "B1", "B2", "B3", "B4"]),
        ignore_index=True,
    ).fit()
    expected = pd.DataFrame(
        list(zip(["A0", "B1", "A1", "A2", "A0"], ["foooo", "dooz", "bar", "baz", "foooo"])),
        columns=["most_similar_master_id", "most_similar_master"],
    )
    pd.testing.assert_frame_equal(expected, sg.get_groups())


def test_group_rep_bad_option():
    with pytest.raises(Exception):
        group_similar_strings(customers_df()["Customer Name"], group_rep="nonsense", min_similarity=0.6)
