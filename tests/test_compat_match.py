"""Ports of the reference match_strings / get_matches golden tests
(test_string_grouper.py:558-682,451-493)."""

import numpy as np
import pandas as pd
import pytest

from string_grouper_ray import (
    RayStringGrouper,
    StringGrouperNotFitException,
    match_strings,
)

from fixtures import customers_df, expected_result_with_zeroes


def test_get_matches_two_dataframes():
    sg = RayStringGrouper(pd.Series(["foo", "bar", "baz"]), pd.Series(["foo", "bar", "bop"])).fit()
    expected = pd.DataFrame(
        {
            "left_index": [0, 1],
            "left_side": ["foo", "bar"],
            "similarity": [1.0, 1.0],
            "right_side": ["foo", "bar"],
            "right_index": [0, 1],
        }
    )
    pd.testing.assert_frame_equal(expected, sg.get_matches())


def test_get_matches_single():
    sg = RayStringGrouper(pd.Series(["foo", "bar", "baz", "foo"])).fit()
    expected = pd.DataFrame(
        {
            "left_index": [0, 0, 1, 2, 3, 3],
            "left_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
            "similarity": [1.0] * 6,
            "right_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
            "right_index": [0, 3, 1, 2, 0, 3],
        }
    )
    pd.testing.assert_frame_equal(expected, sg.get_matches())


def test_get_matches_1_series_1_id_series():
    sg = RayStringGrouper(
        pd.Series(["foo", "bar", "baz", "foo"]), master_id=pd.Series(["A0", "A1", "A2", "A3"])
    ).fit()
    expected = pd.DataFrame(
        {
            "left_index": [0, 0, 1, 2, 3, 3],
            "left_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
            "left_id": ["A0", "A0", "A1", "A2", "A3", "A3"],
            "similarity": [1.0] * 6,
            "right_id": ["A0", "A3", "A1", "A2", "A0", "A3"],
            "right_side": ["foo", "foo", "bar", "baz", "foo", "foo"],
            "right_index": [0, 3, 1, 2, 0, 3],
        }
    )
    pd.testing.assert_frame_equal(expected, sg.get_matches())


def test_get_matches_2_series_2_id_series():
    sg = RayStringGrouper(
        pd.Series(["foo", "bar", "baz"]),
        pd.Series(["foo", "bar", "bop"]),
        duplicates_id=pd.Series(["B0", "B1", "B2"]),
        master_id=pd.Series(["A0", "A1", "A2"]),
    ).fit()
    expected = pd.DataFrame(
        {
            "left_index": [0, 1],
            "left_side": ["foo", "bar"],
            "left_id": ["A0", "A1"],
            "similarity": [1.0, 1.0],
            "right_id": ["B0", "B1"],
            "right_side": ["foo", "bar"],
            "right_index": [0, 1],
        }
    )
    pd.testing.assert_frame_equal(expected, sg.get_matches())


def test_case_insensitive_matches():
    sg = RayStringGrouper(pd.Series(["foo", "BAR", "baz"]), pd.Series(["FOO", "bar", "bop"])).fit()
    ml = sg._matches_list
    assert ml.master_side.tolist() == [0, 1]
    assert ml.dupe_side.tolist() == [0, 1]
    np.testing.assert_allclose(ml.similarity.to_numpy(), [1.0, 1.0])


def test_match_list_diagonal():
    # all self-joins must be present even with max_n_matches=1
    # (test_string_grouper.py:467-476)
    df = customers_df()["Customer Name"]
    matches = match_strings(df, max_n_matches=1)
    assert (matches["left_index"] == matches["right_index"]).sum() == len(df)


def test_zero_min_similarity():
    # test_string_grouper.py:478-485
    s_master = customers_df()["Customer Name"]
    matches = match_strings(s_master, pd.Series(["whatever"]), min_similarity=0)
    pd.testing.assert_frame_equal(expected_result_with_zeroes(), matches)


def test_zero_min_similarity_all_match_empty_non_matches():
    # test_string_grouper.py:487-493
    a_few = pd.Series(["BB016741P", "BB082744L", "BB098762D", "BB099931J", "BB072982K", "BB059082Q"])
    sg = RayStringGrouper(a_few, pd.Series(["BB0"]), max_n_matches=6, min_similarity=0).fit()
    assert sg._get_non_matches_list().empty


def test_not_fit_raises():
    sg = RayStringGrouper(pd.Series(["foo", "bar"]))
    with pytest.raises(StringGrouperNotFitException):
        sg.get_matches()
    with pytest.raises(StringGrouperNotFitException):
        sg.get_groups()


def test_type_errors():
    # test_string_grouper.py:1018-1025
    with pytest.raises(TypeError):
        RayStringGrouper("foo", "bar")
    with pytest.raises(TypeError):
        RayStringGrouper(pd.Series(["foo", "bar"]), pd.Series(["foo", 1]))
    with pytest.raises(TypeError):
        RayStringGrouper(pd.Series(["foo", np.nan]), pd.Series(["foo", "j"]))


def test_invalid_option_combinations():
    # test_string_grouper.py:653-682
    s1 = pd.Series(["foo", "bar", "baz"])
    s2 = pd.Series(["foo", "bar", "bop"])
    good_id1 = pd.Series(["A0", "A1", "A2"])
    good_id2 = pd.Series(["B0", "B1", "B2"])
    bad_id = pd.Series(["A0", "A1"])
    with pytest.raises(Exception):
        RayStringGrouper(s1, master_id=bad_id)
    with pytest.raises(Exception):
        RayStringGrouper(s1, duplicates=s2, duplicates_id=bad_id, master_id=good_id1)
    with pytest.raises(Exception):
        RayStringGrouper(s1, s2, master_id=good_id1)
    with pytest.raises(Exception):
        RayStringGrouper(s1, s2, duplicates_id=good_id2)
    with pytest.raises(Exception):
        RayStringGrouper(s1, duplicates_id=good_id2)
    with pytest.raises(Exception):
        RayStringGrouper(s1, master_id=good_id1, duplicates_id=good_id2)
    with pytest.raises(Exception):
        RayStringGrouper(s1, master_id=good_id1, ignore_index=True, replace_na=True)
    s2_mi = s2.copy()
    s2_mi.index = pd.MultiIndex.from_tuples(list(zip(list("ABC"), [0, 1, 2])))
    with pytest.raises(Exception):
        RayStringGrouper(s1, duplicates=s2_mi, replace_na=True)


def test_invalid_config_values():
    s1 = pd.Series(["foo", "bar"])
    with pytest.raises(Exception):
        match_strings(s1, group_rep="nonsense")
    with pytest.raises(Exception):
        match_strings(s1, tfidf_matrix_dtype=0)
    with pytest.raises(Exception):
        match_strings(s1, tfidf_matrix_dtype="whatever")
    with pytest.raises(Exception):
        match_strings(s1, n_blocks="whatever")
    with pytest.raises(Exception):
        match_strings(s1, n_blocks=(0, 2))
    with pytest.raises(Exception):
        match_strings(s1, n_blocks=(1, 2, 3))


def test_pairwise_compat():
    # test_string_grouper.py:364-385
    from string_grouper_ray import compute_pairwise_similarities

    df1 = customers_df()["Customer Name"]
    df2 = pd.Series(
        [
            "Mega Enterprises Corporation",
            "Hyper Startup Inc.",
            "Hyper Startup Inc.",
            "Hyper Startup Inc.",
            "Hyper Hyper Inc.",
            "Mega Enterprises Corporation",
        ],
        name="group_rep_Customer Name",
    )
    expected = pd.Series(
        [1.0, 0.6336195351561589, 1.0000000000000004, 1.0000000000000004, 1.0, 0.826462625999832],
        name="similarity",
    )
    sims = compute_pairwise_similarities(df1, df2)
    pd.testing.assert_series_equal(expected, sims)
    with pytest.raises(Exception):
        compute_pairwise_similarities(df1, df2[:-2])


def test_config_defaults_and_immutability():
    # reference StringGrouperConfigTest (test_string_grouper.py:92-116)
    from string_grouper_ray import StringGrouperConfig

    config = StringGrouperConfig()
    assert config.min_similarity == 0.8
    assert config.max_n_matches == 20
    assert config.regex == r"[,-./]|\s"
    assert config.ngram_size == 3
    assert config.ignore_case is True
    with pytest.raises(Exception):
        config.min_similarity = 0.1
    config2 = StringGrouperConfig(min_similarity=0.1, max_n_matches=100, number_of_processes=1)
    assert config2.min_similarity == 0.1
    assert config2.max_n_matches == 100
    assert config2.number_of_processes == 1


def test_zero_matches_all_entry_points():
    # Empty edge sets must not crash fit(): an all-empty edge Dataset loses
    # its schema through to_pandas() (regression: KeyError 'left_idx').
    # Reference semantics: match_strings -> empty frame with full columns,
    # match_most_similar -> each dupe falls back to itself.
    from string_grouper_ray import (
        compute_pairwise_similarities,
        group_similar_strings,
        match_most_similar,
    )

    master = pd.Series(["xxx yyy zzz"])
    dupes = pd.Series(["aaa bbb ccc"])

    ms = match_strings(master, dupes)
    assert len(ms) == 0
    assert list(ms.columns) == [
        "left_index", "left_side", "similarity", "right_side", "right_index",
    ]

    mm = match_most_similar(master, dupes)
    assert mm["most_similar_master"].tolist() == ["aaa bbb ccc"]

    gs = group_similar_strings(pd.Series(["xxx yyy", "aaa bbb"]))
    assert gs["group_rep"].tolist() == ["xxx yyy", "aaa bbb"]

    ps = compute_pairwise_similarities(master, dupes)
    assert ps.tolist() == [0.0]
