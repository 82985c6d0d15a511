"""Ports of the reference add_match / remove_match tests
(test_string_grouper.py:949-1044)."""

import pandas as pd
import pytest

from string_grouper_ray import RayStringGrouper


def test_add_match_raises_if_string_not_present():
    s1 = pd.Series(["foooo", "no match", "baz", "foooo"])
    s2 = pd.Series(["foooo", "bar", "baz", "foooob"])
    sg = RayStringGrouper(s1).fit()
    sg2 = RayStringGrouper(s1, s2).fit()
    for grouper in (sg, sg2):
        with pytest.raises(ValueError):
            grouper.add_match("doesnt exist", "baz")
        with pytest.raises(ValueError):
            grouper.add_match("baz", "doesnt exist")


def test_add_match_single_occurrence():
    s1 = pd.Series(["foooo", "no match", "baz", "foooo"])
    s2 = pd.Series(["foooo", "bar", "baz", "foooob"])
    sg = RayStringGrouper(s1).fit()
    sg.add_match("no match", "baz")
    matches = sg.get_matches()
    assert len(matches[(matches.left_side == "no match") & (matches.right_side == "baz")]) == 1
    sg2 = RayStringGrouper(s1, s2).fit()
    sg2.add_match("no match", "bar")
    matches = sg2.get_matches()
    assert len(matches[(matches.left_side == "no match") & (matches.right_side == "bar")]) == 1


def test_add_match_symmetric_for_self_join():
    s1 = pd.Series(["foooo", "no match", "baz", "foooo"])
    sg = RayStringGrouper(s1).fit()
    sg.add_match("no match", "baz")
    matches = sg.get_matches()
    assert len(matches[(matches.left_side == "no match") & (matches.right_side == "baz")]) == 1
    assert len(matches[(matches.left_side == "baz") & (matches.right_side == "no match")]) == 1


def test_add_match_multiple_occurrences():
    s1 = pd.Series(["foooo", "no match", "baz", "foooo"])
    s2 = pd.Series(["foooo", "bar", "baz", "foooob"])
    sg = RayStringGrouper(s1, s2).fit()
    sg.add_match("foooo", "baz")
    matches = sg.get_matches()
    assert len(matches[(matches.left_side == "foooo") & (matches.right_side == "baz")]) == 2


def test_remove_match():
    s1 = pd.Series(["foooo", "no match", "baz", "foooob"])
    s2 = pd.Series(["foooo", "bar", "baz", "foooob"])
    sg = RayStringGrouper(s1).fit()
    sg.remove_match("foooo", "foooob")
    matches = sg.get_matches()
    assert len(matches[(matches.left_side == "foooo") & (matches.right_side == "foooob")]) == 0
    assert len(matches[(matches.left_side == "foooob") & (matches.right_side == "foooo")]) == 0
    sg2 = RayStringGrouper(s1, s2).fit()
    sg2.remove_match("foooo", "foooob")
    matches = sg2.get_matches()
    assert len(matches[(matches.left_side == "foooo") & (matches.right_side == "foooob")]) == 0


def test_prior_matches_added_transitively():
    # test_string_grouper.py:1027-1044
    sample = ["microsoftoffice 365 home", "microsoftoffice 365 pers", "microsoft office"]
    df = pd.DataFrame(sample, columns=["name"])
    sg = RayStringGrouper(df["name"], ignore_index=True).fit()
    sg = sg.add_match("microsoft office", "microsoftoffice 365 home")
    sg = sg.add_match("microsoftoffice 365 pers", "microsoft office")
    deduped = sg.get_groups()
    assert deduped.nunique() == 1
