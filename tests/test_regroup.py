"""Ports of the string_grouper_utils golden tests
(/root/reference/string_grouper_utils/test/test_string_grouper_utils.py)."""

import numpy as np
import pandas as pd
import pytest

from string_grouper_ray.regroup import (
    group_rep_by_weight_ds,
    new_group_rep_by_completeness,
    new_group_rep_by_earliest_timestamp,
    new_group_rep_by_highest_weight,
)


def customers_df():
    return pd.DataFrame(
        [
            ("BB016741P", "Mega Enterprises Corporation", "Address0", "Tel0", "Description0",
             0.2, "2014-12-30 10:55:00-02:00", "EE059082Q", "Mega Enterprises Corp."),
            ("CC082744L", "Hyper Startup Incorporated", "", "Tel1", "", 0.5,
             "2017-01-01 20:23:15-05:00", "BB099931J", "Hyper-Startup Inc."),
            ("AA098762D", "Hyper Startup Inc.", "Address2", "Tel2", "Description2", 0.3,
             "2020-10-20 15:29:30+02:00", "BB099931J", "Hyper-Startup Inc."),
            ("BB099931J", "Hyper-Startup Inc.", "Address3", "Tel3", "Description3", 0.1,
             "2013-07-01 03:34:45-05:00", "BB099931J", "Hyper-Startup Inc."),
            ("HH072982K", "Hyper Hyper Inc.", "Address4", "", "Description4", 0.9,
             "2005-09-11 11:56:00-07:00", "HH072982K", "Hyper Hyper Inc."),
            ("EE059082Q", "Mega Enterprises Corp.", "Address5", "Tel5", "Description5", 1.0,
             "1998-04-14 09:21:11+00:00", "EE059082Q", "Mega Enterprises Corp."),
        ],
        columns=("Customer ID", "Customer Name", "Address", "Tel", "Description",
                 "weight", "timestamp", "group ID", "group name"),
    )


def test_group_rep_by_timestamp_series():
    expected = pd.Series(
        ["EE059082Q", "BB099931J", "BB099931J", "BB099931J", "HH072982K", "EE059082Q"]
    )
    out = new_group_rep_by_earliest_timestamp(
        customers_df(), "group ID", "Customer ID", "timestamp"
    )
    pd.testing.assert_series_equal(expected, out)


def test_group_rep_by_timestamp_with_name():
    expected = pd.DataFrame(
        [
            ("EE059082Q", "Mega Enterprises Corp."),
            ("BB099931J", "Hyper-Startup Inc."),
            ("BB099931J", "Hyper-Startup Inc."),
            ("BB099931J", "Hyper-Startup Inc."),
            ("HH072982K", "Hyper Hyper Inc."),
            ("EE059082Q", "Mega Enterprises Corp."),
        ]
    )
    out = new_group_rep_by_earliest_timestamp(
        customers_df(), "group ID", "Customer ID", "timestamp", "Customer Name"
    )
    pd.testing.assert_frame_equal(expected, out)


def test_group_rep_by_timestamp_numbers_as_weights():
    # passing the numeric 'weight' column as timestamps → earliest = min weight
    expected = pd.DataFrame(
        [
            ("BB016741P", "Mega Enterprises Corporation"),
            ("BB099931J", "Hyper-Startup Inc."),
            ("BB099931J", "Hyper-Startup Inc."),
            ("BB099931J", "Hyper-Startup Inc."),
            ("HH072982K", "Hyper Hyper Inc."),
            ("BB016741P", "Mega Enterprises Corporation"),
        ]
    )
    out = new_group_rep_by_earliest_timestamp(
        customers_df(), "group ID", "Customer ID", "weight", "Customer Name"
    )
    pd.testing.assert_frame_equal(expected, out)


def test_group_rep_by_timestamp_length_mismatch():
    df = customers_df()
    with pytest.raises(Exception):
        new_group_rep_by_earliest_timestamp(
            df, "group ID", "Customer ID", df["timestamp"].iloc[:-1]
        )


def test_group_rep_by_timestamp_bad_strings():
    df = customers_df()
    bad = pd.Series(["not a date"] * len(df))
    with pytest.raises(Exception):
        new_group_rep_by_earliest_timestamp(df, "group ID", "Customer ID", bad)


def test_group_rep_by_weight():
    expected = pd.DataFrame(
        [
            ("EE059082Q", "Mega Enterprises Corp."),
            ("CC082744L", "Hyper Startup Incorporated"),
            ("CC082744L", "Hyper Startup Incorporated"),
            ("CC082744L", "Hyper Startup Incorporated"),
            ("HH072982K", "Hyper Hyper Inc."),
            ("EE059082Q", "Mega Enterprises Corp."),
        ]
    )
    out = new_group_rep_by_highest_weight(
        customers_df(), "group ID", "Customer ID", "weight", "Customer Name"
    )
    pd.testing.assert_frame_equal(expected, out)
    # Series input variant
    df = customers_df()
    out = new_group_rep_by_highest_weight(
        df, "group ID", "Customer ID", df["weight"], "Customer Name"
    )
    pd.testing.assert_frame_equal(expected, out)
    with pytest.raises(Exception):
        new_group_rep_by_highest_weight(
            df, "group ID", "Customer ID", df["weight"].iloc[:-1]
        )


def test_group_rep_by_completeness():
    expected = pd.DataFrame(
        [
            ("BB016741P", "Mega Enterprises Corporation"),
            ("AA098762D", "Hyper Startup Inc."),
            ("AA098762D", "Hyper Startup Inc."),
            ("AA098762D", "Hyper Startup Inc."),
            ("HH072982K", "Hyper Hyper Inc."),
            ("BB016741P", "Mega Enterprises Corporation"),
        ]
    )
    out = new_group_rep_by_completeness(
        customers_df(), "group ID", "Customer ID", "Customer Name",
        tested_cols=["Customer ID", "Customer Name", "Address", "Tel", "Description"],
    )
    pd.testing.assert_frame_equal(expected, out)
    df = customers_df()
    with pytest.raises(Exception):
        new_group_rep_by_completeness(
            df, "group ID", "Customer ID", "Customer Name", tested_cols=df.iloc[:-1]
        )


def test_group_rep_ds_variant():
    import ray.data

    df = customers_df().rename(
        columns={"group ID": "gid", "Customer ID": "cid", "weight": "w"}
    )[["gid", "cid", "w"]]
    ds = ray.data.from_pandas(df)
    out = group_rep_by_weight_ds(ds, "gid", "cid", "w", minimize=False).to_pandas()
    got = dict(zip(out["gid"], out["rep_cid"]))
    assert got == {
        "EE059082Q": "EE059082Q",
        "BB099931J": "CC082744L",
        "HH072982K": "HH072982K",
    }


def test_parse_timestamps_parserinfo_and_is_date():
    """parserinfo/kwargs forwarding (reference string_grouper_utils.py:139-155)
    and the is_date probe (ibid:157-171)."""
    from dateutil.parser import parserinfo

    from string_grouper_ray.regroup import is_date, parse_timestamps

    assert is_date("2016-11-30 00:00:00")
    assert not is_date("not a date at all zzz")

    # dayfirst via a custom parserinfo: 01/02/2020 -> Feb 1st
    ts = pd.Series(["01/02/2020", "03/04/2020"])
    got = parse_timestamps(ts, parserinfo(dayfirst=True))
    assert got.iloc[0].month == 2 and got.iloc[0].day == 1
    assert got.iloc[1].month == 4 and got.iloc[1].day == 3
    # kwargs form (dayfirst passed straight to dateutil.parser.parse)
    got2 = parse_timestamps(ts, dayfirst=True)
    assert got2.iloc[0].month == 2 and got2.iloc[1].day == 3

    with pytest.raises(ValueError):
        parse_timestamps(pd.Series(["01/02/2020", "zzz not a date"]), dayfirst=True)


def test_group_rep_by_timestamp_parserinfo():
    from dateutil.parser import parserinfo

    from string_grouper_ray.regroup import new_group_rep_by_earliest_timestamp

    df = pd.DataFrame(
        {
            "gid": ["a", "a", "b"],
            "cid": [1, 2, 3],
            "ts": ["02/01/2020", "01/03/2020", "05/05/2020"],
        }
    )
    # dayfirst: 02/01 = Jan 2nd, 01/03 = Mar 1st -> rep of group a is cid 1
    out = new_group_rep_by_earliest_timestamp(
        df, "gid", "cid", "ts", parserinfo=parserinfo(dayfirst=True)
    )
    assert out.tolist() == [1, 1, 3]
