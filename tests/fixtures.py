"""Shared fixtures mirroring the reference test suite's SimpleExample
(test_string_grouper.py:17-89)."""

import pandas as pd


def customers_df() -> pd.DataFrame:
    return pd.DataFrame(
        [
            ("BB016741P", "Mega Enterprises Corporation", "Address0", "Tel0", "Description0", 0.2),
            ("CC082744L", "Hyper Startup Incorporated", "", "Tel1", "", 0.5),
            ("AA098762D", "Hyper Startup Inc.", "Address2", "Tel2", "Description2", 0.3),
            ("BB099931J", "Hyper-Startup Inc.", "Address3", "Tel3", "Description3", 0.1),
            ("HH072982K", "Hyper Hyper Inc.", "Address4", "", "Description4", 0.9),
            ("EE059082Q", "Mega Enterprises Corp.", "Address5", "Tel5", "Description5", 1.0),
        ],
        columns=("Customer ID", "Customer Name", "Address", "Tel", "Description", "weight"),
    )


def customers_df2() -> pd.DataFrame:
    return pd.DataFrame(
        [
            ("BB016741P", "Mega Enterprises Corporation", "Address0", "Tel0", "Description0", 0.2),
            ("CC082744L", "Hyper Startup Incorporated", "", "Tel1", "", 0.5),
            ("AA098762D", "Hyper Startup Inc.", "Address2", "Tel2", "Description2", 0.3),
            ("BB099931J", "Hyper-Startup Inc.", "Address3", "Tel3", "Description3", 0.1),
            ("DD012339M", "HyperStartup Inc.", "Address4", "Tel4", "Description4", 0.1),
            ("HH072982K", "Hyper Hyper Inc.", "Address5", "", "Description5", 0.9),
            ("EE059082Q", "Mega Enterprises Corp.", "Address6", "Tel6", "Description6", 1.0),
        ],
        columns=("Customer ID", "Customer Name", "Address", "Tel", "Description", "weight"),
    )


def expected_result_centroid() -> pd.Series:
    return pd.Series(
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


def expected_result_centroid_with_index_col() -> pd.DataFrame:
    return pd.DataFrame(
        [
            (0, "Mega Enterprises Corporation"),
            (2, "Hyper Startup Inc."),
            (2, "Hyper Startup Inc."),
            (2, "Hyper Startup Inc."),
            (4, "Hyper Hyper Inc."),
            (0, "Mega Enterprises Corporation"),
        ],
        columns=["group_rep_index", "group_rep_Customer Name"],
    )


def expected_result_first() -> pd.Series:
    return pd.Series(
        [
            "Mega Enterprises Corporation",
            "Hyper Startup Incorporated",
            "Hyper Startup Incorporated",
            "Hyper Startup Incorporated",
            "Hyper Hyper Inc.",
            "Mega Enterprises Corporation",
        ],
        name="group_rep_Customer Name",
    )


def expected_result_with_zeroes() -> pd.DataFrame:
    return pd.DataFrame(
        [
            (1, "Hyper Startup Incorporated", 0.08170638, "whatever", 0),
            (0, "Mega Enterprises Corporation", 0.0, "whatever", 0),
            (2, "Hyper Startup Inc.", 0.0, "whatever", 0),
            (3, "Hyper-Startup Inc.", 0.0, "whatever", 0),
            (4, "Hyper Hyper Inc.", 0.0, "whatever", 0),
            (5, "Mega Enterprises Corp.", 0.0, "whatever", 0),
        ],
        columns=["left_index", "left_Customer Name", "similarity", "right_side", "right_index"],
    )
