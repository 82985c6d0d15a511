"""Post-hoc group-representative replacement (U3 in SURVEY.md §2.10) —
the capabilities of string_grouper_utils
(``/root/reference/string_grouper_utils/string_grouper_utils.py:11-127``):

* :func:`new_group_rep_by_earliest_timestamp` — oldest record per group
* :func:`new_group_rep_by_completeness`      — most filled-in record
* :func:`new_group_rep_by_highest_weight`    — largest weight

Each has (a) a pandas driver-side form with the reference's exact output
shape (record-id [+ record-name] Series/DataFrame aligned to the input
index), and (b) a Dataset form (``*_ds``) for grouped tables at scale —
one bucketed grouped-map, no driver materialization.
"""

from __future__ import annotations

from datetime import datetime
from numbers import Number
from typing import List, Optional, Union

import numpy as np
import pandas as pd

import ray
import ray.data

from .functions.grouped import bucketed_group_map


def _get_column(col, data: pd.DataFrame):
    if isinstance(col, str):
        return data.loc[:, col]
    if isinstance(col, int):
        return data.iloc[:, col]
    if isinstance(col, list):
        return pd.concat([_get_column(c, data) for c in col], axis=1)
    raise TypeError(f"invalid column selector: {col!r}")


def is_date(string: str, parserinfo=None, **kwargs) -> bool:
    """Whether ``string`` parses as a date (reference ``is_date``,
    string_grouper_utils.py:157-171). ``parserinfo``/kwargs are forwarded to
    ``dateutil.parser.parse``."""
    from dateutil.parser import parse

    try:
        parse(string, parserinfo, **kwargs)
        return True
    except (ValueError, OverflowError):
        return False


def parse_timestamps(timestamps: pd.Series, parserinfo=None, **kwargs) -> pd.Series:
    """str/Timestamp/datetime/Number → comparable weights (UTC for times).

    Mirrors ``parse_timestamps`` (string_grouper_utils.py:139-155).
    Without ``parserinfo``/kwargs the string path is vectorized pandas
    parsing (which wraps dateutil); with them it matches the reference
    per-element ``dateutil.parser.parse(x, parserinfo, **kwargs)`` exactly,
    gated by the same ``is_date`` probe.
    """
    if timestamps.map(lambda x: isinstance(x, str)).all():
        if parserinfo is not None or kwargs:
            from datetime import timezone

            from dateutil.parser import parse

            if not timestamps.map(lambda s: is_date(s, parserinfo, **kwargs)).all():
                raise ValueError(
                    "timestamps must be a Series of date-like or datetime-like "
                    "strings or datetime datatype or pandas Timestamp datatype "
                    "or numbers"
                )
            return timestamps.transform(
                lambda x: parse(x, parserinfo, **kwargs).astimezone(timezone.utc)
            )
        parsed = pd.to_datetime(timestamps, utc=True, format="mixed")
        if parsed.isna().any():
            raise ValueError(
                "timestamps must be a Series of date-like or datetime-like strings "
                "or datetime datatype or pandas Timestamp datatype or numbers"
            )
        return parsed
    if timestamps.map(lambda x: isinstance(x, (pd.Timestamp, datetime))).all():
        return pd.to_datetime(timestamps, utc=True)
    if timestamps.map(lambda x: isinstance(x, Number)).all():
        return timestamps
    raise ValueError(
        "timestamps must be a Series of date-like or datetime-like strings "
        "or datetime datatype or pandas Timestamp datatype or numbers"
    )


def _group_rep_transform(
    minimize: bool,
    weights: pd.Series,
    grouped_data: pd.DataFrame,
    group_col,
    record_id_col,
    record_name_col,
):
    """Reference ``group_rep_transform`` (string_grouper_utils.py:106-127):
    per group, pick the member with min/max weight (first occurrence wins on
    ties) and broadcast its id/name to every member."""
    stashed_index = grouped_data.index
    groups = _get_column(group_col, grouped_data).reset_index(drop=True)
    w = weights.reset_index(drop=True)
    frame = pd.DataFrame({"g": groups, "w": w, "pos": np.arange(len(groups))})
    # idxmin/idxmax pick the first occurrence of the extremum in row order
    method = "idxmin" if minimize else "idxmax"
    rep_pos = frame.groupby("g", sort=False)["w"].transform(method)
    ids = _get_column(record_id_col, grouped_data).reset_index(drop=True)
    new_rep = ids.iloc[rep_pos].reset_index(drop=True).rename(None)
    if record_name_col is None:
        output = new_rep
    else:
        names = _get_column(record_name_col, grouped_data).reset_index(drop=True)
        new_name = names.iloc[rep_pos].reset_index(drop=True).rename(None)
        output = pd.concat([new_rep, new_name], axis=1)
    output.index = stashed_index
    return output


def new_group_rep_by_earliest_timestamp(
    grouped_data: pd.DataFrame,
    group_col,
    record_id_col,
    timestamps,
    record_name_col=None,
    parserinfo=None,
    **kwargs,
):
    if isinstance(timestamps, pd.Series):
        if len(grouped_data) != len(timestamps):
            raise Exception(
                "Both grouped_data and timestamps must be pandas.Series of the same length."
            )
    else:
        timestamps = _get_column(timestamps, grouped_data)
    weights = parse_timestamps(timestamps, parserinfo, **kwargs)
    return _group_rep_transform(True, weights, grouped_data, group_col, record_id_col, record_name_col)


def new_group_rep_by_completeness(
    grouped_data: pd.DataFrame,
    group_col,
    record_id_col,
    record_name_col=None,
    tested_cols=None,
):
    if isinstance(tested_cols, pd.DataFrame):
        if len(grouped_data) != len(tested_cols):
            raise Exception(
                "Both grouped_data and tested_cols must be pandas.DataFrame of the same length."
            )
    elif tested_cols is not None:
        tested_cols = _get_column(tested_cols, grouped_data)
    else:
        tested_cols = grouped_data
    filled = tested_cols.map(lambda x: 0 if (x == "" or pd.isnull(x)) else 1)
    weights = filled.sum(axis=1)
    return _group_rep_transform(False, weights, grouped_data, group_col, record_id_col, record_name_col)


def new_group_rep_by_highest_weight(
    grouped_data: pd.DataFrame,
    group_col,
    record_id_col,
    weights,
    record_name_col=None,
):
    if isinstance(weights, pd.Series):
        if len(grouped_data) != len(weights):
            raise Exception(
                "Both grouped_data and weights must be pandas.Series of the same length."
            )
    else:
        weights = _get_column(weights, grouped_data)
    return _group_rep_transform(False, weights, grouped_data, group_col, record_id_col, record_name_col)


# ---------------------------------------------------------------------------
# Dataset-scale variant
# ---------------------------------------------------------------------------


def group_rep_by_weight_ds(
    ds: "ray.data.Dataset",
    group_col: str,
    record_id_col: str,
    weight_col: str,
    minimize: bool = False,
    tie_col: Optional[str] = None,
) -> "ray.data.Dataset":
    """(group, rep_record_id) per group at scale: one bucketed grouped-map.

    ``tie_col`` breaks weight ties (ascending); defaults to the record id.
    """
    tie = tie_col or record_id_col

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            [group_col, weight_col, tie], ascending=[True, minimize, True], kind="stable"
        )
        firsts = df.groupby(group_col, sort=False).head(1)
        return firsts[[group_col, record_id_col]].rename(
            columns={record_id_col: "rep_" + record_id_col}
        )

    return bucketed_group_map(ds, [group_col], pick)
