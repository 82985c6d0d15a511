"""Reference-compatible pandas API over the Ray Data pipelines.

This module reproduces the public surface of string_grouper —
``match_strings`` / ``match_most_similar`` / ``group_similar_strings`` /
``compute_pairwise_similarities`` and the ``StringGrouper`` class with
``fit`` / ``get_matches`` / ``get_groups`` / ``dot`` / ``add_match`` /
``remove_match`` / ``reset_data`` / ``update_options``
(``/root/reference/string_grouper/string_grouper.py:52-683``) — with
IDENTICAL output frames (column naming, ordering, index handling, dtype
restoration), but all similarity computation runs on Ray Data:

* corpus fit        → distributed doc-frequency aggregation (corpus.py)
* tf-idf + matmul   → map_batches actor pool over Arrow batches (match.py)
* clustering        → edge-list Dataset + union-find (cluster.py)
* nearest           → groupby top-1 on the edge Dataset (nearest.py)

Only the *small* artifacts live on the driver: the input Series (the user
handed us pandas), the thresholded edge list, and the assembled output —
mirroring the reference's own driver-resident ``_matches_list``
(``string_grouper.py:253-254``).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from .config import (
    DEFAULT_COLUMN_NAME,
    DEFAULT_ID_NAME,
    DEFAULT_MASTER_ID_NAME,
    DEFAULT_MASTER_NAME,
    GROUP_REP_CENTROID,
    GROUP_REP_PREFIX,
    LEFT_PREFIX,
    MOST_SIMILAR_PREFIX,
    RIGHT_PREFIX,
    EngineConfig,
)
from .corpus import fit_vocabulary
from .pipelines.cluster import group_assignments
from .pipelines.match import match_edges
from .pipelines.nearest import best_master_per_dupe
from .pipelines.pairwise import pairwise_similarities


class StringGrouperNotFitException(Exception):
    """Raised when a function that requires a fit grouper is called first."""


def _is_series_of_strings(series) -> bool:
    if not isinstance(series, pd.Series):
        return False
    return not series.map(lambda x: not isinstance(x, str)).any()


def _series_to_dataset(series: pd.Series, num_blocks: Optional[int] = None) -> "ray.data.Dataset":
    table = pa.table(
        {
            "row_idx": pa.array(np.arange(len(series), dtype=np.int64)),
            "text": pa.array(series.to_numpy(dtype=object), type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(table)
    if num_blocks and num_blocks > 1 and len(series) > 1:
        ds = ds.repartition(min(num_blocks, len(series)))
    return ds


class RayStringGrouper:
    """Drop-in equivalent of the reference ``StringGrouper`` class."""

    def __init__(
        self,
        master: pd.Series,
        duplicates: Optional[pd.Series] = None,
        master_id: Optional[pd.Series] = None,
        duplicates_id: Optional[pd.Series] = None,
        **kwargs,
    ):
        self.is_build = False
        # Optional explicit corpus reuse (our U4 extension): pass corpus=Vocabulary.
        # The reference refits its vectorizer on every fit()/dot()
        # (string_grouper.py:685-707), so by default we do too.
        self._vocab = kwargs.pop("corpus", None)
        self._explicit_vocab = self._vocab is not None
        self._config = _make_config(**kwargs)
        self._matches_list: pd.DataFrame = pd.DataFrame()
        self._true_max_n_matches: int = 0
        self._set_data(master, duplicates, master_id, duplicates_id)

    # -- data / options management -----------------------------------------

    def _set_data(self, master, duplicates=None, master_id=None, duplicates_id=None):
        if not _is_series_of_strings(master):
            raise TypeError("Master input does not consist of pandas.Series containing only Strings")
        if duplicates is not None and not _is_series_of_strings(duplicates):
            raise TypeError("Duplicates input does not consist of pandas.Series containing only Strings")
        if (duplicates is None and duplicates_id is not None) or (
            duplicates is not None and ((master_id is None) ^ (duplicates_id is None))
        ):
            raise Exception("List of data Series options is invalid")
        if master_id is not None and len(master) != len(master_id):
            raise Exception("Both master and master_id must be pandas.Series of the same length.")
        if duplicates is not None and duplicates_id is not None and len(duplicates) != len(duplicates_id):
            raise Exception("Both duplicates and duplicates_id must be pandas.Series of the same length.")
        self._master = master
        self._duplicates = duplicates
        self._master_id = master_id
        self._duplicates_id = duplicates_id
        self._validate_replace_na_and_drop()
        self.is_build = False

    def _validate_replace_na_and_drop(self):
        if self._config.replace_na and self._duplicates is not None:
            if self._master.index.nlevels != self._duplicates.index.nlevels:
                raise Exception(
                    "replace_na=True: Cannot replace NaN values of index-columns with the values "
                    "of another index if the number of index-levels does not equal the number of "
                    "index-columns."
                )

    def reset_data(self, master, duplicates=None, master_id=None, duplicates_id=None):
        """Swap the input Series while keeping the fitted corpus
        (reference ``string_grouper.py:310-323``)."""
        self._set_data(master, duplicates, master_id, duplicates_id)

    def clear_data(self):
        self._master = None
        self._duplicates = None
        self._master_id = None
        self._duplicates_id = None
        self._matches_list = None
        self.is_build = False

    def update_options(self, **kwargs):
        old = {f: getattr(self._config, f) for f in self._config.__dataclass_fields__}
        old.update(_map_kwargs(kwargs))
        self._config = EngineConfig(**old)
        self._validate_replace_na_and_drop()
        self.is_build = False

    @property
    def master(self):
        return self._master

    @property
    def duplicates(self):
        return self._duplicates

    # -- fitting ------------------------------------------------------------

    def n_grams(self, string: str):
        from .text import ngrams_of

        return ngrams_of(string, self._config)

    def fit_blocks(self) -> Optional[Tuple[int, int]]:
        """Map the reference n_blocks option onto Ray partitioning."""
        return self._config.n_blocks

    def fit(self) -> "RayStringGrouper":
        cfg = self._config
        self_join = self._duplicates is None
        # tiny inputs: run the stateful stages as stateless tasks (identical
        # semantics, no actor-pool spin-up per call)
        n_total = len(self._master) + (0 if self_join else len(self._duplicates))
        if n_total < 50_000 and cfg.use_actor_pools:
            cfg = cfg.with_options(use_actor_pools=False)
        n_blocks = cfg.n_blocks
        left_blocks = n_blocks[0] if n_blocks else None
        left_ds = _series_to_dataset(self._master, left_blocks)
        right_series = self._master if self_join else self._duplicates
        if n_blocks:
            # right block count → chunk size, like the reference's blockwise
            # right operand split (string_grouper.py:714-722)
            chunk = max(1, -(-len(right_series) // n_blocks[1]))
            cfg = cfg.with_options(right_chunk_rows=chunk)
        right_ds = None if self_join else _series_to_dataset(self._duplicates)

        raw_cfg = cfg.with_options(force_symmetries=False)
        if not self._explicit_vocab:
            self._vocab = fit_vocabulary(
                [left_ds] if self_join else [left_ds, right_ds], "text", cfg
            )
        edges_ds, _ = match_edges(left_ds, right_ds, raw_cfg, self._vocab, "text")
        raw = edges_ds.to_pandas()
        if raw.empty and "left_idx" not in raw.columns:
            # an all-empty edge Dataset loses its schema through to_pandas()
            raw = pd.DataFrame(
                {"left_idx": [], "right_idx": [], "similarity": []}
            )
        raw = raw.astype(
            {"left_idx": np.int64, "right_idx": np.int64, "similarity": np.float64}
        )
        self._true_max_n_matches = (
            int(raw.groupby("left_idx").size().max()) if len(raw) else 0
        )

        if self_join and cfg.force_symmetries:
            matches = self._symmetrize_driver(raw, len(self._master))
        else:
            matches = raw.sort_values(
                ["left_idx", "similarity", "right_idx"],
                ascending=[True, False, True],
                kind="stable",
            ).reset_index(drop=True)
        self._matches_list = pd.DataFrame(
            {
                "master_side": matches["left_idx"].to_numpy(dtype=np.int64),
                "dupe_side": matches["right_idx"].to_numpy(dtype=np.int64),
                "similarity": matches["similarity"].to_numpy(dtype=cfg.tfidf_matrix_dtype),
            }
        )
        self.is_build = True
        return self

    @staticmethod
    def _symmetrize_driver(raw: pd.DataFrame, n: int) -> pd.DataFrame:
        """Diagonal fix + symmetrization on the collected edge list.

        Exactly reproduces ``_fix_diagonal`` + ``_symmetrize_matrix``
        (``string_grouper.py:954-964``): the final value of (i, j) is the
        original (j, i) value when that direction existed, else the original
        (i, j) value; every diagonal forced to exactly 1.
        """
        off = raw[raw["left_idx"] != raw["right_idx"]]
        swapped = off.rename(columns={"left_idx": "right_idx", "right_idx": "left_idx"})[
            ["left_idx", "right_idx", "similarity"]
        ]
        sym = pd.concat([swapped, off], ignore_index=True).drop_duplicates(
            subset=["left_idx", "right_idx"], keep="first"
        )
        diag = pd.DataFrame(
            {
                "left_idx": np.arange(n, dtype=np.int64),
                "right_idx": np.arange(n, dtype=np.int64),
                "similarity": np.ones(n, dtype=np.float64),
            }
        )
        out = pd.concat([sym, diag], ignore_index=True)
        # CSR storage order after tolil→tocsr: ascending (row, col)
        return out.sort_values(["left_idx", "right_idx"], kind="stable").reset_index(drop=True)

    # -- pairwise -----------------------------------------------------------

    def dot(self) -> pd.Series:
        if len(self._master) != len(self._duplicates):
            raise Exception("To perform this function, both input Series must have the same length.")
        left_ds = _series_to_dataset(self._master)
        right_ds = _series_to_dataset(self._duplicates)
        vocab = self._vocab if self._explicit_vocab else None
        cfg = self._config
        if len(self._master) < 50_000 and cfg.use_actor_pools:
            cfg = cfg.with_options(use_actor_pools=False)
        out = pairwise_similarities(left_ds, right_ds, cfg, vocab, "text").to_pandas()
        out = out.sort_values("row_idx")
        return pd.Series(
            out["similarity"].to_numpy(dtype=np.float64), name="similarity", index=self._master.index
        )

    # -- outputs ------------------------------------------------------------

    def _check_fit(self, name: str):
        if not self.is_build:
            raise StringGrouperNotFitException(
                f'{name} was called before the "fit" function was called. Make sure to run fit '
                f"the StringGrouper first using StringGrouper.fit()"
            )

    def _get_non_matches_list(self) -> pd.DataFrame:
        """Zero-similarity completion (reference ``string_grouper.py:765-781``)."""
        m_sz = len(self._master)
        d_sz = len(self._master if self._duplicates is None else self._duplicates)
        if m_sz * d_sz > self._config.max_zero_pairs:
            raise Exception(
                f"Cannot return zero-similarity matches: the cartesian size {m_sz * d_sz} "
                f"exceeds max_zero_pairs={self._config.max_zero_pairs}."
            )
        all_pairs = pd.MultiIndex.from_product(
            [range(m_sz), range(d_sz)], names=["master_side", "dupe_side"]
        )
        matched = pd.MultiIndex.from_frame(self._matches_list[["master_side", "dupe_side"]])
        missing = all_pairs.difference(matched)
        if missing.empty:
            return pd.DataFrame()
        if self._config.max_n_matches is not None and self._config.max_n_matches < self._true_max_n_matches:
            raise Exception(
                f"\nERROR: Cannot return zero-similarity matches since \n"
                f"\t\t max_n_matches={self._config.max_n_matches} is too small!\n"
                f"\t\t Try setting max_n_matches={self._true_max_n_matches} (the \n"
                f"\t\t true maximum number of matches over all strings in master)\n"
                f"\t\t or greater or do not set this kwarg at all."
            )
        out = missing.to_frame(index=False)
        out["similarity"] = 0
        return out

    def get_matches(
        self, ignore_index: Optional[bool] = None, include_zeroes: Optional[bool] = None
    ) -> pd.DataFrame:
        self._check_fit("get_matches")
        cfg = self._config
        if ignore_index is None:
            ignore_index = cfg.ignore_index
        if include_zeroes is None:
            include_zeroes = cfg.include_zeroes
        if cfg.min_similarity > 0 or not include_zeroes:
            matches_list = self._matches_list
        else:
            non_matches = self._get_non_matches_list()
            matches_list = (
                self._matches_list
                if non_matches.empty
                else pd.concat([self._matches_list, non_matches], axis=0, ignore_index=True)
            )

        def hydrate(series: pd.Series, positions, default_name: str, drop_index: bool):
            s = series if series.name else series.rename(default_name)
            return s.iloc[positions].reset_index(drop=drop_index)

        def prefix(data, pfx: str):
            if isinstance(data, pd.DataFrame):
                return data.rename(columns={c: f"{pfx}{c}" for c in data.columns})
            return data.rename(f"{pfx}{data.name}")

        right_series = self._master if self._duplicates is None else self._duplicates
        left = hydrate(self._master, matches_list.master_side, DEFAULT_COLUMN_NAME, ignore_index)
        right = hydrate(right_series, matches_list.dupe_side, DEFAULT_COLUMN_NAME, ignore_index)
        if isinstance(right, pd.DataFrame):
            right = right[right.columns[::-1]]  # value column first, then index cols
        similarity = matches_list.similarity.reset_index(drop=True)
        if self._master_id is None:
            return pd.concat(
                [prefix(left, LEFT_PREFIX), similarity, prefix(right, RIGHT_PREFIX)], axis=1
            )
        right_id_series = self._master_id if self._duplicates is None else self._duplicates_id
        left_id = hydrate(self._master_id, matches_list.master_side, DEFAULT_ID_NAME, True)
        right_id = hydrate(right_id_series, matches_list.dupe_side, DEFAULT_ID_NAME, True)
        return pd.concat(
            [
                prefix(left, LEFT_PREFIX),
                prefix(left_id, LEFT_PREFIX),
                similarity,
                prefix(right_id, RIGHT_PREFIX),
                prefix(right, RIGHT_PREFIX),
            ],
            axis=1,
        )

    def get_groups(
        self, ignore_index: Optional[bool] = None, replace_na: Optional[bool] = None
    ) -> Union[pd.DataFrame, pd.Series]:
        self._check_fit("get_groups")
        if ignore_index is None:
            ignore_index = self._config.ignore_index
        if self._duplicates is None:
            return self._deduplicate(ignore_index)
        if replace_na is None:
            replace_na = self._config.replace_na
        return self._nearest(ignore_index, replace_na)

    # -- group_similar_strings output ---------------------------------------

    def _deduplicate(self, ignore_index: bool):
        edges_ds = ray.data.from_pandas(
            self._matches_list.rename(
                columns={"master_side": "left_idx", "dupe_side": "right_idx"}
            )
        )
        nodes_ds = _series_to_dataset(self._master)
        assign = group_assignments(
            nodes_ds, self._config, self._vocab, "text", edges=edges_ds
        ).to_pandas()
        assign = assign.sort_values("row_idx").reset_index(drop=True)
        reps = assign["group_rep_idx"].to_numpy(dtype=np.int64)

        pfx = GROUP_REP_PREFIX
        label = f"{pfx}{self._master.name}" if self._master.name else pfx[:-1]
        output = self._master.iloc[reps].rename(label).reset_index(drop=ignore_index)
        if isinstance(output, pd.DataFrame):
            output = output.rename(
                columns={c: f"{pfx}{c}" for c in output.columns if str(c) != label}
            )
        if self._master_id is not None:
            id_label = f"{pfx}{self._master_id.name if self._master_id.name else DEFAULT_ID_NAME}"
            output_id = self._master_id.iloc[reps].rename(id_label).reset_index(drop=True)
            output = pd.concat([output_id, output], axis=1)
        output.index = self._master.index
        return output

    # -- match_most_similar output -------------------------------------------

    def _nearest(self, ignore_index: bool, replace_na: bool):
        pfx = MOST_SIMILAR_PREFIX
        master_label = f"{pfx}{self._master.name if self._master.name else DEFAULT_MASTER_NAME}"
        master = self._master.rename(master_label).reset_index(drop=ignore_index)
        dupes = self._duplicates.rename("duplicates").reset_index(drop=ignore_index)
        if isinstance(dupes, pd.DataFrame):
            master = master.rename(
                columns={c: f"{pfx}{c}" for c in master.columns if str(c) != master_label}
            )
        if self._master_id is not None:
            master_id_label = f"{pfx}{self._master_id.name if self._master_id.name else DEFAULT_MASTER_ID_NAME}"
            master = pd.concat(
                [master, self._master_id.rename(master_id_label).reset_index(drop=True)], axis=1
            )
            dupes = pd.concat(
                [dupes, self._duplicates_id.rename("duplicates_id").reset_index(drop=True)], axis=1
            )

        # distributed per-dupe best pick (pipelines/nearest.py)
        if len(self._matches_list):
            edges_ds = ray.data.from_pandas(
                self._matches_list.rename(
                    columns={"master_side": "left_idx", "dupe_side": "right_idx"}
                )
            )
            best = best_master_per_dupe(edges_ds, self._config).to_pandas()
            best = best.rename(columns={"right_idx": "dupe_side", "best_left_idx": "master_side"})
            best = best[["dupe_side", "master_side"]]
        else:
            best = pd.DataFrame({"dupe_side": [], "master_side": []}, dtype=np.int64)

        if isinstance(master, pd.Series):
            master = master.to_frame()
        if isinstance(dupes, pd.Series):
            dupes = dupes.to_frame()
        merged = best.merge(dupes, left_on="dupe_side", right_index=True, how="outer")
        merged = merged.merge(master, left_on="master_side", right_index=True, how="left")

        rows_to_update = merged[master_label].isnull()
        merged.loc[rows_to_update, master_label] = merged[rows_to_update].duplicates
        if self._master_id is not None:
            merged.loc[rows_to_update, master_id_label] = merged[rows_to_update].duplicates_id
            if (
                merged[master_id_label].dtype != self._master_id.dtype
                and self._duplicates_id.dtype == self._master_id.dtype
            ):
                merged.loc[:, master_id_label] = merged.loc[:, master_id_label].astype(
                    self._master_id.dtype
                )

        required = [master_label] if self._master_id is None else [master_id_label, master_label]
        index_cols = [c for c in master.columns if c not in required]
        if replace_na:
            dupes_index_cols = [c for c in dupes.columns if str(c) not in ("duplicates", "duplicates_id")]
            merged.loc[rows_to_update, index_cols] = merged.loc[rows_to_update, dupes_index_cols].values
            for m, d in zip(index_cols, dupes_index_cols):
                if merged[m].dtype != master[m].dtype and dupes[d].dtype == master[m].dtype:
                    merged.loc[:, m] = merged.loc[:, m].astype(master[m].dtype)

        merged = merged.sort_values("dupe_side").set_index("dupe_side")
        output = merged[index_cols + required]
        output.index = self._duplicates.index
        return output.squeeze(axis=1)

    # -- interactive edge-list editing (U2) ----------------------------------

    def _get_indices_of(self, master_side: str, dupe_side: str):
        master_strings = self._master
        dupe_strings = self._master if self._duplicates is None else self._duplicates
        if not master_strings.isin([master_side]).any():
            raise ValueError(f"{master_side} not found in StringGrouper string series")
        if not dupe_strings.isin([dupe_side]).any():
            raise ValueError(f"{dupe_side} not found in StringGrouper dupe string series")
        master_indices = pd.Series(np.flatnonzero(master_strings.to_numpy(dtype=object) == master_side))
        dupe_indices = pd.Series(np.flatnonzero(dupe_strings.to_numpy(dtype=object) == dupe_side))
        return master_indices, dupe_indices

    def add_match(self, master_side: str, dupe_side: str) -> "RayStringGrouper":
        """Manually add an edge, pulling in transitive prior matches
        (reference ``string_grouper.py:646-666``)."""
        self._check_fit("add_match")
        master_indices, dupe_indices = self._get_indices_of(master_side, dupe_side)
        prior = self._matches_list.master_side[self._matches_list.dupe_side.isin(dupe_indices)]
        dupe_indices = pd.concat([dupe_indices, prior]).drop_duplicates()
        new = pd.DataFrame(
            [
                {"master_side": m, "dupe_side": d, "similarity": 1}
                for m in master_indices
                for d in dupe_indices
            ]
        )
        if self._duplicates is None:
            new = pd.concat(
                [
                    new,
                    pd.DataFrame(
                        {
                            "master_side": new.dupe_side,
                            "dupe_side": new.master_side,
                            "similarity": new.similarity,
                        }
                    ),
                ]
            )
        self._matches_list = pd.concat(
            [self._matches_list.drop_duplicates(), new], ignore_index=True
        )
        return self

    def remove_match(self, master_side: str, dupe_side: str) -> "RayStringGrouper":
        """Remove an edge (both directions for self-joins,
        reference ``string_grouper.py:668-683``)."""
        self._check_fit("remove_match")
        master_indices, dupe_indices = self._get_indices_of(master_side, dupe_side)
        if self._duplicates is None:
            master_indices = pd.concat([master_indices, dupe_indices])
            dupe_indices = master_indices
        ml = self._matches_list
        self._matches_list = ml[
            ~(ml.master_side.isin(master_indices) & ml.dupe_side.isin(dupe_indices))
        ]
        return self

    # -- corpus-reuse instance methods (U4) ----------------------------------

    def match_strings(self, master, duplicates=None, master_id=None, duplicates_id=None, **kwargs):
        self.reset_data(master, duplicates, master_id, duplicates_id)
        self.update_options(**kwargs)
        self.fit()
        return self.get_matches()

    def match_most_similar(self, master, duplicates, master_id=None, duplicates_id=None, **kwargs):
        self.reset_data(master, duplicates, master_id, duplicates_id)
        self.update_options(**kwargs)
        self.fit()
        return self.get_groups()

    def group_similar_strings(self, strings_to_group, string_ids=None, **kwargs):
        self.reset_data(strings_to_group, master_id=string_ids)
        self.update_options(**kwargs)
        self.fit()
        return self.get_groups()

    def compute_pairwise_similarities(self, string_series_1, string_series_2, **kwargs):
        self.reset_data(string_series_1, string_series_2)
        self.update_options(**kwargs)
        return self.dot()


def _map_kwargs(kwargs: dict) -> dict:
    return dict(kwargs)


def _make_config(**kwargs) -> EngineConfig:
    try:
        return EngineConfig(**_map_kwargs(kwargs))
    except TypeError as exc:
        raise Exception(f"Invalid StringGrouper option: {exc}") from exc


# -- high-level functions (reference string_grouper.py:52-153) ---------------


def compute_pairwise_similarities(string_series_1, string_series_2, **kwargs) -> pd.Series:
    return RayStringGrouper(string_series_1, string_series_2, **kwargs).dot()


def group_similar_strings(strings_to_group, string_ids=None, **kwargs):
    """Reference ``group_similar_strings`` (string_grouper.py:851-904).

    Known divergence from the reference: centroid group-rep weights are
    rounded to 9 decimals before the argmax so the choice is invariant to
    partitioning/summation order (pipelines/cluster.py). Groups whose true
    similarity sums differ by < 1e-9 — i.e. by float summation noise only —
    may therefore pick a different (equally central) representative than
    the reference's exact ``idxmax``. Sums that differ by more than 1e-9
    always agree with the reference.
    """
    sg = RayStringGrouper(strings_to_group, master_id=string_ids, **kwargs).fit()
    return sg.get_groups()


def match_most_similar(master, duplicates, master_id=None, duplicates_id=None, **kwargs):
    kwargs["max_n_matches"] = 1
    sg = RayStringGrouper(
        master, duplicates=duplicates, master_id=master_id, duplicates_id=duplicates_id, **kwargs
    ).fit()
    return sg.get_groups()


def match_strings(master, duplicates=None, master_id=None, duplicates_id=None, **kwargs) -> pd.DataFrame:
    sg = RayStringGrouper(
        master, duplicates=duplicates, master_id=master_id, duplicates_id=duplicates_id, **kwargs
    ).fit()
    return sg.get_matches()
