"""Containment pass (operator F4 in SURVEY.md §2.3; north_rule "suffix-array
substring pass catches exact contained duplicates that MinHash misses").

MinHash similarity degrades for containments: a short transcript fully
contained in a long one shares all its shingles, but Jaccard (and char
tf-idf cosine) drops with the length ratio, so truncations can fall below
the similarity threshold while still being duplicates.

Distributed formulation (no global suffix array, no global sort):

1. normalize transcripts (same normalizer as the match path, M1),
2. drop strings shorter than ``min_len`` (they can neither be an eligible
   contained prefix nor contain one),
3. hash-partition on the FIRST ``min_len`` NORMALIZED CHARS — any
   containment pair (p ⊑ s, |p| ≥ min_len) shares that prefix, so both
   endpoints land in the same bucket BY CONSTRUCTION,
4. per-bucket lexicographic sort + prefix-stack scan emits
   (contained ⊑ container) edges with similarity 1.0.

This is exact for prefix containment at any scale — it replaces an earlier
global-sort + boundary-strip design whose prefix ranges spanning 3+ sorted
blocks could lose cross-block edges. Mid-string substring containment is
left to the shingle-overlap candidates of the LSH path. Skew: a hot prefix
concentrates its group in one task; the scan there is O(k log k + output),
and the key can be lengthened via ``min_len`` if one prefix dominates.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..config import EngineConfig
from ..text import NGramTokenizer


class _Normalize:
    def __init__(self, config: EngineConfig, text_col: str):
        self.tokenizer = NGramTokenizer(config)
        self.text_col = text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        norm = [self.tokenizer.normalize(s) for s in texts]
        return pa.table({"row_idx": t["row_idx"], "norm": pa.array(norm, type=pa.string())})


def _prefix_scan(
    norms: List[str], rows: List[int], min_len: int, min_ratio: float = 0.6
) -> pd.DataFrame:
    """Sorted scan with a prefix stack: emit (contained_row, container_row).

    ``min_ratio`` requires the contained prefix to cover at least that
    fraction of the container — a short shared prefix (e.g. a common first
    word) is not a duplicate and would otherwise merge unrelated clusters.
    """
    out_l: List[int] = []
    out_r: List[int] = []
    stack: List[tuple] = []  # (norm, row)
    for s, r in zip(norms, rows):
        while stack and not s.startswith(stack[-1][0]):
            stack.pop()
        for pnorm, prow in stack:
            if (
                len(pnorm) >= min_len
                and len(s) > len(pnorm)
                and len(pnorm) >= min_ratio * len(s)
            ):
                out_l.append(min(prow, r))
                out_r.append(max(prow, r))
        stack.append((s, r))
    return pd.DataFrame(
        {
            "left_idx": np.asarray(out_l, dtype=np.int64),
            "right_idx": np.asarray(out_r, dtype=np.int64),
            "similarity": np.ones(len(out_l), dtype=np.float64),
        }
    )


def containment_edges(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    text_col: str = "text",
    min_len: int = 6,
    distinct: bool = False,
) -> "ray.data.Dataset":
    """Edges (left_idx, right_idx, similarity=1.0) for prefix containments.

    ``min_len`` ignores trivially-short prefixes (noise floor) and doubles
    as the co-location key length (see module docstring).

    ``distinct=True`` emits ONE edge per distinct (prefix-norm,
    container-norm) pair — between the min-row representative of each norm
    — instead of all copy×copy pairs. Connectivity-equivalent for
    clustering whenever exact-duplicate edges already join identical norms
    to a representative (the flagship's exact_dup_shortcircuit does), and
    it removes the k_prefix × k_container quadratic blowup when a popular
    transcript has popular truncations. Keep the default (all pairs) for
    the standalone containment operator whose contract is the full pair
    list.
    """
    config = config or EngineConfig()
    from ..functions.grouped import bucketed_group_map
    from ..functions.stagemap import stage_map_batches

    norm = stage_map_batches(
        ds, _Normalize, (config, text_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )

    def add_prefix_key(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eligible = t.filter(
            pc.greater_equal(pc.utf8_length(t["norm"]), pa.scalar(min_len))
        )
        return pa.table(
            {
                "row_idx": eligible["row_idx"],
                "norm": eligible["norm"],
                "pfx": pc.utf8_slice_codeunits(eligible["norm"], 0, min_len),
            }
        )

    keyed = norm.map_batches(add_prefix_key, batch_format="pyarrow")

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # one lexicographic scan over the whole bucket: strings of different
        # prefix groups can never start with one another, so the stack pops
        # naturally at group boundaries
        if distinct:
            df = df.groupby("norm", sort=False, as_index=False)["row_idx"].min()
        df = df.sort_values("norm", kind="stable")
        return _prefix_scan(df["norm"].tolist(), df["row_idx"].tolist(), min_len)

    return bucketed_group_map(keyed, ["pfx"], scan_bucket)


def substring_containment_edges(
    ds: "ray.data.Dataset",
    config: Optional[EngineConfig] = None,
    text_col: str = "text",
    min_len: int = 6,
    min_ratio: float = 0.6,
    max_doc_chars: int = 4096,
) -> "ray.data.Dataset":
    """Edges (left_idx, right_idx, similarity=1.0) for containment
    ANYWHERE: norm(A) appears as a substring of norm(B) — the full
    "suffix-array substring pass" of the north rule, strictly superset of
    the prefix pass (:func:`containment_edges` remains the cheap default
    the flagship uses; this operator is the completeness option).

    Distributed suffix-array formulation without a global array:
    A ⊑ B iff norm(A) is a PREFIX of some suffix of norm(B). Every doc
    emits (a) its full norm as a "needle" row and (b) all suffixes of
    length ≥ ``min_len`` as "container evidence" rows; rows co-locate by
    their first ``min_len`` chars (a needle and any suffix it prefixes
    share them by construction), and a per-bucket lexicographic scan with
    a needle stack emits containments — each (A, B) pair surfaces only in
    the needle's single bucket, so a per-bucket pair dedup is global.

    Cost bound (stated, not silent): suffix emission is O(len²/2) BYTES
    per doc — fine for transcript/title-length strings, quadratic for
    book-length ones. Docs longer than ``max_doc_chars`` emit only their
    full-norm (off=0) row — PREFIX containments into them are still found
    (this operator stays a strict superset of the prefix pass), only
    mid-string hits inside them are dropped, and a count is logged. At
    100×-scale you run this over exact-dup representatives, as the
    flagship does for every candidate stage.

    ``min_ratio``: as in the prefix pass, the contained norm must cover
    at least this fraction of the CONTAINER's full norm."""
    config = config or EngineConfig()
    from ..functions.grouped import bucketed_group_map
    from ..functions.stagemap import stage_map_batches

    norm = stage_map_batches(
        ds, _Normalize, (config, text_col), config,
        batch_format="pyarrow", batch_size=config.batch_size,
    )

    def explode(t: pa.Table) -> pa.Table:
        rows = t["row_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        norms = t["norm"].to_pylist()
        o_row, o_s, o_clen, o_kind = [], [], [], []
        skipped = 0
        for r, s in zip(rows.tolist(), norms):
            L = len(s)
            if L < min_len:
                continue
            o_row.append(r); o_s.append(s); o_clen.append(L); o_kind.append(0)
            if L > max_doc_chars:
                # over-cap containers still emit their off=0 row (O(L),
                # not O(L²)) so PREFIX containments are never lost — the
                # operator stays a strict superset of the prefix pass;
                # only mid-string hits inside over-cap docs are dropped
                skipped += 1
                o_row.append(r); o_s.append(s); o_clen.append(L); o_kind.append(1)
                continue
            for off in range(0, L - min_len + 1):
                o_row.append(r); o_s.append(s[off:])
                o_clen.append(L); o_kind.append(1)
        if skipped:
            print(
                f"substring_containment: {skipped} docs over "
                f"{max_doc_chars} chars emitted only their full-norm row "
                "(prefix containments kept, mid-string dropped)",
                flush=True,
            )
        return pa.table(
            {
                "row_idx": pa.array(np.asarray(o_row, dtype=np.int64)),
                "s": pa.array(o_s, type=pa.string()),
                "clen": pa.array(np.asarray(o_clen, dtype=np.int64)),
                "kind": pa.array(np.asarray(o_kind, dtype=np.int8)),
                "pfx": pa.array([x[:min_len] for x in o_s], type=pa.string()),
            }
        )

    keyed = norm.map_batches(explode, batch_format="pyarrow")

    def scan_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # needles sort BEFORE an equal suffix (kind 0 < 1) so a needle is
        # on the stack when its exact-match container evidence arrives
        df = df.sort_values(["s", "kind"], kind="stable")
        ss = df["s"].tolist()
        rr = df["row_idx"].to_numpy(dtype=np.int64)
        cl = df["clen"].to_numpy(dtype=np.int64)
        kk = df["kind"].to_numpy(dtype=np.int8)
        out: set = set()
        stack: List[tuple] = []  # (needle_norm, needle_row, needle_len)
        for s, r, c, k in zip(ss, rr.tolist(), cl.tolist(), kk.tolist()):
            while stack and not s.startswith(stack[-1][0]):
                stack.pop()
            if k == 0:
                stack.append((s, r, len(s)))
                continue
            for _nn, nrow, nlen in stack:
                if nrow != r and nlen < c and nlen >= min_ratio * c:
                    out.add((min(nrow, r), max(nrow, r)))
        if not out:
            return pd.DataFrame(
                {
                    "left_idx": np.empty(0, np.int64),
                    "right_idx": np.empty(0, np.int64),
                    "similarity": np.empty(0, np.float64),
                }
            )
        arr = np.asarray(sorted(out), dtype=np.int64)
        return pd.DataFrame(
            {
                "left_idx": arr[:, 0],
                "right_idx": arr[:, 1],
                "similarity": np.ones(len(arr), dtype=np.float64),
            }
        )

    return bucketed_group_map(keyed, ["pfx"], scan_bucket)
