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


def test_substring_containment_matches_bruteforce(ray_session):
    """substring_containment_edges == the brute strpos closure with the
    same length/ratio predicates, incl. mid-string hits the prefix pass
    misses, nested needles, exact suffix matches, and the max_doc_chars
    needle-only seam."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from string_grouper_ray.config import EngineConfig
    from string_grouper_ray.stages.suffixstage import (
        containment_edges,
        substring_containment_edges,
    )
    from string_grouper_ray.text import NGramTokenizer

    texts = [
        "Mega Hyper Global Acme Corp",          # 0: container
        "hyperglobalacme",                       # 1: MID-string of 0 (norm)
        "megahyperglobalacmecorp",               # 2: exact dup of 0's norm
        "global acme corp",                      # 3: SUFFIX of 0 (norm)
        "zebra stellar apex",                    # 4: unrelated
        "stellarapex",                           # 5: suffix of 4
        "acme",                                  # 6: too short vs ratio
        "x" * 50,                                # 7: long filler
        "x" * 40,                                # 8: substring of 7 (ratio 0.8)
    ]
    n = len(texts)
    cfg = EngineConfig(use_actor_pools=False, concurrency=2)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "row_idx": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    got = (
        substring_containment_edges(ds, cfg, "text", min_len=6)
        .to_pandas()[["left_idx", "right_idx"]]
        .apply(tuple, axis=1)
    )
    got = set(got)

    tok = NGramTokenizer(cfg)
    norms = [tok.normalize(s) for s in texts]
    expect = set()
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            na, nb = norms[a], norms[b]
            if (
                len(na) >= 6
                and len(nb) > len(na)
                and len(na) >= 0.6 * len(nb)
                and na in nb
            ):
                expect.add((min(a, b), max(a, b)))
    assert got == expect
    # the interesting cases actually occurred
    assert (0, 1) in expect   # mid-string
    assert (0, 3) in expect   # suffix
    assert (7, 8) in expect   # long-run repeat
    # and the prefix-only pass misses the mid-string hit
    pref = containment_edges(ds, cfg, "text", min_len=6).to_pandas()
    pref_pairs = set(zip(pref["left_idx"], pref["right_idx"]))
    assert (0, 1) not in pref_pairs
    assert got >= pref_pairs  # strict superset semantics

    # max_doc_chars: containers over the cap keep PREFIX containments
    # (off=0 row always emitted — strict superset of the prefix pass)
    # but drop mid-string hits inside them
    capped = (
        substring_containment_edges(ds, cfg, "text", min_len=6, max_doc_chars=30)
        .to_pandas()[["left_idx", "right_idx"]]
        .apply(tuple, axis=1)
    )
    capped = set(capped)

    def container_of(p):  # the longer norm is the container
        return p[0] if len(norms[p[0]]) > len(norms[p[1]]) else p[1]

    def contained_of(p):
        return p[0] if container_of(p) == p[1] else p[1]

    assert capped == {
        p
        for p in expect
        if len(norms[container_of(p)]) <= 30
        or norms[container_of(p)].startswith(norms[contained_of(p)])
    }
    assert (7, 8) in capped  # prefix containment into an over-cap doc kept
