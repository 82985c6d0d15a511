"""Tests for the training-data operators: dedup family, ANN, text stats,
containment, checkpoint/resume, distributed CC equivalence."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from string_grouper_ray.config import EngineConfig

CFG = EngineConfig(use_actor_pools=False)


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    )


def test_exact_dedup():
    from string_grouper_ray.pipelines.dedup import exact_dedup

    ds = _docs(["a", "b", "a", "c", "b", "a"])
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert dict(zip(out["text"], out["doc_id"])) == {"a": 0, "b": 1, "c": 3}


def test_minhash_dedup_clusters_near_dups():
    from string_grouper_ray.pipelines.dedup import minhash_dedup

    texts = (
        ["the quick brown fox jumps over the lazy dog again and again"] * 3
        + ["a completely different document about quantum computing hardware"] * 2
        + ["yet another unrelated text on medieval history of europe"]
    )
    out = minhash_dedup(_docs(texts), jaccard_threshold=0.7, config=CFG).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["cluster_id"].tolist() == [0, 0, 0, 3, 3, 5]
    assert out["keep"].tolist() == [True, False, False, True, False, True]


def test_nearest_join_unmatched_keep_self_across_fragmented_blocks():
    """Regression: pyarrow 16.1's pc.coalesce misaligns values when its two
    ChunkedArray args have different chunk layouts (a cast can collapse one
    side to a single chunk while the sibling column keeps the block's concat
    chunks). In nearest_join that silently rewrote unmatched dupes'
    most_similar_idx to OTHER rows' ids — caught by the sf0.001 oracle.
    Fragment the inputs into many 1-row blocks so finish() sees multi-chunk
    blocks, with most dupes unmatched."""
    from string_grouper_ray.pipelines.match import match_edges
    from string_grouper_ray.pipelines.nearest import nearest_join

    masters = ["alpha beta gamma", "delta epsilon zeta"]
    dupes = ["alpha beta gamma!", "unrelated text one", "different words two",
             "nothing like them", "far far away", "completely else"]

    def frag(texts, base):
        parts = [
            ray.data.from_arrow(pa.table({
                "row_idx": pa.array([base + i], type=pa.int64()),
                "text": pa.array([t], type=pa.string()),
            }))
            for i, t in enumerate(texts)
        ]
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    m_ds, d_ds = frag(masters, 0), frag(dupes, 100)
    cfg = CFG.with_options(min_similarity=0.8, max_n_matches=None,
                           force_symmetries=False)
    edges, _ = match_edges(m_ds, d_ds, cfg)
    out = nearest_join(d_ds, m_ds, edges, cfg).to_pandas().sort_values("row_idx")
    unmatched = out[~out["matched"]]
    assert (unmatched["most_similar_idx"] == unmatched["row_idx"]).all()
    matched = out[out["matched"]]
    assert matched["most_similar_idx"].isin([0, 1]).all()


def test_minhash_prod_recall_precision_vs_exact():
    """Quantitative gate for the PRODUCTION MinHash config (32 bands × 4
    rows) on a fixture that deliberately contains GRAY-ZONE pairs (true
    Jaccard just above the 0.7 threshold, where the banding S-curve is
    weakest): same-cluster pair recall ≥ 0.99 against the exact-Jaccard
    cluster closure, and precision EXACTLY 1 (structural — every emitted
    edge passes the true-Jaccard verify, so prod clusters refine the exact
    closure). This is the borderline-behavior evidence behind giving
    dedup_minhash_docs_prod the exact-closure oracle in __ray_entry__.py."""
    import itertools

    from string_grouper_ray.pipelines.dedup import minhash_dedup
    from string_grouper_ray.text import NGramTokenizer

    rng = np.random.RandomState(7)
    words = [f"tok{w:03d}" for w in range(400)]
    texts = []
    n_clusters = 50
    for c in range(n_clusters):
        base = [words[i] for i in rng.choice(400, size=24, replace=False)]
        texts.append(" ".join(base))
        for _ in range(rng.randint(1, 4)):
            # replace 1-4 of 24 tokens: char-3gram Jaccard lands ~0.70-0.95,
            # i.e. squarely in and above the gray zone
            variant = list(base)
            for j in rng.choice(24, size=rng.randint(1, 5), replace=False):
                variant[j] = words[rng.randint(0, 400)]
            texts.append(" ".join(variant))
    texts += [" ".join(words[i] for i in rng.choice(400, size=10, replace=False))
              for _ in range(40)]

    # exact ground truth: true Jaccard of distinct normalized 3-gram sets
    tok = NGramTokenizer(CFG)
    shingles = [set(s.tolist()) for s in tok.shingle_hashes_batch(texts)]
    exact_edges = []
    for i, j in itertools.combinations(range(len(texts)), 2):
        inter = len(shingles[i] & shingles[j])
        union = len(shingles[i] | shingles[j])
        if union and inter / union >= 0.7:
            exact_edges.append((i, j))
    assert len(exact_edges) >= 40, "fixture must actually have near-dup pairs"

    # exact closure → same-cluster pair set
    parent = list(range(len(texts)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in exact_edges:
        parent[find(i)] = find(j)
    from collections import defaultdict

    exact_groups = defaultdict(list)
    for i in range(len(texts)):
        exact_groups[find(i)].append(i)
    p_exact = {
        p for members in exact_groups.values() for p in itertools.combinations(sorted(members), 2)
    }

    out = minhash_dedup(_docs(texts), jaccard_threshold=0.7, config=CFG).to_pandas()
    prod_groups = defaultdict(list)
    for d, c in zip(out["doc_id"], out["cluster_id"]):
        prod_groups[c].append(int(d))
    p_prod = {
        p for members in prod_groups.values() for p in itertools.combinations(sorted(members), 2)
    }

    assert p_prod <= p_exact, "precision must be structural (verify gate)"
    recall = len(p_prod & p_exact) / len(p_exact)
    assert recall >= 0.99, f"prod-config pair recall {recall:.4f} < 0.99 ({len(p_exact)} pairs)"


def test_minhash_dedup_band_match_prefilter_equivalent():
    """The exact-recall gate config (lsh_bands=num_perm) with the
    band-match prefilter must produce the same clusters as without it —
    the prefilter only drops pairs whose estimated Jaccard is far below
    the verify threshold (P[drop a true pair] ~ 1e-13)."""
    from string_grouper_ray.pipelines.dedup import minhash_dedup

    texts = (
        ["the quick brown fox jumps over the lazy dog again and again"] * 3
        + ["the quick brown fox jumps over the lazy dog again & again!!"]
        + ["a completely different document about quantum computing hardware"] * 2
        + ["yet another unrelated text on medieval history of europe"]
    )
    cfg = CFG.with_options(lsh_bands=128)
    base = minhash_dedup(_docs(texts), jaccard_threshold=0.7, config=cfg)
    pre = minhash_dedup(
        _docs(texts), jaccard_threshold=0.7, config=cfg,
        prefilter_min_band_matches=52,
    )
    a = base.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pre.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a["cluster_id"].tolist() == b["cluster_id"].tolist()
    assert a["keep"].tolist() == b["keep"].tolist()
    assert a["cluster_id"].nunique() >= 3  # fixture actually clusters


def test_simhash_dedup():
    from string_grouper_ray.pipelines.dedup import simhash_dedup

    texts = ["identical text block one two three four five six"] * 3 + [
        "something else entirely different here with other words"
    ]
    out = simhash_dedup(_docs(texts), config=CFG).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].tolist() == [0, 0, 0, 3]


def test_simhash_dedup_hot_bucket_identical_cluster():
    """A 5k-row identical-text cluster lands every row in the same simhash
    bucket (way past the old 2000-row guard that silently dropped all pairs);
    the exact-dup collapse must still fully dedup it."""
    from string_grouper_ray.pipelines.dedup import simhash_dedup

    texts = ["the very same repeated document text goes here"] * 5000 + [
        "an unrelated singleton document with different content entirely"
    ]
    out = simhash_dedup(_docs(texts), config=CFG).to_pandas().sort_values("doc_id")
    assert out["cluster_id"].tolist() == [0] * 5000 + [5000]
    assert int(out["keep"].sum()) == 2


def test_popcount64():
    from string_grouper_ray.pipelines.dedup import _popcount64

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    got = _popcount64(vals)
    want = np.array([bin(int(v)).count("1") for v in vals])
    assert (got == want).all()


def test_ngram_jaccard_pairs():
    from string_grouper_ray.pipelines.dedup import ngram_jaccard_pairs

    ds = _docs(["abcdefgh", "abcdefgh", "abcdxyzw", "zzzzzzzz"])
    out = ngram_jaccard_pairs(ds, threshold=0.9).to_pandas()
    got = set(zip(out["left_id"], out["right_id"]))
    assert (0, 1) in got
    assert (0, 3) not in got and (1, 3) not in got


def test_ngram_jaccard_hot_gram_salting_exact():
    """A gram shared by >max_bucket_size docs goes through the salted
    chunk-pair path; the result must equal the brute-force Jaccard."""
    from string_grouper_ray.pipelines.dedup import ngram_jaccard_pairs

    # 30 docs all share "zzz"; pairs within the same suffix letter are
    # near-identical, across are not
    texts = [f"zzz{c}{c}{c}" for c in "abcde" for _ in range(6)]
    cfg = EngineConfig(use_actor_pools=False, max_bucket_size=8)  # force salting
    out = ngram_jaccard_pairs(_docs(texts), threshold=0.3, config=cfg).to_pandas()
    got = {(l, r): j for l, r, j in zip(out["left_id"], out["right_id"], out["jaccard"])}

    def grams(s):
        return {s[i : i + 3] for i in range(len(s) - 2)}

    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            gi, gj = grams(texts[i]), grams(texts[j])
            jac = len(gi & gj) / len(gi | gj)
            if jac >= 0.3:
                want[(i, j)] = jac
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_ngram_jaccard_max_gram_docs_cap():
    """Grams with postings above the cap are dropped (and logged), removing
    only the intersections that flow through them."""
    from string_grouper_ray.pipelines.dedup import ngram_jaccard_pairs

    texts = ["commonAAA", "commonBBB", "commonCCC", "xyzqAAAw1", "xyzqAAAw2"]
    cfg = EngineConfig(use_actor_pools=False, max_bucket_size=2)
    out = ngram_jaccard_pairs(
        _docs(texts), threshold=0.05, config=cfg, max_gram_docs=2
    ).to_pandas()
    got = set(zip(out["left_id"], out["right_id"]))
    # "common" grams appear in 3 docs (> cap) → dropped; 0-1, 0-2, 1-2 gone
    assert (0, 1) not in got and (0, 2) not in got and (1, 2) not in got
    # the AAA-family pair flows through grams with postings <= 2 → kept
    assert (3, 4) in got


def test_knn_brute_force_and_lsh_recall():
    from string_grouper_ray.pipelines.ann import knn_brute_force, knn_lsh

    rng = np.random.RandomState(0)
    base = rng.normal(size=(200, 16))
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in base], type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(table)
    queries = ds.filter(lambda r: r["vec_id"] < 5)
    exact = knn_brute_force(ds, queries, k=10, config=CFG).to_pandas()
    assert set(exact.groupby("query_id").size()) == {10}
    # self is always the top hit
    tops = exact.sort_values(["query_id", "cosine"], ascending=[True, False]).groupby("query_id").head(1)
    assert (tops["query_id"].to_numpy() == tops["vec_id"].to_numpy()).all()

    approx = knn_lsh(ds, queries, k=10, n_tables=16, n_bits=4, config=CFG).to_pandas()
    # recall of approx vs exact
    ex = set(zip(exact["query_id"], exact["vec_id"]))
    ap = set(zip(approx["query_id"], approx["vec_id"]))
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall  # bucketed candidates, loose floor


def test_embedding_near_dup():
    from string_grouper_ray.pipelines.ann import embedding_near_dup_pairs

    v = np.eye(4)
    vecs = np.vstack([v[0], v[0] * 0.999 + v[1] * 0.001, v[2]])
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(3, dtype=np.int64)),
            "embedding": pa.array([x.tolist() for x in vecs], type=pa.list_(pa.float32())),
        }
    )
    out = embedding_near_dup_pairs(ray.data.from_arrow(table), threshold=0.99, config=CFG).to_pandas()
    assert set(zip(out["left_id"], out["right_id"])) == {(0, 1)}


def test_embedding_near_dup_exact_chunked_matches_single_chunk():
    """The chunk-pair exact path must emit the same pairs regardless of
    chunking (multi-chunk covers the cross-chunk orientation logic)."""
    from string_grouper_ray.pipelines.ann import embedding_near_dup_pairs

    rng = np.random.RandomState(3)
    base = rng.normal(size=(120, 8))
    base[40] = base[7] + rng.normal(scale=1e-3, size=8)   # one near-dup pair
    base[99] = base[55] + rng.normal(scale=1e-3, size=8)  # another
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(120, dtype=np.int64)),
            "embedding": pa.array([x.tolist() for x in base], type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(table)
    one = embedding_near_dup_pairs(ds, threshold=0.9, config=CFG, chunk_rows=10_000).to_pandas()
    many = embedding_near_dup_pairs(ds, threshold=0.9, config=CFG, chunk_rows=16).to_pandas()
    key = lambda df: set(zip(df["left_id"], df["right_id"]))
    assert key(one) == key(many)
    assert {(7, 40), (55, 99)} <= key(one)


def test_embedding_near_dup_lsh_recall():
    """The LSH method must find high-cosine pairs (recall vs exact) without
    any driver-side corpus materialization."""
    from string_grouper_ray.pipelines.ann import embedding_near_dup_pairs

    rng = np.random.RandomState(11)
    base = rng.normal(size=(300, 16))
    for i in range(0, 60, 2):  # 30 planted near-dup pairs
        base[i + 1] = base[i] + rng.normal(scale=1e-2, size=16)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array([x.tolist() for x in base], type=pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(table)
    exact = embedding_near_dup_pairs(ds, threshold=0.98, config=CFG).to_pandas()
    lsh = embedding_near_dup_pairs(
        ds, threshold=0.98, config=CFG, method="lsh", n_tables=8, n_bits=8
    ).to_pandas()
    key = lambda df: set(zip(df["left_id"], df["right_id"]))
    got, want = key(lsh), key(exact)
    assert got <= want  # exact verify: no false positives
    assert len(got & want) / max(len(want), 1) >= 0.9
    # cosines on surviving pairs are exact
    mg = lsh.merge(exact, on=["left_id", "right_id"], suffixes=("_l", "_e"))
    assert np.allclose(mg["cosine_l"], mg["cosine_e"], atol=1e-12)


def test_textstats_columns():
    from string_grouper_ray.pipelines.textstats import (
        fingerprints,
        lang_id,
        quality_scores,
        token_counts,
    )

    ds = _docs(["the cat and the dog, in a house!", "der hund und die katze ist von"])
    tc = token_counts(ds, config=CFG).to_pandas().sort_values("doc_id")
    assert tc["n_tokens"].tolist() == [8, 7]
    assert (tc["n_bpe_tokens"] > 0).all()
    q = quality_scores(ds, config=CFG).to_pandas().sort_values("doc_id")
    assert (q["punct_ratio"] > 0).iloc[0]
    l = lang_id(ds, config=CFG).to_pandas().sort_values("doc_id")
    assert l["lang_pred"].tolist() == ["en", "de"]
    f = fingerprints(ds, config=CFG).to_pandas()
    assert f["fingerprint"].str.len().eq(32).all()


def test_containment_edges():
    from string_grouper_ray.stages.suffixstage import containment_edges

    texts = [
        "mega enterprises corporation of the north",
        "mega enterprises corporation",  # prefix of the first (normalized)
        "totally unrelated string here",
        "mega ent",  # short prefix, still >= min_len after normalization
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "row_idx": pa.array(np.arange(4, dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )
    out = containment_edges(ds, CFG, "text", min_len=6).to_pandas()
    got = set(zip(out["left_idx"].astype(int), out["right_idx"].astype(int)))
    assert (0, 1) in got  # substantial prefix (ratio 0.72)
    # "mega ent" is a tiny prefix of rows 0/1 (ratio < 0.6): not a duplicate
    assert (0, 3) not in got and (1, 3) not in got
    assert not any(2 in p for p in got)


def test_distributed_cc_matches_driver():
    from string_grouper_ray.state.unionfind import connected_components

    rng = np.random.RandomState(3)
    n = 200
    # chain clusters of size 4
    edges = []
    for start in range(0, n, 4):
        for j in range(3):
            edges.append((start + j, start + j + 1))
    edf = pd.DataFrame(edges, columns=["left_idx", "right_idx"])
    nodes = ray.data.from_pandas(pd.DataFrame({"row_idx": np.arange(n, dtype=np.int64)}))
    eds = ray.data.from_pandas(edf)
    drv = connected_components(eds, nodes, CFG).to_pandas().sort_values("row_idx")
    dist = (
        connected_components(eds, nodes, CFG, force_distributed=True)
        .to_pandas()
        .sort_values("row_idx")
    )
    assert drv["group_id"].tolist() == dist["group_id"].tolist()
    assert drv["group_id"].tolist() == [4 * (i // 4) for i in range(n)]


def test_checkpoint_resume(tmp_path):
    from string_grouper_ray.state.checkpoint import CheckpointManager

    calls = {"n": 0}

    def producer():
        calls["n"] += 1
        return ray.data.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))

    ckpt = CheckpointManager(str(tmp_path), EngineConfig())
    out1 = ckpt.stage("s1", producer)
    assert out1.count() == 3 and calls["n"] == 1
    # resume: producer must NOT run again
    ckpt2 = CheckpointManager(str(tmp_path), EngineConfig())
    out2 = ckpt2.stage("s1", producer)
    assert out2.count() == 3 and calls["n"] == 1
    # config change invalidates
    ckpt3 = CheckpointManager(str(tmp_path), EngineConfig(min_similarity=0.5))
    out3 = ckpt3.stage("s1", producer)
    assert out3.count() == 3 and calls["n"] == 2
    # lineage log exists
    assert os.path.exists(os.path.join(str(tmp_path), "lineage.jsonl"))


def test_clipdedup_end_to_end(tmp_path):
    from string_grouper_ray.pipelines.clipdedup import dedup_clip_table
    from string_grouper_ray.sources.synth import write_clip_table

    clip_dir = write_clip_table(400, str(tmp_path / "clips"), seed=11, with_audio=True)
    cfg = EngineConfig(
        strategy="lsh", min_similarity=0.8, max_n_matches=None,
        use_actor_pools=False, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    out = dedup_clip_table(clip_dir, config=cfg, hydrate_payload=True)
    df = out.to_pandas()
    assert len(df) == 400
    assert {"clip_id", "bytes", "transcript", "group_id", "group_rep_id"} <= set(df.columns)
    assert df["group_id"].notna().all()
    # groups are nontrivial: true dup clusters exist in the generator
    assert df.groupby("group_id").size().max() > 1
    # resume path: re-run with same config hits the checkpoints
    out2 = dedup_clip_table(clip_dir, config=cfg, hydrate_payload=False)
    assert out2.count() == 400


def test_group_assignments_driver_matches_distributed():
    # a clique with distinct weights + a chain + singletons: both the
    # driver fast path and the shuffle/join path must pick identical
    # (group_id, group_rep_idx) per row under centroid and first modes
    from string_grouper_ray.pipelines.cluster import group_assignments

    texts = (
        ["alpha beta gamma delta"] * 3
        + ["alpha beta gamma delt"]
        + ["omega psi chi"]
        + ["unrelated one"]
        + ["unrelated two"]
    )
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"row_idx": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    )
    for rep in ("centroid", "first"):
        cfg = EngineConfig(
            use_actor_pools=False, min_similarity=0.5, group_rep=rep
        )
        drv = (
            group_assignments(ds, cfg)
            .to_pandas()
            .sort_values("row_idx")
            .reset_index(drop=True)
        )
        dist = (
            group_assignments(ds, cfg, force_distributed=True)
            .to_pandas()
            .sort_values("row_idx")
            .reset_index(drop=True)
        )
        assert drv["group_id"].tolist() == dist["group_id"].tolist(), rep
        assert (
            drv["group_rep_idx"].tolist() == dist["group_rep_idx"].tolist()
        ), rep


def test_containment_distinct_is_connectivity_equivalent():
    # popular transcript with popular truncations: distinct=True must give
    # the same clusters as all-pairs containment once exact-dup edges are
    # in the union (the flagship configuration), at a fraction of the edges
    from string_grouper_ray.functions.grouped import dedup_pairs
    from string_grouper_ray.stages.lsh import _exact_dup_collapse
    from string_grouper_ray.stages.suffixstage import containment_edges
    from string_grouper_ray.state.unionfind import connected_components

    full = "the quick brown fox jumps over the lazy dog again"
    trunc = full[:30]
    texts = [full] * 20 + [trunc] * 15 + ["completely different text here"] * 5
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"row_idx": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    )
    cfg = EngineConfig(use_actor_pools=False, exact_dup_shortcircuit=True)
    _rep_map, exact_edges = _exact_dup_collapse(ds, cfg, "text")

    def labels_with(distinct):
        cont = containment_edges(ds, cfg, "text", distinct=distinct)
        edges = dedup_pairs(
            exact_edges.union(cont), ["left_idx", "right_idx"],
            agg_col="similarity",
        )
        return (
            connected_components(edges, ds, cfg)
            .to_pandas()
            .sort_values("row_idx")["group_id"]
            .tolist()
        )

    la = labels_with(False)
    lb = labels_with(True)
    assert la == lb
    # and the truncation family really is merged (non-vacuous)
    assert la[0] == la[20]  # full-copy cluster joined with trunc cluster
    assert la[0] != la[35]  # unrelated stays separate
    n_full = containment_edges(ds, cfg, "text", distinct=False).count()
    n_dist = containment_edges(ds, cfg, "text", distinct=True).count()
    assert n_dist < n_full  # the quadratic blowup is actually removed


def test_group_assignments_contracted_matches_direct():
    # force contraction with a tiny threshold: labels and reps must be
    # identical to the uncontracted driver path (and the distributed one)
    from string_grouper_ray.pipelines.cluster import group_assignments

    texts = (
        ["alpha beta gamma delta"] * 4
        + ["alpha beta gamma delt"] * 2
        + ["omega psi chi"] * 3
        + ["unrelated one", "unrelated two"]
    )
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"row_idx": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    )
    base_cfg = EngineConfig(use_actor_pools=False, min_similarity=0.5)
    want = (
        group_assignments(ds, base_cfg)
        .to_pandas().sort_values("row_idx").reset_index(drop=True)
    )
    small = EngineConfig(
        use_actor_pools=False, min_similarity=0.5, cc_contract_min_edges=1
    )
    got = (
        group_assignments(ds, small)
        .to_pandas().sort_values("row_idx").reset_index(drop=True)
    )
    assert got["group_id"].tolist() == want["group_id"].tolist()
    assert got["group_rep_idx"].tolist() == want["group_rep_idx"].tolist()


def test_spanning_forest_contract_preserves_components():
    from string_grouper_ray.state.unionfind import (
        connected_components, spanning_forest_contract,
    )

    rng = np.random.default_rng(7)
    n = 3000
    nodes = ray.data.from_pandas(
        pd.DataFrame({"row_idx": np.arange(n, dtype=np.int64)})
    )
    # chains of 6 + random intra-cluster extra edges (dense, redundant)
    l_list, r_list = [], []
    for g in range(0, n, 6):
        m = np.arange(g, min(g + 6, n))
        l_list.append(m[:-1]); r_list.append(m[1:])
        extra = rng.integers(0, len(m), size=(8, 2))
        l_list.append(m[extra[:, 0]]); r_list.append(m[extra[:, 1]])
    l = np.concatenate(l_list); r = np.concatenate(r_list)
    eds = ray.data.from_pandas(
        pd.DataFrame({"left_idx": l, "right_idx": r,
                      "similarity": np.ones(len(l))})
    )
    direct = connected_components(eds, nodes, CFG).to_pandas().sort_values("row_idx")
    contracted = spanning_forest_contract(eds, num_buckets=8)
    via = connected_components(contracted, nodes, CFG).to_pandas().sort_values("row_idx")
    assert direct["group_id"].tolist() == via["group_id"].tolist()
    assert contracted.count() < len(l)  # actually contracts


def test_knn_ivf_recall_and_exact_degenerate():
    from string_grouper_ray.pipelines.ann import knn_brute_force, knn_ivf

    rng = np.random.RandomState(3)
    # clustered corpus (IVF's favorable case) + noise
    centers = rng.normal(size=(8, 16)) * 3
    base = np.vstack(
        [centers[i % 8] + rng.normal(size=16) * 0.5 for i in range(300)]
    )
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(
                [v.tolist() for v in base], type=pa.list_(pa.float32())
            ),
        }
    )
    ds = ray.data.from_arrow(table)
    queries = ds.filter(lambda r: r["vec_id"] < 5)
    exact = knn_brute_force(ds, queries, k=10, config=CFG).to_pandas()
    ex = set(zip(exact["query_id"], exact["vec_id"]))

    approx = knn_ivf(
        ds, queries, k=10, n_list=16, n_probe=4, config=CFG
    ).to_pandas()
    ap = set(zip(approx["query_id"], approx["vec_id"]))
    assert len(ex & ap) / len(ex) >= 0.8

    # n_probe == n_list degenerates to exact brute force
    full = knn_ivf(
        ds, queries, k=10, n_list=8, n_probe=8, config=CFG
    ).to_pandas()
    fu = set(zip(full["query_id"], full["vec_id"]))
    assert fu == ex


def test_knn_ivf_sorted_corpus_recall_matches_shuffled():
    """The quantizer trains on a seeded hash-mod SAMPLE, not limit(N): on a
    corpus sorted by cluster (where the first train_rows rows see only a few
    clusters) recall at n_probe < n_list must match the shuffled layout."""
    from string_grouper_ray.pipelines.ann import knn_brute_force, knn_ivf

    rng = np.random.RandomState(5)
    centers = rng.normal(size=(8, 16)) * 3
    # SORTED by cluster: rows 0..49 are cluster 0, 50..99 cluster 1, ...
    base = np.vstack(
        [centers[i // 50] + rng.normal(size=16) * 0.5 for i in range(400)]
    )

    def mk_ds(vecs, ids):
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        }))

    ids = np.arange(400, dtype=np.int64)
    sorted_ds = mk_ds(base, ids)
    perm = rng.permutation(400)
    shuffled_ds = mk_ds(base[perm], ids[perm])
    queries = sorted_ds.filter(lambda r: r["vec_id"] % 80 == 0)
    exact = knn_brute_force(sorted_ds, queries, k=10, config=CFG).to_pandas()
    ex = set(zip(exact["query_id"], exact["vec_id"]))

    def recall(ds):
        # train_rows=100 < corpus size forces the sampling path; on the
        # sorted layout limit(100) would have seen only 2 of 8 clusters
        ap = knn_ivf(ds, queries, k=10, n_list=8, n_probe=3, train_rows=100,
                     config=CFG).to_pandas()
        got = set(zip(ap["query_id"], ap["vec_id"]))
        return len(ex & got) / len(ex)

    r_sorted, r_shuffled = recall(sorted_ds), recall(shuffled_ds)
    assert r_sorted >= 0.8
    assert abs(r_sorted - r_shuffled) <= 0.1


def test_read_table_with_row_idx_matches_zip_order():
    """Footer-offset row_idx must assign exactly the ids the zip(range)
    path would: same file listing order, dense 0..n-1, aligned per row."""
    import pyarrow.parquet as pq

    from string_grouper_ray.pipelines.clipdedup import add_row_idx
    from string_grouper_ray.sources.io import read_table_with_row_idx

    path = "/root/testdata/sf0.001/part.parquet"
    via_footer = (
        read_table_with_row_idx(path, columns=["p_partkey", "p_name"])
        .to_pandas()
        .sort_values("row_idx")
        .reset_index(drop=True)
    )
    base = ray.data.read_parquet(path, columns=["p_partkey", "p_name"])
    via_zip = (
        add_row_idx(base, base.count())
        .to_pandas()
        .sort_values("row_idx")
        .reset_index(drop=True)
    )
    n = pq.ParquetFile(path).metadata.num_rows
    assert list(via_footer["row_idx"]) == list(range(n))
    assert via_footer["p_partkey"].tolist() == via_zip["p_partkey"].tolist()
    assert via_footer["p_name"].tolist() == via_zip["p_name"].tolist()

    # non-parquet inputs signal fallback
    assert read_table_with_row_idx("/tmp/nope.csv") is None


def test_read_table_with_row_idx_nested_partition_dirs(tmp_path):
    """ray.data.read_parquet (the fallback) reads partition subdirectories
    recursively, so the footer-offset path must enumerate them too — a
    top-level-only glob would silently drop nested rows."""
    import pandas as pd
    import pyarrow.parquet as pq

    from string_grouper_ray.sources.io import read_table_with_row_idx

    root = tmp_path / "tbl"
    (root / "sub").mkdir(parents=True)
    pq.write_table(pa.table({"a": pa.array([1, 2])}), root / "top.parquet")
    pq.write_table(pa.table({"a": pa.array([3, 4, 5])}), root / "sub" / "nested.parquet")
    out = read_table_with_row_idx(str(root), columns=["a"]).to_pandas()
    assert sorted(out["a"].tolist()) == [1, 2, 3, 4, 5]
    assert sorted(out["row_idx"].tolist()) == list(range(5))

    # a stray non-parquet file makes the directory mixed-format: fall back
    (root / "README.txt").write_text("not parquet")
    assert read_table_with_row_idx(str(root), columns=["a"]) is None


def test_group_assignments_dedup_edges_all_routes_agree():
    """dedup_edges=True must max-merge duplicate (l, r) edge rows with
    identical results on the driver numpy route, the distributed route, and
    vs a pre-deduped edge list (centroid reps are weight-sum-sensitive, so
    double-counted duplicates would move representatives)."""
    from string_grouper_ray.functions.grouped import dedup_pairs
    from string_grouper_ray.pipelines.cluster import group_assignments

    rng = np.random.RandomState(5)
    n = 60
    nodes = pa.table(
        {
            "row_idx": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"t{i}" for i in range(n)]),
        }
    )
    l = rng.randint(0, n, 400).astype(np.int64)
    r = rng.randint(0, n, 400).astype(np.int64)
    sim = np.round(rng.rand(400), 3)
    # duplicates with DIFFERENT similarities: max must win everywhere
    edges_t = pa.table(
        {
            "left_idx": pa.array(np.concatenate([l, l[:150]])),
            "right_idx": pa.array(np.concatenate([r, r[:150]])),
            "similarity": pa.array(np.concatenate([sim, np.round(sim[:150] * 0.5, 3)])),
        }
    )
    ds = ray.data.from_arrow(nodes)
    cfg = CFG

    def run(**kw):
        return (
            group_assignments(ds, cfg, None, "text", edges=ray.data.from_arrow(edges_t), **kw)
            .to_pandas()
            .sort_values("row_idx")
            .reset_index(drop=True)
        )

    driver = run(dedup_edges=True)
    distributed = run(dedup_edges=True, force_distributed=True)
    prededuped = (
        group_assignments(
            ds, cfg, None, "text",
            edges=dedup_pairs(
                ray.data.from_arrow(edges_t), ["left_idx", "right_idx"], agg_col="similarity"
            ),
        )
        .to_pandas()
        .sort_values("row_idx")
        .reset_index(drop=True)
    )
    for col in ["group_id", "group_rep_idx"]:
        assert driver[col].tolist() == prededuped[col].tolist()
        assert driver[col].tolist() == distributed[col].tolist()


def test_minhash_broadcast_verify_equals_join():
    """Route equality: the broadcast-CSR Jaccard verify (below
    jaccard_broadcast_max_rows) and the shingle-carrying join route must
    produce identical (doc_id, cluster_id, keep) outputs — same pairs, same
    similarities (shared _jaccard_sims kernel), same clusters."""
    from string_grouper_ray.pipelines.dedup import minhash_dedup

    rng = np.random.RandomState(11)
    words = [f"w{w:03d}" for w in range(300)]
    texts = []
    for c in range(30):
        base = [words[i] for i in rng.choice(300, size=20, replace=False)]
        texts.append(" ".join(base))
        for _ in range(rng.randint(1, 3)):
            variant = list(base)
            for j in rng.choice(20, size=rng.randint(1, 3), replace=False):
                variant[j] = words[rng.randint(0, 300)]
            texts.append(" ".join(variant))
    # non-contiguous ids exercise the searchsorted id lookup
    ids = [3 * i + 7 for i in range(len(texts))]

    cfg_b = EngineConfig(use_actor_pools=False, jaccard_broadcast_max_rows=10**9)
    cfg_j = EngineConfig(use_actor_pools=False, jaccard_broadcast_max_rows=0)
    out_b = (
        minhash_dedup(_docs(texts, ids), jaccard_threshold=0.7, config=cfg_b)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    out_j = (
        minhash_dedup(_docs(texts, ids), jaccard_threshold=0.7, config=cfg_j)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out_b["cluster_id"].nunique() < len(texts)  # fixture has dups
    pd.testing.assert_frame_equal(out_b, out_j)


def test_gather_slices_and_shingle_csr_roundtrip():
    from string_grouper_ray.pipelines.dedup import _gather_slices

    vals = np.arange(10, dtype=np.uint64)
    offs = np.array([0, 3, 3, 7, 10], dtype=np.int64)
    flat, lens = _gather_slices(vals, offs, np.array([2, 0, 1, 2], dtype=np.int64))
    assert lens.tolist() == [4, 3, 0, 4]
    assert flat.tolist() == [3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6]


def test_jaccard_ranked_kernel_equals_lexsort():
    """The sort-free ranked kernel and the lexsort kernel must agree
    exactly on random sorted-unique rank sets (incl. empty sides)."""
    from string_grouper_ray.pipelines.dedup import _jaccard_sims, _jaccard_sims_ranked

    rng = np.random.RandomState(3)
    D = 500
    lsets, rsets = [], []
    for _ in range(200):
        lsets.append(np.sort(rng.choice(D, size=rng.randint(0, 60), replace=False)))
        rsets.append(np.sort(rng.choice(D, size=rng.randint(0, 60), replace=False)))
    l_len = np.array([len(s) for s in lsets], dtype=np.int64)
    r_len = np.array([len(s) for s in rsets], dtype=np.int64)
    lr = np.concatenate(lsets).astype(np.int32) if l_len.sum() else np.empty(0, np.int32)
    rr = np.concatenate(rsets).astype(np.int32) if r_len.sum() else np.empty(0, np.int32)
    ranked = _jaccard_sims_ranked(lr, l_len, rr, r_len, D)
    lex = _jaccard_sims(lr.astype(np.uint64), l_len, rr.astype(np.uint64), r_len)
    np.testing.assert_array_equal(ranked, lex)
    # overflow-guard fallback path: huge fake n_distinct routes to lexsort
    ranked_fb = _jaccard_sims_ranked(lr, l_len, rr, r_len, 2**62)
    np.testing.assert_array_equal(ranked_fb, lex)
