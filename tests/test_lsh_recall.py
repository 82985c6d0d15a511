"""LSH pipeline recall vs the exact matcher (SURVEY.md §5: recall ≥ 0.99 at
the same shingle/threshold/signature config), plus salted-skew coverage."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from string_grouper_ray.config import EngineConfig
from string_grouper_ray.pipelines.match import match_edges
from string_grouper_ray.sources.synth import generate_clip_table


def _edges_set(edges_ds, sym=True):
    df = edges_ds.to_pandas()
    pairs = set()
    for l, r in zip(df["left_idx"], df["right_idx"]):
        if l == r:
            continue
        pairs.add((min(l, r), max(l, r)))
    return pairs


@pytest.fixture(scope="module")
def clip_ds():
    table = generate_clip_table(1500, seed=42, with_audio=False)
    t = pa.table(
        {
            "row_idx": pa.array(np.arange(table.num_rows, dtype=np.int64)),
            "text": table["transcript"],
        }
    )
    return ray.data.from_arrow(t).repartition(4)


def test_lsh_recall_vs_exact(clip_ds):
    cfg_exact = EngineConfig(
        strategy="exact", min_similarity=0.8, max_n_matches=None, use_actor_pools=False
    )
    exact_edges, vocab = match_edges(clip_ds, None, cfg_exact)
    exact_pairs = _edges_set(exact_edges)

    cfg_lsh = EngineConfig(
        strategy="lsh", min_similarity=0.8, max_n_matches=None,
        num_perm=128, lsh_bands=32, use_actor_pools=False,
    )
    lsh_edges, _ = match_edges(clip_ds, None, cfg_lsh, vocab=vocab)
    lsh_pairs = _edges_set(lsh_edges)

    assert exact_pairs, "exact matcher found no duplicate pairs — fixture broken"
    recall = len(exact_pairs & lsh_pairs) / len(exact_pairs)
    assert recall >= 0.99, f"LSH recall {recall:.4f} < 0.99 ({len(exact_pairs)} exact pairs)"
    # verification step guarantees precision: every LSH pair must also pass
    # the exact threshold
    assert lsh_pairs <= exact_pairs | lsh_pairs  # trivially true; check sims below
    lsh_df = lsh_edges.to_pandas()
    assert (lsh_df["similarity"] >= 0.8 - 1e-12).all()


def test_lsh_salted_skew_equivalence():
    """A hot bucket (many identical transcripts) must produce the same pair
    set whether or not salting splits it."""
    texts = ["identical hot transcript corp"] * 60 + [
        f"unique filler row {i} zzz" for i in range(40)
    ]
    t = pa.table(
        {
            "row_idx": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    base_cfg = dict(strategy="lsh", min_similarity=0.8, max_n_matches=None, use_actor_pools=False)
    unsalted, vocab = match_edges(ds, None, EngineConfig(max_bucket_size=1000, **base_cfg))
    salted, _ = match_edges(ds, None, EngineConfig(max_bucket_size=10, **base_cfg), vocab=vocab)
    assert _edges_set(unsalted) == _edges_set(salted)
    # the hot clique is fully present: 60 choose 2 pairs
    assert len(_edges_set(salted)) >= 60 * 59 // 2


def test_lsh_join_mode_verify_equals_broadcast(clip_ds):
    """verify_broadcast_max_rows=0 forces the any-scale join-mode verify
    (vector-carrying shuffle joins + vectorized pack/unpack); its edge set
    and similarities must equal the broadcast-CSR fast path exactly."""
    base = dict(strategy="lsh", min_similarity=0.7, max_n_matches=None,
                force_symmetries=False, use_actor_pools=False)
    e_b, _ = match_edges(clip_ds, None, EngineConfig(**base))
    e_j, _ = match_edges(
        clip_ds, None, EngineConfig(**base, verify_broadcast_max_rows=0)
    )
    db = e_b.to_pandas().sort_values(["left_idx", "right_idx"]).reset_index(drop=True)
    dj = e_j.to_pandas().sort_values(["left_idx", "right_idx"]).reset_index(drop=True)
    assert len(db) == len(dj)
    assert (db["left_idx"].to_numpy() == dj["left_idx"].to_numpy()).all()
    assert (db["right_idx"].to_numpy() == dj["right_idx"].to_numpy()).all()
    assert np.allclose(db["similarity"], dj["similarity"], atol=1e-12)


def test_lsh_join_mode_verify_salted_and_star(clip_ds):
    """Band-local verify must emit the same edge set as the broadcast path
    when hot buckets are SALTED (mode-1 chunk-pair membersets) and when the
    star emission handles big membersets — the two kernel branches the plain
    join-mode test doesn't reach."""
    texts = ["identical hot transcript corp"] * 60 + [
        f"unique filler row {i} zzz" for i in range(40)
    ]
    t = pa.table(
        {
            "row_idx": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    for emission in ("clique", "star"):
        base = dict(strategy="lsh", min_similarity=0.8, max_n_matches=None,
                    use_actor_pools=False, max_bucket_size=10,
                    lsh_pair_emission=emission)
        e_b, vocab = match_edges(ds, None, EngineConfig(**base))
        e_j, _ = match_edges(
            ds, None, EngineConfig(**base, verify_broadcast_max_rows=0),
            vocab=vocab,
        )
        assert _edges_set(e_b) == _edges_set(e_j), emission
        assert len(_edges_set(e_j)) >= 60 * 59 // 2 if emission == "clique" else True


def test_lsh_join_mode_verify_anchor_salted(clip_ds, monkeypatch):
    """Hot-anchor pair-space salting must not change the edge set: with the
    salting threshold forced to ~everything, every anchor splits into
    replicas whose pair-space filters partition the pairs exactly."""
    monkeypatch.setenv("SGR_ANCHOR_SALT_MIN", "50")
    base = dict(strategy="lsh", min_similarity=0.8, max_n_matches=None,
                use_actor_pools=False)
    e_b, vocab = match_edges(clip_ds, None, EngineConfig(**base))
    e_j, _ = match_edges(
        clip_ds, None, EngineConfig(**base, verify_broadcast_max_rows=0),
        vocab=vocab,
    )
    assert _edges_set(e_b) == _edges_set(e_j)


def test_lsh_join_mode_verify_huge_ids():
    """row_idx above 2^53 must survive the band-local verify exchanges
    EXACTLY: a nullable int64 column through a pandas bucket frame degrades
    to float64 and silently rounds such ids (the union columns are 0-filled
    with a kind discriminator precisely to prevent this)."""
    base = np.int64(2**53)
    texts = ["shared near duplicate transcript alpha"] * 3 + [
        f"unique text number {i} qqq" for i in range(5)
    ]
    ids = base + np.arange(1, len(texts) + 1, dtype=np.int64) * 3 + 1
    t = pa.table({"row_idx": pa.array(ids), "text": pa.array(texts)})
    ds = ray.data.from_arrow(t).repartition(2)
    cfg = dict(strategy="lsh", min_similarity=0.8, max_n_matches=None,
               use_actor_pools=False)
    e_b, vocab = match_edges(ds, None, EngineConfig(**cfg))
    e_j, _ = match_edges(
        ds, None, EngineConfig(**cfg, verify_broadcast_max_rows=0), vocab=vocab
    )
    pb, pj = _edges_set(e_b), _edges_set(e_j)
    assert pb == pj and len(pb) == 3
    # every id in the output must be one of the exact inputs (no float rounding)
    out_ids = set(np.asarray(e_j.to_pandas()[["left_idx", "right_idx"]]).ravel())
    assert out_ids <= set(ids.tolist())


def test_for_cluster_multinode_derivation(monkeypatch):
    """for_cluster must find the head node via the node:__internal_head__
    resource marker (ray.nodes() has no IsHeadNode field) and use the
    SMALLEST node's object store for the broadcast cutoffs."""
    from string_grouper_ray.config import EngineConfig

    gib = 1024**3
    fake_nodes = [
        {"Alive": True, "Resources": {"CPU": 32.0, "memory": 64 * gib,
                                      "object_store_memory": 16 * gib,
                                      "node:__internal_head__": 1.0}},
        {"Alive": True, "Resources": {"CPU": 32.0, "memory": 256 * gib,
                                      "object_store_memory": 4 * gib}},
    ]
    monkeypatch.setattr(ray, "nodes", lambda: fake_nodes)
    cfg = EngineConfig.for_cluster()
    # min store is the 4 GiB worker, driver memory is the 64 GiB head
    assert cfg.rep_broadcast_max_rows == int(0.10 * 4 * gib / 8)
    assert cfg.cc_driver_max_edges == int(0.20 * 64 * gib / 16)
    assert cfg.verify_broadcast_max_rows == int(
        min(0.25 * 4 * gib / 360, 0.30 * 64 * gib / (3 * 360))
    )


def test_lsh_cross_join():
    master = pd.DataFrame({"row_idx": np.arange(3), "text": ["foooo", "bar", "baz"]})
    dupes = pd.DataFrame({"row_idx": np.arange(4), "text": ["foooo", "bar", "baz", "foooob"]})
    mds = ray.data.from_pandas(master)
    dds = ray.data.from_pandas(dupes)
    cfg = EngineConfig(strategy="lsh", min_similarity=0.8, use_actor_pools=False,
                       num_perm=64, lsh_bands=32)
    edges, _ = match_edges(mds, dds, cfg)
    df = edges.to_pandas().sort_values(["left_idx", "right_idx"]).reset_index(drop=True)
    got = set(zip(df["left_idx"], df["right_idx"]))
    assert (0, 0) in got and (1, 1) in got and (2, 2) in got


def test_exact_dup_shortcircuit_same_clusters():
    """Cluster assignments must be identical with and without the exact-dup
    short-circuit (the short-circuit only reshapes edges within exact-dup
    groups from cliques to stars)."""
    from string_grouper_ray.pipelines.cluster import group_assignments

    texts = (
        ["identical mega duplicate record inc."] * 30
        + ["identical mega duplicate record incorporated"] * 5
        + [f"unique company number {i} gmbh" for i in range(30)]
    )
    t = pa.table(
        {
            "row_idx": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    base = dict(strategy="lsh", min_similarity=0.8, max_n_matches=20, use_actor_pools=False)
    g1 = group_assignments(ds, EngineConfig(exact_dup_shortcircuit=False, **base))
    g2 = group_assignments(ds, EngineConfig(exact_dup_shortcircuit=True, **base))
    df1 = g1.to_pandas().sort_values("row_idx").reset_index(drop=True)
    df2 = g2.to_pandas().sort_values("row_idx").reset_index(drop=True)
    assert df1["group_id"].tolist() == df2["group_id"].tolist()


def test_star_emission_cluster_recall():
    """Star (spanning) pair emission must reproduce the exact matcher's
    cluster assignments at high recall — pairs differ, components must not."""
    from string_grouper_ray.pipelines.cluster import group_assignments
    from string_grouper_ray.sources.synth import generate_clip_table

    table = generate_clip_table(2000, seed=7, with_audio=False)
    t = pa.table(
        {
            "row_idx": pa.array(np.arange(table.num_rows, dtype=np.int64)),
            "text": table["transcript"],
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    exact_cfg = EngineConfig(strategy="exact", min_similarity=0.8, max_n_matches=None,
                             use_actor_pools=False)
    star_cfg = EngineConfig(strategy="lsh", min_similarity=0.8, max_n_matches=None,
                            lsh_pair_emission="star", exact_dup_shortcircuit=True,
                            use_actor_pools=False)
    ge = group_assignments(ds, exact_cfg).to_pandas().sort_values("row_idx")
    gs = group_assignments(ds, star_cfg).to_pandas().sort_values("row_idx")

    def pair_set(df):
        from collections import defaultdict

        groups = defaultdict(list)
        for r, g in zip(df["row_idx"], df["group_id"]):
            groups[g].append(r)
        pairs = set()
        for members in groups.values():
            members = sorted(members)
            pairs.update((members[0], m) for m in members[1:])
        return pairs

    # same-cluster relation recall: fraction of exact's (min,member) links
    # reproduced by the star pipeline
    ep, sp = pair_set(ge), pair_set(gs)
    recall = len(ep & sp) / max(1, len(ep))
    assert recall >= 0.98, recall


def test_pkey_emission_equals_legacy(clip_ds):
    """The broadcast path's cluster-anchored (pkey-local) pair emission must
    produce the exact same verified edge multiset as the legacy
    emit -> global-dedup -> verify order, per-pair similarities included."""
    def run(pkey: bool):
        cfg = EngineConfig(
            strategy="lsh", min_similarity=0.8, max_n_matches=None,
            num_perm=128, lsh_bands=32, use_actor_pools=False,
            lsh_pkey_pair_emission=pkey,
        )
        edges, _ = match_edges(clip_ds, None, cfg)
        df = edges.to_pandas().sort_values(
            ["left_idx", "right_idx"]).reset_index(drop=True)
        return df

    a, b = run(True), run(False)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
